"""The spark-submit application: the end-to-end pages pipeline, shipped
via a LITERAL ``spark-submit --py-files greatex_spark.zip`` invocation.

The north rule's deployment contract is "ships via spark-submit
--py-files".  The cluster-scaling harness exercises the programmatic
twin (``spark.submit.pyFiles``); this script closes the contract
literally: it is executed by the real ``spark-submit`` CLI against the
standalone master, with the ``greatex_spark`` package available ONLY
through the ``--py-files`` zip — the repo is never on ``sys.path``, and
the script asserts that the package resolved from the zip on the driver
and on an executor before trusting the run.

Issued by ``tools/spark_submit_demo.py``:

    .../bin/spark-submit --master spark://127.0.0.1:7077 \
        --py-files /tmp/.../greatex_spark.zip \
        submit_job.py BRONZE_PARQUET OUT_DIR

Prints one ``RESULT {...}`` JSON line: gold row count, an
order-independent xxhash64 content checksum (compared against an
in-process ``local[*]`` run of the same code by the demo driver), wall
time, and the driver/executor import paths as shipping proof.
"""

from __future__ import annotations

import json
import os
import sys
import time

# NOTE: no sys.path.insert(REPO) here, by design — greatex_spark must
# come from the --py-files zip that spark-submit put on the PYTHONPATH.
import greatex_spark
from greatex_spark.pipeline.stages import (
    PipelineConfig,
    dedup,
    featurize,
    filter_kept,
    gold_projection,
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _executor_import_path(spark: SparkSession) -> str:
    """Import greatex_spark inside an executor Python worker and return
    the path it resolved to — proof the zip reached the executors."""
    import pandas as pd

    def probe(batches):
        import greatex_spark as g

        for _ in batches:
            yield pd.DataFrame({"path": [g.__file__ or ""]})

    return spark.range(1).mapInPandas(probe, "path string").head()["path"]


def main() -> None:
    bronze_path, out_path = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("greatex-spark-submit").getOrCreate()

    driver_path = greatex_spark.__file__ or ""
    exec_path = _executor_import_path(spark)

    cfg = PipelineConfig()
    t0 = time.perf_counter()
    bronze = spark.read.parquet(bronze_path)
    silver_path = os.path.join(out_path, "silver")
    featurize(bronze, cfg).write.mode("overwrite").parquet(silver_path)
    silver = spark.read.parquet(silver_path)
    gold_path = os.path.join(out_path, "gold")
    gold_projection(dedup(filter_kept(silver), cfg)).write.mode(
        "overwrite"
    ).parquet(gold_path)
    wall = time.perf_counter() - t0

    gdf = spark.read.parquet(gold_path)
    cols = sorted(gdf.columns)
    agg = gdf.agg(
        F.count(F.lit(1)).alias("rows"),
        # order-independent content checksum: sum of per-row hashes,
        # DECIMAL(38,0) so the long sum cannot overflow (ANSI-safe)
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("checksum"),
    ).head()
    print(
        "RESULT "
        + json.dumps(
            {
                "rows": agg["rows"],
                "checksum": str(agg["checksum"]),
                "wall_sec": round(wall, 2),
                "driver_import_path": driver_path,
                "executor_import_path": exec_path,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

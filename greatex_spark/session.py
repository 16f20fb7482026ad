"""SparkSession factory tuned for this engine.

Defaults follow the scaling contract in BASELINE.json: AQE on (runtime
re-planning + skew-join splitting), shuffle partitions sized to cores
(not the 200 default), Arrow enabled for the pandas-UDF model stages,
UTC session timezone so results compare bit-stable against the DuckDB
oracle harness.

On a real cluster the same configs apply per-executor; in this sandbox
everything runs in one JVM (``local[N]``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cores_of(master: str) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 4
        try:
            return int(inner)
        except ValueError:
            return os.cpu_count() or 4
    return os.cpu_count() or 4


def get_spark(
    master: str | None = None,
    app_name: str = "greatex_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``shuffle_partitions`` defaults to the core count of the master —
    on a 1000-executor cluster you would instead size this to
    ~2-3x total executor cores; the point is it is an explicit knob,
    never the stock 200.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or (
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    cores = _cores_of(master)
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

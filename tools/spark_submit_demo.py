"""Literal ``spark-submit --py-files`` deployment proof.

The north rule says the pipeline "ships via spark-submit --py-files
achieving >=0.8 throughput scaling efficiency between N and 4N
executors".  The scaling half lives in ``tools/bench_cluster_scaling.py``
(which ships the package programmatically via ``spark.submit.pyFiles``,
the config twin of the CLI flag); this demo closes the CLI half
literally:

1. zips ``greatex_spark`` (the ``--py-files`` artifact),
2. generates a deterministic bronze page table,
3. runs the pipeline in-process on ``local[8]`` to get the reference
   row count + order-independent content checksum,
4. starts a real standalone cluster (master + 2 pinned 4-core worker
   JVMs) and runs the REAL ``spark-submit`` binary::

       spark-submit --master spark://127.0.0.1:7077 \
           --py-files greatex_spark.zip submit_job.py BRONZE OUT

   with the repo scrubbed from ``PYTHONPATH`` and the application
   script copied OUT of the repo, so ``import greatex_spark`` can only
   succeed through the shipped zip (the job asserts the resolved import
   path on both driver and executor),
5. asserts the submitted run's gold row count and checksum equal the
   local reference, and writes ``SPARK_SUBMIT_DEMO.json``.

Usage: python tools/spark_submit_demo.py [n_pages]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = pyspark.__path__[0]
SPARK_SUBMIT = os.path.join(SPARK_HOME, "bin", "spark-submit")
MASTER_URL = "spark://127.0.0.1:7077"
TMPDIR = "/dev/shm" if os.path.isdir("/dev/shm") else None

ENV = dict(
    os.environ,
    SPARK_HOME=SPARK_HOME,
    SPARK_LOCAL_IP="127.0.0.1",
    SPARK_NO_DAEMONIZE="1",
)
# the submitted driver must not be able to import greatex_spark from the
# repo working tree — only from the --py-files zip
ENV.pop("PYTHONPATH", None)

LOCAL_REF = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from greatex_spark.session import get_spark
from greatex_spark.pipeline.stages import (
    PipelineConfig, featurize, filter_kept, dedup, gold_projection)
from pyspark.sql import functions as F
spark = get_spark(master="local[8]", app_name="submit-demo-ref",
                  shuffle_partitions=16)
cfg = PipelineConfig()
bronze = spark.read.parquet({bronze!r})
sp, gp = os.path.join({out!r}, "silver"), os.path.join({out!r}, "gold")
t0 = time.perf_counter()
featurize(bronze, cfg).write.mode("overwrite").parquet(sp)
silver = spark.read.parquet(sp)
gold_projection(dedup(filter_kept(silver), cfg)).write.mode("overwrite").parquet(gp)
wall = time.perf_counter() - t0
g = spark.read.parquet(gp)
cols = sorted(g.columns)
a = g.agg(F.count(F.lit(1)).alias("rows"),
          F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("checksum")).head()
print("RESULT " + json.dumps({{"rows": a["rows"],
                               "checksum": str(a["checksum"]),
                               "wall_sec": round(wall, 2)}}))
"""


def spark_class(*args: str, taskset: str | None = None) -> subprocess.Popen:
    cmd = [os.path.join(SPARK_HOME, "bin", "spark-class"), *args]
    if taskset and shutil.which("taskset"):
        cmd = ["taskset", "-c", taskset] + cmd
    return subprocess.Popen(
        cmd,
        env=ENV,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        preexec_fn=os.setsid,
    )


def stop(proc: subprocess.Popen) -> None:
    import signal

    try:
        os.killpg(os.getpgid(proc.pid), signal.SIGTERM)
        proc.wait(timeout=20)
    except Exception:
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except Exception:
            pass


def parse_result(out: subprocess.CompletedProcess) -> dict:
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"no RESULT line:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}"
    )


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    result: dict = {
        "what": "literal spark-submit --py-files deployment proof",
        "spark_submit_binary": SPARK_SUBMIT,
        "cluster": "standalone master + 2 pinned 4-core worker JVMs on localhost",
        "n_pages": n_pages,
    }
    with tempfile.TemporaryDirectory(prefix="submit_demo_", dir=TMPDIR) as tmp:
        zpath = shutil.make_archive(
            os.path.join(tmp, "greatex_spark"), "zip", REPO, "greatex_spark"
        )
        # the application script leaves the repo too: its parent dir is
        # sys.path[0] in the submitted driver, and must not see the repo
        app = os.path.join(tmp, "submit_job.py")
        shutil.copyfile(os.path.join(REPO, "tools", "submit_job.py"), app)

        bronze = os.path.join(tmp, "bronze")
        gen = (
            "import sys; sys.path.insert(0, {repo!r})\n"
            "from greatex_spark.session import get_spark\n"
            "from greatex_spark.pages import generate_pages\n"
            "spark = get_spark(master='local[16]', app_name='gen')\n"
            "generate_pages(spark, {n}, seed=42, num_partitions=32)"
            ".write.parquet({bp!r})\n"
        ).format(repo=REPO, n=n_pages, bp=bronze)
        subprocess.run(
            [sys.executable, "-c", gen],
            check=True,
            capture_output=True,
            timeout=600,
        )

        ref_out = subprocess.run(
            [
                sys.executable,
                "-c",
                LOCAL_REF.format(
                    repo=REPO, bronze=bronze, out=os.path.join(tmp, "ref")
                ),
            ],
            capture_output=True,
            text=True,
            timeout=900,
        )
        ref = parse_result(ref_out)
        result["local_reference"] = ref

        master = spark_class(
            "org.apache.spark.deploy.master.Master",
            "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8089",
        )
        workers = []
        try:
            time.sleep(8)
            for i in range(2):
                workers.append(
                    spark_class(
                        "org.apache.spark.deploy.worker.Worker",
                        MASTER_URL,
                        "--cores", "4",
                        "--memory", "10g",
                        "--host", "127.0.0.1",
                        "--port", str(7300 + i),
                        "--webui-port", str(8300 + i),
                        "--work-dir", os.path.join(tmp, f"worker{i}"),
                        taskset=f"{4 * i}-{4 * i + 3}",
                    )
                )
            time.sleep(12)

            cmd = [
                SPARK_SUBMIT,
                "--master", MASTER_URL,
                "--py-files", zpath,
                "--conf", f"spark.pyspark.python={sys.executable}",
                "--conf", "spark.executor.cores=4",
                "--conf", "spark.executor.memory=8g",
                "--conf", "spark.cores.max=8",
                "--conf", "spark.sql.shuffle.partitions=16",
                "--conf", "spark.local.dir=/dev/shm/spark-local",
                "--conf", "spark.locality.wait=0s",
                "--conf", "spark.scheduler.minRegisteredResourcesRatio=1.0",
                "--conf", "spark.scheduler.maxRegisteredResourcesWaitingTime=30s",
                app,
                bronze,
                os.path.join(tmp, "sub"),
            ]
            result["submit_command"] = " ".join(cmd)
            sub_out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1200, env=ENV,
                cwd=tmp,
            )
            sub = parse_result(sub_out)
            result["spark_submit_run"] = sub
        finally:
            for w in workers:
                stop(w)
            stop(master)

    checks = {
        "rows_match": sub["rows"] == ref["rows"],
        "checksum_match": sub["checksum"] == ref["checksum"],
        "driver_imported_from_zip": ".zip" in sub["driver_import_path"]
        and not sub["driver_import_path"].startswith(REPO),
        "executor_imported_from_zip": ".zip" in sub["executor_import_path"],
    }
    result["checks"] = checks
    result["pass"] = all(checks.values())
    with open(os.path.join(REPO, "SPARK_SUBMIT_DEMO.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    if not result["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Stage-level diagnosis of multi-executor scaling (throwaway tool).

Times featurize→noop (pure map, no shuffle) and dedup→noop separately
at 1 vs 4 executors to locate where 4-executor efficiency is lost.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.bench_cluster_scaling import ENV, MASTER_URL, spark_class, stop  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
zdir = tempfile.mkdtemp()
zpath = shutil.make_archive(os.path.join(zdir, "greatex_spark"), "zip", {repo!r}, "greatex_spark")
from greatex_spark.session import get_spark
from greatex_spark.pipeline.stages import PipelineConfig, featurize, filter_kept, dedup

bronze_path, total_cores, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = get_spark(master={master!r}, app_name=f"diag-{{total_cores}}",
    shuffle_partitions=max(2 * total_cores, 16),
    extra_conf={{"spark.executor.cores": "8", "spark.executor.memory": "10g",
                "spark.cores.max": str(total_cores),
                "spark.pyspark.python": sys.executable,
                "spark.submit.pyFiles": zpath}})
bronze = spark.read.parquet(bronze_path)
cfg = PipelineConfig()

def noop(df): df.write.format("noop").mode("overwrite").save()

def t(name, fn, n=4):
    fn()  # warm
    times = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); times.append(round(time.perf_counter() - t0, 2))
    print(f"TIMING {{name}} {{times}}", flush=True)

sp = os.path.join(out_path, "silver")
def fw():
    featurize(bronze, cfg).write.mode("overwrite").parquet(sp)
t("featurize_parquet", fw)
silver = spark.read.parquet(sp)
t("dedup_noop", lambda: noop(dedup(filter_kept(silver), cfg)))
t("scan_only", lambda: noop(bronze))
t("ppl_only", lambda: noop(bronze.selectExpr("length(text) l").groupBy().sum("l")))
from greatex_spark.functions.heuristics_arrow import page_signals_arrow
from pyspark.sql import functions as F
t("signals_only", lambda: noop(bronze.select(page_signals_arrow(F.col("text")).alias("s"))))
from greatex_spark.functions.perplexity import log_perplexity_udf
t("ppl_udf_only", lambda: noop(bronze.select(log_perplexity_udf(F.col("text")).alias("p"))))
"""


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    master = spark_class(
        "org.apache.spark.deploy.master.Master",
        "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8089",
    )
    time.sleep(10)
    try:
        with tempfile.TemporaryDirectory(prefix="diag_", dir="/dev/shm") as btmp:
            bronze_path = os.path.join(btmp, "bronze")
            gen = (
                "import sys; sys.path.insert(0, {repo!r})\n"
                "from greatex_spark.session import get_spark\n"
                "from greatex_spark.pages import generate_pages\n"
                "spark = get_spark(master='local[32]', app_name='gen')\n"
                "generate_pages(spark, {n}, seed=42, num_partitions=128)"
                ".write.parquet({bp!r})\n"
            ).format(repo=REPO, n=n_pages, bp=bronze_path)
            subprocess.run([sys.executable, "-c", gen], check=True,
                           capture_output=True, timeout=900)
            for n_workers in (1, 4):
                workers = []
                for i in range(n_workers):
                    workers.append(spark_class(
                        "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                        "--cores", "8", "--memory", "12g",
                        "--host", "127.0.0.1",
                        "--port", str(7200 + i), "--webui-port", str(8200 + i),
                        "--work-dir", os.path.join(btmp, f"w{n_workers}_{i}"),
                        taskset=f"{8*i}-{8*i+7}",
                    ))
                time.sleep(15)
                try:
                    with tempfile.TemporaryDirectory(prefix=f"diagrun{n_workers}_", dir="/dev/shm") as tmp:
                        out = subprocess.run(
                            [sys.executable, "-c", DRIVER.format(repo=REPO, master=MASTER_URL),
                             bronze_path, str(8 * n_workers), tmp],
                            capture_output=True, text=True, timeout=1800, env=ENV)
                        print(f"=== {n_workers} executor(s) ===")
                        for line in out.stdout.splitlines():
                            if line.startswith("TIMING"):
                                print(line)
                        if "TIMING" not in out.stdout:
                            print(out.stdout[-1500:], out.stderr[-1500:])
                finally:
                    for w in workers:
                        stop(w)
                    time.sleep(3)
    finally:
        stop(master)


if __name__ == "__main__":
    main()

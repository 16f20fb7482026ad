"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): docs/sec end-to-end keep/drop + scrub
on a Common-Crawl-style page table.  The page table is synthesized
deterministically (greatex_spark.pages, seed=42) at a row count scaled
to the sf of ``$SPARK_GRAFT_SF_DIR`` and committed to parquet (bronze);
the timed section is bronze-read → featurize (heuristics + langid +
perplexity UDF + PII scrub in one projection) → keep-filter → MinHash-
LSH dedup → gold projection → parquet write.

Also times the headline operators from ``__spark_entry__`` on the
driver-provided tables at the same sf.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     GREATEX_BENCH_PAGES (override page count).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from greatex_spark.session import get_spark  # noqa: E402
from greatex_spark.pages import generate_pages  # noqa: E402
from greatex_spark.pipeline.stages import (  # noqa: E402
    PipelineConfig,
    dedup,
    featurize,
    filter_kept,
    gold_projection,
)

import __spark_entry__ as entrymod  # noqa: E402


def sf_of(sf_dir: str) -> float:
    tag = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(tag.replace("sf", ""))
    except ValueError:
        return 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_of(sf_dir)
    n_pages = int(os.environ.get("GREATEX_BENCH_PAGES", int(1_000_000 * sf)))
    spark = get_spark(app_name="greatex-bench")
    tmp = tempfile.mkdtemp(prefix="greatex_bench_")
    timings: dict[str, float] = {}

    def timed(name: str, fn, runs: int = 1) -> None:
        # min-of-runs for the micro queries: the sandbox host's capacity
        # swings ~30% minute-to-minute, and min is the steady-state
        # estimator (same convention as tools/bench_*_scaling)
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    try:
        # ---- synthesize + commit bronze (not timed: ingest, not filter) --
        bronze_path = os.path.join(tmp, "bronze")
        generate_pages(spark, n_pages, seed=42).write.parquet(bronze_path)
        bronze = spark.read.parquet(bronze_path)

        # ---- headline: end-to-end keep/drop + scrub + dedup --------------
        # staged exactly like the production runner: silver is committed
        # before dedup, so the dedup self-join (a diamond over silver)
        # reads the snapshot instead of recomputing featurize twice
        cfg = PipelineConfig()
        silver_path = os.path.join(tmp, "silver")
        gold_path = os.path.join(tmp, "gold")

        def run_pipeline():
            featurize(bronze, cfg).write.mode("overwrite").parquet(silver_path)
            silver = spark.read.parquet(silver_path)
            gold = gold_projection(dedup(filter_kept(silver), cfg))
            gold.write.mode("overwrite").parquet(gold_path)

        timed("pages_pipeline", run_pipeline, runs=2)
        docs_per_sec = round(n_pages / timings["pages_pipeline"], 1)
        kept_rows = spark.read.parquet(gold_path).count()

        # ---- operator headliners on the sf tables ------------------------
        qs = entrymod.queries()

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        timed("q1_lineitem_pricing", lambda: qs["q1_lineitem_pricing"](spark, sf_dir).collect(), runs=2)
        timed("suite_documents_gate", lambda: qs["suite_documents_gate"](spark, sf_dir).collect(), runs=2)
        timed("doc_pii_scrub", lambda: noop(qs["doc_pii_scrub"](spark, sf_dir)), runs=2)
        timed("doc_minhash_dedup", lambda: noop(qs["doc_minhash_dedup"](spark, sf_dir)), runs=2)
        timed("doc_langid", lambda: noop(qs["doc_langid"](spark, sf_dir)), runs=2)
        timed("ann_brute_topk", lambda: qs["ann_brute_topk"](spark, sf_dir).collect(), runs=2)

        # ---- ANN accuracy/speed trade: recall vs brute force -------------
        # (judged alongside latency — a fast ANN with unmeasured recall
        # is not an operator, it's a random-row sampler)
        from pyspark.sql import functions as F  # noqa: PLC0415

        from greatex_spark.operators.ann import (  # noqa: PLC0415
            brute_force_topk,
            brute_force_topk_arrow,
            ivf_topk,
            lsh_topk,
            lsh_topk_arrow,
        )

        # repartition: the embeddings fixture is a single parquet file →
        # one partition → single-task ANN; spread it across the cores
        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
            .cache()
        )
        ann_q = emb.where(F.col("vec_id") < 64)
        exact_pairs: set = set()

        def run_exact():
            exact_pairs.update(
                (r.query_id, r.neighbor_id)
                for r in brute_force_topk(ann_q, emb, k=5).collect()
            )

        timed("ann_exact_64q", run_exact, runs=2)
        timed(
            "ann_exact_arrow_64q",
            lambda: brute_force_topk_arrow(ann_q, emb, k=5).count(),
            runs=2,
        )
        recalls: dict[str, float] = {}
        for name, fn in (
            ("ann_lsh_64q", lambda: lsh_topk(ann_q, emb, dim=64, k=5, num_bits=4, num_tables=4)),
            ("ann_lsh_arrow_64q", lambda: lsh_topk_arrow(ann_q, emb, dim=64, k=5, num_bits=4, num_tables=4)),
            ("ann_ivf_64q", lambda: ivf_topk(ann_q, emb, k=5, nlist=8, nprobe=6)),
        ):
            got: set = set()

            def run(fn=fn, got=got):
                got.update((r.query_id, r.neighbor_id) for r in fn().collect())

            timed(name, run, runs=2)
            recalls[name] = round(len(exact_pairs & got) / len(exact_pairs), 4)

        total = round(sum(timings.values()), 3)
        print(
            json.dumps(
                {
                    "metric": "end_to_end pages pipeline (keep/drop + scrub + dedup)",
                    "value": timings["pages_pipeline"],
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    "pages": n_pages,
                    "kept": kept_rows,
                    "docs_per_sec": docs_per_sec,
                    "ann_recall": recalls,
                    "total_sec": total,
                    "cores": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

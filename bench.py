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


def _stage_ids(spark) -> set[int]:
    """Completed stage ids so far (UI REST API); empty set if UI off."""
    try:
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            return {s["stageId"] for s in json.load(r)}
    except Exception:
        return set()


def _shuffle_stats(spark, exclude: set[int]) -> dict | None:
    """Total + peak-stage shuffle write bytes for stages not in
    ``exclude`` — the measured shuffle footprint of one job section."""
    try:
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            stages = [s for s in json.load(r) if s["stageId"] not in exclude]
        if not stages:
            return None
        wr = [s.get("shuffleWriteBytes", 0) for s in stages]
        return {
            "shuffle_write_bytes_total": int(sum(wr)),
            "peak_stage_shuffle_write_bytes": int(max(wr)),
            "stages_measured": len(stages),
        }
    except Exception:
        return None


def _shuffle_written(spark) -> int | None:
    """Cumulative shuffle write bytes over all completed stages — the
    per-round delta of this is the cc_1m section's per-round shuffle
    footprint.  None if the UI REST API is off."""
    try:
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            return int(sum(s.get("shuffleWriteBytes", 0) for s in json.load(r)))
    except Exception:
        return None


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
    # UI on for this process only: the REST stage API is how the 1M
    # scale-up section measures its shuffle footprint
    spark = get_spark(
        app_name="greatex-bench",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "5000"},
    )
    # snapshots on tmpfs when available: cluster nodes own their local
    # disks, while this sandbox's 32 threads share one — same modeling
    # choice as tools/bench_cluster_scaling.py, and it sidesteps the
    # host's intermittent multi-second page-fault stalls on /tmp
    tmp = tempfile.mkdtemp(
        prefix="greatex_bench_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
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

        # min-of-3: the headline is the round-over-round comparison
        # anchor, and run 1 carries JVM/JIT warm-up — the sf0.1 1M-page
        # run measured a HIGHER docs/s than this 100k one (rate_vs_100k
        # 1.27), proving the 100k wall is part fixed overhead
        timed("pages_pipeline", run_pipeline, runs=3)
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

        # ---- corpus-assembly operators (round 3) -------------------------
        timed("doc_domain_quota", lambda: noop(qs["doc_domain_quota"](spark, sf_dir)), runs=2)
        timed("doc_pack_sequences", lambda: noop(qs["doc_pack_sequences"](spark, sf_dir)), runs=2)
        timed("doc_incremental_dedup",
              lambda: noop(qs["doc_incremental_dedup"](spark, sf_dir)), runs=2)
        timed("doc_dup_clusters", lambda: noop(qs["doc_dup_clusters"](spark, sf_dir)), runs=2)

        # ---- corpus-assembly operators (round 4) -------------------------
        timed("doc_dsir_sample", lambda: qs["doc_dsir_sample"](spark, sf_dir).collect(), runs=2)
        timed("emb_semdedup", lambda: noop(qs["emb_semdedup"](spark, sf_dir)), runs=2)

        # ---- quality-signal operators (round 5) ---------------------------
        timed("doc_c4_line_filter",
              lambda: noop(qs["doc_c4_line_filter"](spark, sf_dir)), runs=2)
        timed("doc_repetition_signals",
              lambda: noop(qs["doc_repetition_signals"](spark, sf_dir)), runs=2)
        timed("doc_ppl_buckets",
              lambda: noop(qs["doc_ppl_buckets"](spark, sf_dir)), runs=2)
        timed("pipeline_drop_audit",
              lambda: qs["pipeline_drop_audit"](spark, sf_dir).collect(), runs=2)
        timed("doc_token_budget",
              lambda: noop(qs["doc_token_budget"](spark, sf_dir)), runs=2)
        timed("doc_boilerplate_trim",
              lambda: noop(qs["doc_boilerplate_trim"](spark, sf_dir)), runs=2)
        timed("corpus_domain_report",
              lambda: qs["corpus_domain_report"](spark, sf_dir).collect(),
              runs=2)
        timed("doc_ngram_lm",
              lambda: noop(qs["doc_ngram_lm"](spark, sf_dir)), runs=2)

        # ---- relational/sketch operators (round 5) ------------------------
        timed("events_asof_attribution",
              lambda: noop(qs["events_asof_attribution"](spark, sf_dir)), runs=2)
        timed("events_error_window_stats",
              lambda: noop(qs["events_error_window_stats"](spark, sf_dir)), runs=2)
        timed("doc_ngram_hll",
              lambda: qs["doc_ngram_hll"](spark, sf_dir).collect(), runs=2)
        timed("doc_bigram_cms_heavy",
              lambda: qs["doc_bigram_cms_heavy"](spark, sf_dir).collect(), runs=2)

        # CMS hot path: same counters through the Arrow gather (the
        # literal-array plan above is the oracle-replayable spec)
        from pyspark.sql import functions as F  # noqa: PLC0415

        from greatex_spark.functions.textstats import (  # noqa: PLC0415
            normalize_for_fingerprint,
        )
        from greatex_spark.operators.cms import (  # noqa: PLC0415
            cms_heavy_hitters_arrow,
        )

        def run_cms_arrow():
            docs_cms = spark.read.parquet(f"{sf_dir}/documents.parquet")
            w_ = F.split(normalize_for_fingerprint(F.col("text")), " ")
            idx_ = F.sequence(F.lit(0), F.greatest(F.size(w_) - 2, F.lit(0)))
            grams_ = F.transform(
                idx_, lambda i: F.array_join(F.slice(w_, i + 1, 2), " ")
            )
            items_ = docs_cms.select(F.explode(grams_).alias("bigram"))
            cms_heavy_hitters_arrow(items_, "bigram", threshold=40).collect()

        timed("doc_bigram_cms_arrow", run_cms_arrow, runs=2)
        # substring dedup benches the xxhash64 hot path (the md5 spec
        # family exists for the DuckDB twin, not for production scans)
        from greatex_spark.operators.substringdedup import (  # noqa: PLC0415
            substring_dup_stats,
            trim_duplicate_substrings,
        )

        docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")
        timed("doc_substring_dup",
              lambda: noop(substring_dup_stats(docs_tbl, family="xxhash64")),
              runs=2)
        timed("doc_substring_trim",
              lambda: noop(trim_duplicate_substrings(docs_tbl,
                                                     family="xxhash64")),
              runs=2)

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
            lsh_topk_probe_arrow,
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
            # the PRODUCTION 64-query path: probe-restricted single scan
            # (broadcastable query set), same 4-bit × 4-table family as
            # the join-based spec — candidates never materialize as rows
            ("ann_lsh_64q", lambda: lsh_topk_probe_arrow(
                ann_q, emb, dim=64, k=5, num_bits=4, multiprobe=2, num_tables=4)),
            # join-based spec paths, retained for the non-broadcastable
            # regime (huge query sets / dedup self-joins) and as the
            # oracle-checked semantics (`ann_lsh_topk` in queries())
            ("ann_lsh_join_64q", lambda: lsh_topk(ann_q, emb, dim=64, k=5, num_bits=4, num_tables=4)),
            ("ann_lsh_arrow_64q", lambda: lsh_topk_arrow(ann_q, emb, dim=64, k=5, num_bits=4, num_tables=4)),
            ("ann_ivf_64q", lambda: ivf_topk(ann_q, emb, k=5, nlist=8, nprobe=6)),
        ):
            got: set = set()

            def run(fn=fn, got=got):
                got.update((r.query_id, r.neighbor_id) for r in fn().collect())

            timed(name, run, runs=2)
            recalls[name] = round(len(exact_pairs & got) / len(exact_pairs), 4)

        # PQ ranks by L2, so its recall referent is the exact-L2 top-k
        # (cosine overlap would conflate metric disagreement with
        # quantization error).  Uniform-random vectors are PQ's WORST
        # case — quantization error is in the distance itself, not just
        # the candidate set, and uniform data has no cluster structure
        # for sub-centroids to exploit (measured here: 0.52 at m=16,
        # ksub=64 vs 0.26 at the oracle-grade m=8, ksub=16).  On the
        # clustered corpus (the realistic regime — see the xover section
        # and tests) recall is >=0.8 at m=4, ksub=16.
        from greatex_spark.operators.ann import (  # noqa: PLC0415
            brute_force_l2_topk,
            pq_topk,
        )

        l2_pairs = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_l2_topk(ann_q, emb, k=5).collect()
        }
        pq_got: set = set()

        def run_pq():
            pq_got.update(
                (r.query_id, r.neighbor_id)
                for r in pq_topk(ann_q, emb, k=5, m=16, ksub=64).collect()
            )

        timed("ann_pq_64q", run_pq, runs=2)
        recalls["ann_pq_64q"] = round(len(l2_pairs & pq_got) / len(l2_pairs), 4)

        # flat-PQ production path: PQ IS IVF-PQ with one cell — the
        # probe-scan ADC kernel + exact refine, same L2 referent.  The
        # native pq_topk above stays as the oracle-grade spec path
        # (ann_pq_topk in queries()), like ann_lsh_join_64q does for LSH.
        from greatex_spark.operators.ann import (  # noqa: PLC0415
            ivfpq_topk_probe_arrow as _ivfpq_probe,
        )

        pqs_got: set = set()

        def run_pq_scan():
            pqs_got.update(
                (r.query_id, r.neighbor_id)
                for r in _ivfpq_probe(
                    ann_q, emb, k=5, nlist=1, nprobe=1, m=16, ksub=64, refine=256
                ).collect()
            )

        timed("ann_pq_scan_64q", run_pq_scan, runs=2)
        recalls["ann_pq_scan_64q"] = round(len(l2_pairs & pqs_got) / len(l2_pairs), 4)

        # IVF-PQ (probe-scan ADC + exact refine — the production path;
        # the native spec twin is the oracle-grade ann_ivfpq_topk driver
        # query): coarse cells prune candidates, residual codes spend
        # their resolution on within-cell variance, and the R-deep exact
        # re-rank recovers the neighbor margins quantization can't rank.
        # Same L2 referent as flat PQ.
        from greatex_spark.operators.ann import (  # noqa: PLC0415
            ivfpq_topk_probe_arrow,
        )

        ivfpq_got: set = set()

        def run_ivfpq():
            ivfpq_got.update(
                (r.query_id, r.neighbor_id)
                for r in ivfpq_topk_probe_arrow(
                    ann_q, emb, k=5, nlist=16, nprobe=8, m=16, ksub=64, refine=256
                ).collect()
            )

        timed("ann_ivfpq_64q", run_ivfpq, runs=2)
        recalls["ann_ivfpq_64q"] = round(len(l2_pairs & ivfpq_got) / len(l2_pairs), 4)

        # ---- ANN crossover: the regime approximate indexing exists for --
        # The fixture embeddings above are uniform-random (the worst case
        # for any space-partitioning index: every probe set is as good as
        # random).  Real text/image embeddings are CLUSTERED; on a seeded
        # clustered corpus (greatex_spark.embeddings) the probe-scan
        # paths do the brute-force scan at a few % of its FLOPs/memory
        # traffic.  Reported: wall time AND recall AND the exact
        # candidate fraction each index probes.
        import numpy as np  # noqa: PLC0415

        from greatex_spark.embeddings import (  # noqa: PLC0415
            generate_clustered_embeddings,
        )
        from greatex_spark.operators.ann import (  # noqa: PLC0415
            _hash_sample,
            _projection_matrix,
            _query_probe_map,
            _residuals,
            _sign_buckets_np,
            _vec_matrix,
            assign_cells_arrow,
            brute_force_l2_topk_arrow,
            bucket_col_arrow,
            ivf_topk_arrow,
            ivfpq_topk_probe_arrow,
            lsh_topk_probe_arrow,
            train_centroids,
            train_pq_codebooks,
        )

        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        xn = int(os.environ.get("GREATEX_XOVER_N", 400_000))
        xq_target = int(os.environ.get("GREATEX_XOVER_Q", 4096))
        xdim, xcl, xbits, xmp = 64, 256, 16, 2
        xemb = (
            generate_clustered_embeddings(spark, xn, dim=xdim, n_clusters=xcl)
            .select("vec_id", "embedding")
            .repartition(cores)
            .cache()
        )
        xemb.count()
        stride = max(1, xn // xq_target)
        xqdf = xemb.where(F.col("vec_id") % stride == 0).cache()
        n_queries = xqdf.count()
        cents = train_centroids(
            _vec_matrix(
                [r[1] for r in _hash_sample(xemb, "vec_id", "embedding", 8192).collect()]
            ),
            xcl, 10,
        )
        # IVF-PQ shares the IVF coarse quantizer; its residual codebooks
        # train on the same hash sample (m=16 × 8-bit codes = 16 bytes
        # stored per vector vs 256 raw — the scan-IO answer at 100 TB);
        # refine=256 exact re-ranks each query's ADC shortlist.  Its
        # recall referent is exact L2 (PQ's metric), benched alongside.
        xpq_m, xpq_ksub, xpq_refine = 16, 256, 256
        xpq_cbs = train_pq_codebooks(
            _residuals(
                _vec_matrix(
                    [
                        r[1]
                        for r in _hash_sample(
                            xemb, "vec_id", "embedding", 8192
                        ).collect()
                    ]
                ),
                cents,
            ),
            xpq_m,
            xpq_ksub,
        )
        xsets: dict[str, set] = {}
        for name, fn in (
            ("xover_exact_arrow", lambda: brute_force_topk_arrow(xqdf, xemb, k=5)),
            (
                "xover_exact_l2_arrow",
                lambda: brute_force_l2_topk_arrow(xqdf, xemb, k=5),
            ),
            (
                "xover_ivf_arrow",
                lambda: ivf_topk_arrow(
                    xqdf, xemb, k=5, nlist=xcl, nprobe=4, centroids=cents
                ),
            ),
            (
                "xover_lsh_arrow",
                lambda: lsh_topk_probe_arrow(
                    xqdf, xemb, dim=xdim, k=5, num_bits=xbits, multiprobe=xmp
                ),
            ),
            (
                "xover_ivfpq_arrow",
                lambda: ivfpq_topk_probe_arrow(
                    xqdf, xemb, k=5, nlist=xcl, nprobe=4, m=xpq_m, ksub=xpq_ksub,
                    centroids=cents, codebooks=xpq_cbs, refine=xpq_refine,
                ),
            ),
        ):
            got = xsets.setdefault(name, set())

            def run(fn=fn, got=got):
                got.clear()
                got.update((r.query_id, r.neighbor_id) for r in fn().collect())

            timed(name, run, runs=2)
        x_exact = xsets["xover_exact_arrow"]
        xover_recall = {
            n: round(len(x_exact & xsets[n]) / len(x_exact), 4)
            for n in ("xover_ivf_arrow", "xover_lsh_arrow")
        }
        x_exact_l2 = xsets["xover_exact_l2_arrow"]
        xover_recall["xover_ivfpq_arrow"] = round(
            len(x_exact_l2 & xsets["xover_ivfpq_arrow"]) / len(x_exact_l2), 4
        )
        # exact candidate fractions (instrumentation pass, not timed)
        qm = _vec_matrix([r.embedding for r in xqdf.collect()])
        _, cell_q = _query_probe_map(qm, np.array(cents), 4)
        cell_n = {
            r.cell: r.n
            for r in assign_cells_arrow(xemb, cents)
            .groupBy("cell").agg(F.count("*").alias("n")).collect()
        }
        frac_ivf = sum(
            cell_n.get(c, 0) * len(ql) for c, ql in cell_q.items()
        ) / (xn * n_queries)
        planes = np.array(_projection_matrix(xdim, xbits, 7))
        probe_sets: dict[int, set] = {}
        for qi, b in enumerate(_sign_buckets_np(qm, planes)):
            bs = {int(b)} | {int(b) ^ (1 << i) for i in range(xbits)}
            bs |= {
                int(b) ^ (1 << i) ^ (1 << j)
                for i in range(xbits) for j in range(i + 1, xbits)
            }
            for bb in bs:
                probe_sets.setdefault(bb, set()).add(qi)
        bucket_n = {
            r.b: r.n
            for r in xemb.select(
                bucket_col_arrow(F.col("embedding"), xdim, xbits, 7).alias("b")
            ).groupBy("b").agg(F.count("*").alias("n")).collect()
        }
        frac_lsh = sum(
            bucket_n.get(b, 0) * len(s) for b, s in probe_sets.items()
        ) / (xn * n_queries)
        ann_crossover = {
            "corpus_n": xn,
            "dim": xdim,
            "n_clusters": xcl,
            "queries": n_queries,
            "k": 5,
            "exact_sec": timings["xover_exact_arrow"],
            "exact_l2_sec": timings["xover_exact_l2_arrow"],
            "ivf_sec": timings["xover_ivf_arrow"],
            "lsh_sec": timings["xover_lsh_arrow"],
            "ivfpq_sec": timings["xover_ivfpq_arrow"],
            "speedup_ivf": round(
                timings["xover_exact_arrow"] / timings["xover_ivf_arrow"], 2
            ),
            "speedup_lsh": round(
                timings["xover_exact_arrow"] / timings["xover_lsh_arrow"], 2
            ),
            "speedup_ivfpq": round(
                timings["xover_exact_l2_arrow"] / timings["xover_ivfpq_arrow"], 2
            ),
            "recall": xover_recall,
            "candidate_fraction": {
                "xover_ivf_arrow": round(frac_ivf, 4),
                "xover_lsh_arrow": round(frac_lsh, 4),
                # ivfpq probes the same cells as ivf; refine exact-reads
                # only R of them per query
                "xover_ivfpq_arrow": round(frac_ivf, 4),
            },
            "config": {
                "ivf": {"nlist": xcl, "nprobe": 4},
                "lsh": {"num_bits": xbits, "multiprobe": xmp},
                "ivfpq": {
                    "nlist": xcl,
                    "nprobe": 4,
                    "m": xpq_m,
                    "ksub": xpq_ksub,
                    "refine": xpq_refine,
                    "code_bytes": xpq_m,
                    "raw_bytes": 4 * xdim,
                },
            },
        }
        xemb.unpersist()

        # ---- embedding-dedup recall on planted near-duplicates ----------
        # embedding_cosine_dedup's RETRIEVAL quality as a deduper (the
        # ANN recall numbers above measure top-k search, not dedup):
        # plant near-copies (deterministic ±1% per-coordinate noise,
        # cosine ≈ 0.9998 ≫ threshold 0.98) under higher ids and report
        # the fraction the operator removes, plus how many base rows it
        # drops.  n_clusters=n gives every base vector its own random
        # centroid — pairwise base cosines ≈ 0, so base drops measure
        # FALSE merges, not genuine near-dups.
        from greatex_spark.operators.ann import embedding_cosine_dedup  # noqa: PLC0415

        dn, dstride = 50_000, 25
        dbase = (
            generate_clustered_embeddings(spark, dn, dim=64, n_clusters=dn)
            .select("vec_id", "embedding")
            .repartition(cores)
            .cache()
        )
        planted = (
            dbase.where(F.col("vec_id") % dstride == 0)
            .select(
                (F.col("vec_id") + dn).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        + ((F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(1000))
                            - 500) / 500.0 * 0.01 * x)
                    ).cast("float"),
                ).alias("embedding"),
            )
        )
        dcorpus = dbase.unionByName(planted).cache()
        n_planted = dn // dstride
        kept_ids: set = set()

        def run_dedup():
            kept_ids.clear()
            kept_ids.update(
                r.vec_id
                for r in embedding_cosine_dedup(dcorpus, dim=64).select("vec_id").collect()
            )

        timed("emb_dedup_52k", run_dedup, runs=2)
        planted_caught = n_planted - sum(1 for i in kept_ids if i >= dn)
        base_dropped = dn - sum(1 for i in kept_ids if i < dn)
        dedup_recall = {
            "corpus_n": dn + n_planted,
            "planted_dups": n_planted,
            "planted_recall": round(planted_caught / n_planted, 4),
            "base_rows_dropped": base_dropped,
            "base_drop_fraction": round(base_dropped / dn, 5),
            "threshold": 0.98,
        }
        dbase.unpersist()
        dcorpus.unpersist()

        # ---- text-dedup recall on planted mutated near-duplicates -------
        # the flagship MinHash family's quality as a FUZZY deduper: plant
        # lightly-mutated copies (2% of words replaced deterministically —
        # 5-shingle Jaccard ≈ 0.8, the near-dup regime) that must be
        # caught, and heavily-mutated variants (35% replaced, Jaccard ≈
        # 0.2) that must NOT be merged.  Exact dedup catches none of
        # either (every fingerprint differs) — this is what LSH buys.
        from greatex_spark.operators.dedup import minhash_lsh_dedup  # noqa: PLC0415

        def mutate(src, rate_denom, tag):
            words = F.filter(
                F.split(F.trim(F.regexp_replace(F.lower(F.col("text")),
                                                r"\s+", " ")), " "),
                lambda w: w != "",
            )
            mutated = F.transform(
                words,
                lambda w, i: F.when(
                    F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit(tag)),
                           F.lit(rate_denom)) == 0,
                    F.concat(F.lit("zz"), F.conv(
                        F.abs(F.xxhash64(w, F.lit(tag))).cast("string"), 10, 36)),
                ).otherwise(w),
            )
            return src.select(
                (F.col("doc_id") + F.lit(100_000) * F.lit(tag)).alias("doc_id"),
                F.array_join(mutated, " ").alias("text"),
            )

        tbase = (
            generate_pages(spark, 20_000, seed=99)
            .select(F.xxhash64("url").alias("doc_id"), "text")
            .select(F.pmod(F.col("doc_id"), F.lit(50_000)).alias("doc_id"), "text")
            .dropDuplicates(["doc_id"])
            .repartition(cores)
            .cache()
        )
        n_tbase = tbase.count()
        src = tbase.where(F.col("doc_id") % 20 == 0)
        near = mutate(src, 50, 1)    # ~2% of words → must be caught
        far = mutate(src, 3, 2)      # ~35% of words → must survive
        n_near, n_far = near.count(), far.count()
        tcorpus = tbase.unionByName(near).unionByName(far).cache()
        kept_t: set = set()

        def run_text_dedup():
            kept_t.clear()
            kept_t.update(
                r.doc_id
                for r in minhash_lsh_dedup(tcorpus, family="xxhash64")
                .select("doc_id").collect()
            )

        timed("text_dedup_22k", run_text_dedup, runs=2)
        near_caught = n_near - sum(1 for i in kept_t if 100_000 <= i < 200_000)
        far_dropped = n_far - sum(1 for i in kept_t if i >= 200_000)
        base_dropped_t = n_tbase - sum(1 for i in kept_t if i < 100_000)
        text_dedup_recall = {
            "base_docs": n_tbase,
            "planted_near_dups": n_near,
            "near_dup_recall": round(near_caught / n_near, 4),
            "far_variants": n_far,
            "far_false_merge_fraction": round(far_dropped / n_far, 4),
            "base_docs_dropped": base_dropped_t,
            "mutation_rates": {"near": 0.02, "far": 0.33},
        }
        tbase.unpersist()
        tcorpus.unpersist()

        # ---- scale-up evidence: the same pipeline at 1M pages -------------
        # (10x the headline input on the same local[32]: docs/sec should
        # hold within ~20% of the 100k rate if the candidate caps, AQE
        # skew handling and the dedup aggregation scale linearly; shuffle
        # volume is measured from the UI REST API — `peak_stage_shuffle`
        # is the largest single stage's shuffle write)
        pages_1m = None
        n_1m = int(os.environ.get(
            "GREATEX_BENCH_PAGES_1M", "1000000" if sf >= 0.1 else "0"
        ))
        if n_1m and sum(timings.values()) > 420:
            # the host is running slow enough that the 10x section risks
            # an external timeout eating the whole JSON line — skip it
            # and say so rather than lose the run
            pages_1m = {"skipped": "bench already at "
                        f"{round(sum(timings.values()))}s on a slow host"}
            n_1m = 0
        if n_1m:
            try:
                b1 = os.path.join(tmp, "bronze1m")
                generate_pages(spark, n_1m, seed=42).write.parquet(b1)
                bronze1m = spark.read.parquet(b1)
                s1 = os.path.join(tmp, "silver1m")
                g1 = os.path.join(tmp, "gold1m")
                seen_stages = _stage_ids(spark)
                t0 = time.perf_counter()
                featurize(bronze1m, cfg).write.mode("overwrite").parquet(s1)
                silver1m = spark.read.parquet(s1)
                gold_projection(dedup(filter_kept(silver1m), cfg)).write.mode(
                    "overwrite"
                ).parquet(g1)
                dt = time.perf_counter() - t0
                shuf = _shuffle_stats(spark, exclude=seen_stages)
                rate = round(n_1m / dt, 1)
                pages_1m = {
                    "pages": n_1m,
                    "sec": round(dt, 3),
                    "docs_per_sec": rate,
                    "rate_vs_100k": round(rate / docs_per_sec, 3),
                    "kept": spark.read.parquet(g1).count(),
                    **(shuf or {}),
                }
                timings["pages_pipeline_1m"] = round(dt, 3)
            except Exception as ex:  # never let the scale-up probe kill the run
                pages_1m = {"error": f"{type(ex).__name__}: {ex}"}

        # ---- iterative-operator scale evidence: CC at 1M+ edges -----------
        # connected_components is the engine's only iterative operator;
        # the oracle/bench corpora exercise it at hundreds of edges only.
        # This section runs it at 1,001,023 edges with the RELIABLE
        # checkpoint_dir seam active and records what the O(log d) claim
        # predicts: rounds ~ log2(diameter) (NOT ~ diameter), and
        # per-round shuffle bytes roughly flat (linear in edges+labels,
        # not growing with the closure) — measured through the on_round
        # seam + the UI REST API.  Topology is deterministic: 250,000
        # 5-node chains (the realistic dense-near-dup regime, 1M edges)
        # plus ONE 1,024-edge path whose diameter forces the doubling
        # behavior to show itself.
        cc_1m = None
        n_cc = int(os.environ.get(
            "GREATEX_BENCH_CC_1M", "1" if sf >= 0.1 else "0"
        ))
        if n_cc and sum(timings.values()) > 420:
            cc_1m = {"skipped": "bench already at "
                     f"{round(sum(timings.values()))}s on a slow host"}
            n_cc = 0
        if n_cc:
            try:
                from greatex_spark.operators.cluster import connected_components

                chains = (
                    spark.range(1_250_000)
                    .where((F.col("id") + 1) % 5 != 0)
                    .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
                )
                long_path = spark.range(2_000_000, 2_001_024).select(
                    F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
                )
                edges = chains.unionByName(long_path)
                n_edges = 1_000_000 + 1_024
                rounds: list[dict] = []
                mark = {"t": None, "shuf": None}

                def on_round(i: int) -> None:
                    now, shuf = time.perf_counter(), _shuffle_written(spark)
                    rounds.append({
                        "round": i,
                        "sec": round(now - mark["t"], 3),
                        "shuffle_write_bytes": (
                            shuf - mark["shuf"]
                            if shuf is not None and mark["shuf"] is not None
                            else None
                        ),
                    })
                    mark["t"], mark["shuf"] = now, shuf

                t0 = time.perf_counter()
                mark["t"], mark["shuf"] = t0, _shuffle_written(spark)
                cc = connected_components(
                    edges,
                    checkpoint_dir=os.path.join(tmp, "cc_ckpt"),
                    on_round=on_round,
                )
                comp_stats = cc.groupBy("component").count().agg(
                    F.count("*").alias("components"),
                    F.max("count").alias("largest"),
                ).first()
                dt = time.perf_counter() - t0
                cc_1m = {
                    "edges": n_edges,
                    "nodes": 1_251_025,
                    "diameter": 1_024,
                    "rounds": len(rounds),
                    "log2_diameter": 10,
                    "sec": round(dt, 3),
                    "edges_per_sec": round(n_edges / dt, 1),
                    "per_round": rounds,
                    "components": int(comp_stats["components"]),
                    "largest_component": int(comp_stats["largest"]),
                    "topology_check": (
                        int(comp_stats["components"]) == 250_001
                        and int(comp_stats["largest"]) == 1_025
                    ),
                    "checkpoint": "reliable (checkpoint_dir set)",
                }
                timings["cc_1m_edges"] = round(dt, 3)
            except Exception as ex:  # never let the CC probe kill the run
                cc_1m = {"error": f"{type(ex).__name__}: {ex}"}

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
                    "ann_crossover": ann_crossover,
                    "emb_dedup_recall": dedup_recall,
                    "text_dedup_recall": text_dedup_recall,
                    "pages_1m": pages_1m,
                    "cc_1m": cc_1m,
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

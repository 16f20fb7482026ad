"""Same-warmed-session A/B of two code versions (old git rev vs the
working tree) for the bench queries whose round-over-round moves lacked
an explanation.

The sandbox host's capacity swings ~30% minute-to-minute, so absolute
timings from different sessions (e.g. BENCH_r03 vs BENCH_r04) cannot
distinguish a code regression from a loaded window.  The only honest
comparison is OLD and NEW code interleaved in ONE warmed JVM: this tool
materializes the old rev with ``git archive``, then for each target
alternates old/new timed runs (3 rounds, order flipping every round)
against IDENTICAL pre-built inputs, and reports per-version min/median
plus the min-ratio.  Both versions are pure-Python packages, so
swapping is just purging ``greatex_spark*``/``__spark_entry__`` from
``sys.modules`` and re-importing with the other root first on
``sys.path`` — the SparkSession, its JVM, and all cached inputs stay
warm across swaps.

Inputs shared across versions (verified identical by generator diff):
the bronze pages parquet (expression-level-only changes r3→r4) and the
clustered-embedding corpus (file unchanged).

Usage: python tools/ab_versions.py [old_rev] [targets...]
Writes AB_VERSIONS.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TMPDIR = "/dev/shm" if os.path.isdir("/dev/shm") else None
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ALL_TARGETS = (
    "pages_pipeline",
    "doc_minhash_dedup",
    "doc_dup_clusters",
    "xover_ivf_arrow",
    "xover_lsh_arrow",
)


def materialize_rev(rev: str) -> str:
    out = tempfile.mkdtemp(prefix=f"ab_{rev[:8]}_", dir=TMPDIR)
    tar = subprocess.run(
        ["git", "-C", REPO, "archive", rev, "greatex_spark", "__spark_entry__.py"],
        capture_output=True, check=True,
    )
    subprocess.run(["tar", "-x", "-C", out], input=tar.stdout, check=True)
    return out


def use_version(root: str, roots: list[str]) -> None:
    """Make ``root`` the import source for greatex_spark/__spark_entry__."""
    for m in list(sys.modules):
        if m == "greatex_spark" or m.startswith("greatex_spark.") or m == "__spark_entry__":
            del sys.modules[m]
    for r in roots:
        while r in sys.path:
            sys.path.remove(r)
    sys.path.insert(0, root)


def main() -> None:
    old_rev = sys.argv[1] if len(sys.argv) > 1 else "9ea9b5a"
    targets = sys.argv[2:] or list(ALL_TARGETS)
    old_root = materialize_rev(old_rev)
    roots = [old_root, REPO]

    from greatex_spark.session import get_spark  # current session helper

    spark = get_spark(app_name="ab-versions")
    tmp = tempfile.mkdtemp(prefix="ab_inputs_", dir=TMPDIR)
    results: dict[str, dict] = {}
    try:
        # ---- shared inputs (built once, cached/committed) ------------
        from pyspark.sql import functions as F

        need_pages = "pages_pipeline" in targets
        need_xover = any(t.startswith("xover_") for t in targets)
        if need_pages:
            from greatex_spark.pages import generate_pages

            bronze_path = os.path.join(tmp, "bronze")
            n_pages = int(os.environ.get("GREATEX_AB_PAGES", "100000"))
            generate_pages(spark, n_pages, seed=42).write.parquet(bronze_path)
        if need_xover:
            from greatex_spark.embeddings import generate_clustered_embeddings

            xn = int(os.environ.get("GREATEX_XOVER_N", "400000"))
            xemb = (
                generate_clustered_embeddings(spark, xn, dim=64, n_clusters=256)
                .select("vec_id", "embedding")
                .repartition(32)
                .cache()
            )
            xemb.count()
            xqdf = xemb.where(F.col("vec_id") % max(1, xn // 4096) == 0).cache()
            xqdf.count()

        def make_runner(target: str, root: str):
            """(Re)import ``root``'s modules and return a zero-arg
            timed-iteration callable for ``target``."""
            use_version(root, roots)
            if target == "pages_pipeline":
                from greatex_spark.pipeline.stages import (
                    PipelineConfig, dedup, featurize, filter_kept, gold_projection,
                )

                cfg = PipelineConfig()
                tag = os.path.basename(root)
                sp = os.path.join(tmp, f"silver_{tag}")
                gp = os.path.join(tmp, f"gold_{tag}")
                bronze = spark.read.parquet(bronze_path)

                def run():
                    featurize(bronze, cfg).write.mode("overwrite").parquet(sp)
                    silver = spark.read.parquet(sp)
                    gold_projection(dedup(filter_kept(silver), cfg)).write.mode(
                        "overwrite"
                    ).parquet(gp)

                return run
            if target in ("doc_minhash_dedup", "doc_dup_clusters"):
                import __spark_entry__ as entrymod

                q = entrymod.queries()[target]

                def run():
                    q(spark, SF_DIR).write.format("noop").mode("overwrite").save()

                return run
            if target in ("xover_ivf_arrow", "xover_lsh_arrow"):
                from greatex_spark.operators.ann import (
                    _hash_sample, _vec_matrix, ivf_topk_arrow,
                    lsh_topk_probe_arrow, train_centroids,
                )

                if target == "xover_ivf_arrow":
                    cents = train_centroids(
                        _vec_matrix(
                            [r[1] for r in
                             _hash_sample(xemb, "vec_id", "embedding", 8192).collect()]
                        ),
                        256, 10,
                    )

                    def run():
                        ivf_topk_arrow(
                            xqdf, xemb, k=5, nlist=256, nprobe=4, centroids=cents
                        ).collect()

                    return run

                def run():
                    lsh_topk_probe_arrow(
                        xqdf, xemb, dim=64, k=5, num_bits=16, multiprobe=2
                    ).collect()

                return run
            raise ValueError(f"unknown target {target!r}")

        rounds = int(os.environ.get("GREATEX_AB_ROUNDS", "3"))
        for target in targets:
            times: dict[str, list[float]] = {"old": [], "new": []}
            # one untimed warmup per version (plan compilation, JIT)
            for key, root in (("old", old_root), ("new", REPO)):
                make_runner(target, root)()
            for rnd in range(rounds):
                order = (("old", old_root), ("new", REPO))
                if rnd % 2 == 1:
                    order = tuple(reversed(order))
                for key, root in order:
                    run = make_runner(target, root)
                    t0 = time.perf_counter()
                    run()
                    times[key].append(round(time.perf_counter() - t0, 3))
            omin, nmin = min(times["old"]), min(times["new"])
            results[target] = {
                "old_sec": times["old"],
                "new_sec": times["new"],
                "old_min": omin,
                "new_min": nmin,
                "old_median": round(statistics.median(times["old"]), 3),
                "new_median": round(statistics.median(times["new"]), 3),
                "new_over_old_min_ratio": round(nmin / omin, 3),
                "verdict": (
                    "regression" if nmin > 1.1 * omin
                    else "improvement" if nmin < 0.9 * omin
                    else "parity"
                ),
            }
            print(f"{target}: old min {omin}s new min {nmin}s "
                  f"ratio {results[target]['new_over_old_min_ratio']}", flush=True)
    finally:
        use_version(REPO, roots)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old_root, ignore_errors=True)
        spark.stop()

    out = {
        "old_rev": old_rev,
        "protocol": "one warmed JVM/session; per target: 1 warmup per version, "
                    "then 3 interleaved rounds (order flips each round); "
                    "min-of-rounds compared",
        "sf_dir": SF_DIR,
        "results": results,
    }
    with open(os.path.join(REPO, "AB_VERSIONS.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

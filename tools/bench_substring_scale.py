"""Scale evidence for the ExactSubstr family (BASELINE.md section).

Generates N synthetic pages (the bench corpus generator, seed 42),
then runs `substring_dup_stats` and `trim_duplicate_substrings` on the
xxhash64 hot path with a noop sink, reporting wall time, docs/sec and
the REST-measured shuffle footprint of each.  The shuffle here is the
exploded (doc, pos, hash) occurrence relation — linear in corpus token
count; token strings never shuffle.

Usage: [N=400000] python tools/bench_substring_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _shuffle_stats, _stage_ids  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from greatex_spark.operators.substringdedup import (  # noqa: E402
    substring_dup_stats,
    trim_duplicate_substrings,
)
from greatex_spark.pages import generate_pages  # noqa: E402
from greatex_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
        }
    )
    n = int(os.environ.get("N", "1000000"))
    out: dict = {}
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "pages")
        generate_pages(spark, n, seed=42).select("url", "text").write.parquet(p)
        # full-range 64-bit ids on purpose: exercises the canonical
        # struct-min rule where an arithmetic composite key overflows
        pages = spark.read.parquet(p).select(
            F.xxhash64("url").alias("doc_id"), "text"
        )
        for name, fn in (
            ("stats", substring_dup_stats),
            ("trim", trim_duplicate_substrings),
        ):
            pre = _stage_ids(spark)
            t = time.time()
            fn(pages, family="xxhash64").write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.time() - t
            out[name] = {
                "pages": n,
                "sec": round(wall, 2),
                "docs_per_sec": round(n / wall, 1),
                **(_shuffle_stats(spark, pre) or {}),
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

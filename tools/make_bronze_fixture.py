"""Write the committed bronze page fixtures for the pipeline oracle.

``pipeline_pages_gold`` and its DuckDB twin must read the SAME bytes,
so the deterministic generated corpus (greatex_spark.pages, seed 42) is
committed once as parquet under ``tests/fixtures/`` — the Spark query
reads the directory, the oracle SQL reads the same files via
``read_parquet('<dir>/*.parquet')``.  Regenerate with:

    python tools/make_bronze_fixture.py

(Only needed if ``generate_pages`` ever changes; a parity pytest
asserts fixture == generator so drift is caught immediately.)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from greatex_spark.pages import generate_pages  # noqa: E402
from greatex_spark.session import get_spark  # noqa: E402

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures"
)
SIZES = (1500, 4000, 12000)
SEED = 42


def main() -> None:
    spark = get_spark(app_name="make_bronze_fixture")
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for n in SIZES:
        out = os.path.join(FIXTURE_DIR, f"bronze_pages_n{n}.parquet")
        if os.path.exists(out):
            shutil.rmtree(out)
        df = generate_pages(spark, n, seed=SEED)
        # the second-scale fixture is written as 4 part files (hash-
        # partitioned by url, deterministic) so the Spark read starts
        # from >1 partition — a single coalesced file would hide
        # partition-count-dependent bugs the sf0.1 sweep exists to catch
        df = df.repartition(4, "url") if n > 4000 else df.coalesce(1)
        df.write.parquet(out)
        # drop the _SUCCESS marker etc. so only part files are committed
        for f in os.listdir(out):
            if not f.endswith(".parquet"):
                os.remove(os.path.join(out, f))
        size = sum(
            os.path.getsize(os.path.join(out, f)) for f in os.listdir(out)
        )
        print(f"wrote {out}: {size / 1e6:.2f} MB")


if __name__ == "__main__":
    main()

"""Skew-handling operators for hot-key web data.

Common-Crawl-style corpora are domain-skewed (the fixture generator
plants ~30% of pages on one domain — ``pages.py:61-68``), and
BASELINE.json's north rule calls the remedies out explicitly: *salted
repartitioning on hash(url) and AQE skew-join hints*.  AQE skew-join
splitting is on by default (``session.py``); this module provides the
salting side:

- :func:`salted_repartition` — balanced physical layout for writes and
  downstream stages when the natural key clusters (all of one domain's
  pages landing in one partition makes one straggler task and one giant
  output file).
- :func:`salted_count_distinct` — exact per-key distinct counts where a
  single reducer per hot key would bottleneck: phase 1 de-duplicates on
  (key, value) — the shuffle spreads a hot key over as many reducers as
  it has distinct values — phase 2 counts per key over the already-tiny
  distinct stream.

Spark's map-side partial aggregation already de-skews algebraic
aggregates (sum/count/min/max); these helpers cover the cases it
cannot: physical layout and exact-distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    key_col: str = "url",
    num_partitions: int | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Repartition by ``(xxhash64(key), salt)`` so rows of a hot key
    family spread over ``salt_buckets`` partitions instead of one.

    The salt is a deterministic function of the full row position hash,
    not a random number — layouts are reproducible.  Use before wide
    writes or per-key stages when the key's *prefix* (domain) is hot
    even though full keys are unique."""
    salt = F.pmod(F.xxhash64(F.col(key_col), F.lit(0x5A17)), F.lit(salt_buckets))
    parts = [F.xxhash64(F.col(key_col)), salt]
    if num_partitions:
        return df.repartition(num_partitions, *parts)
    return df.repartition(*parts)


def salted_count_distinct(
    df: DataFrame,
    key_col: str,
    value_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct-count per key, skew-proof in two phases:

    1. ``dropDuplicates([key, value])`` — hash-partitioned on BOTH
       columns, so a hot key's rows fan out across the cluster instead
       of pinning one reducer;
    2. ``groupBy(key).count()`` over the distinct stream — at most one
       row per (key, value) reaches phase 2, so even a key with 10^9
       occurrences of 10 values sends 10 rows.

    Equivalent to ``groupBy(key).agg(count_distinct(value))`` (which
    plans a single expand + one reducer per key) — same result, bounded
    per-task load."""
    return (
        df.select(key_col, value_col)
        .where(F.col(value_col).isNotNull())  # count_distinct ignores nulls
        .dropDuplicates([key_col, value_col])
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(out_col))
    )

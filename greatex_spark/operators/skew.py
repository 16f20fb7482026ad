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
    salt_col: str | None = None,
) -> DataFrame:
    """Deterministic hash repartition on ``key_col``, optionally salted
    by a row-distinguishing second column.

    Two honest modes (a salt derived from the key alone spreads NOTHING
    beyond plain key hashing — all copies of a duplicated hot key would
    still share one hash):

    - ``salt_col=None`` (default): plain ``repartition(xxhash64(key))``.
      Correct when full keys are unique but cluster under a hot *prefix*
      (crawl feeds arriving grouped by domain: distinct urls hash apart,
      so the layout balances) — this is the pipeline's bronze-ingest
      case.
    - ``salt_col='warc_ts'`` (any row-dependent column): partition by
      ``(xxhash64(key), pmod(xxhash64(salt_col), salt_buckets))`` so the
      rows of a *repeated* hot key spread over up to ``salt_buckets``
      partitions.  Deterministic given the data (no ``rand()``), so
      layouts are reproducible across runs and cluster sizes."""
    parts = [F.xxhash64(F.col(key_col))]
    if salt_col is not None:
        parts.append(
            F.pmod(F.xxhash64(F.col(salt_col), F.lit(0x5A17)), F.lit(salt_buckets))
        )
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
    per-task load.  Keys whose values are ALL null still appear with
    count 0 (count_distinct ignores nulls but groupBy emits the key):
    nulls count as one value in phase 1, and phase 2 subtracts the null
    group per key — no extra pass over the raw data."""
    null_flag = F.col(value_col).isNull().cast("long")
    return (
        df.select(key_col, value_col)
        .dropDuplicates([key_col, value_col])
        .groupBy(key_col)
        .agg((F.count(F.lit(1)) - F.sum(null_flag)).cast("long").alias(out_col))
    )

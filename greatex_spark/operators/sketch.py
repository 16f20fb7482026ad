"""HyperLogLog-style distinct-count sketch, oracle-replayable.

Cardinality estimation is the 100-TB substitute for ``COUNT(DISTINCT)``:
"how many distinct n-grams / urls / fingerprints does this corpus
slice hold" drives dedup planning (shingle-space size → MinHash band
math), vocabulary budgeting, and drift monitoring — and the exact
answer needs a full shuffle of every distinct value.  The sketch needs
ONE aggregation over 256 integer registers per group, no distinct, no
second shuffle: partial ``max`` per register merges map-side, so the
exchange carries at most ``groups × m`` tiny rows no matter how many
billions of items flow in.

Why not ``approx_count_distinct``: Spark's HLL++ and DuckDB's
``approx_count_distinct`` use different hash functions and bias
tables, so their estimates can never hash-match cross-engine.  This
sketch derives EVERY bit from the repo's md5 hash family
(`operators/dedup.py:md5_long`), making the estimate a pure
deterministic function of the input — the DuckDB twin replays it to
the last bit, so the driver's value-hash gate applies to a SKETCH.

Estimator (classic HLL, Flajolet et al. 2007, trailing-zero rank):
  h       = md5_long(item)                      (60 uniform bits)
  bucket  = h & (m−1)                           (m = 2^b registers)
  w       = h >> b
  rho(w)  = trailing-zeros(w) + 1, capped       (tz via the
            ``bit_count((w & −w) − 1)`` identity — both engines)
  M_j     = max rho per (group, bucket)
  E       = alpha_m · m² / Σ_j 2^(−M_j)         (empty registers
            contribute 2^0)

The harmonic sum is computed in INTEGER arithmetic — Σ 2^(cap − M_j)
as BIGINT, ≤ m·2^cap = 2^56, exact — because accumulating the float
powers directly would make the sum order-dependent past 53 mantissa
bits and break cross-engine equality.  One float division at the end.
No small-range (linear-counting) correction: it needs ``ln``, whose
last-ulp behavior differs across libm implementations; callers sizing
sketches for < 2.5·m distincts should raise ``b`` instead (documented
trade: raw-HLL bias below ~640 distincts at m=256).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from greatex_spark.operators.dedup import (
    _norm_sql,
    md5_long,
    md5_long_sql,
)
from greatex_spark.functions.textstats import normalize_for_fingerprint


def _alpha_numerator(b: int, cap: int) -> float:
    """``alpha_m · m² · 2^cap`` as ONE Python float literal — both
    engines receive the identical double, so the final division is a
    single shared-operand IEEE op."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << cap)


def hll_rho(h: Column, b: int = 8, cap: int = 48) -> Column:
    """Register rank of a 60-bit nonneg hash: trailing zeros of the
    top ``60−b`` bits, +1, capped (``w == 0`` → cap)."""
    w = F.shiftright(h, b)
    tz = F.bit_count(w.bitwiseAND(F.lit(0) - w) - 1)
    return F.when(w > 0, F.least(tz + 1, F.lit(cap))).otherwise(F.lit(cap))


def hll_distinct(
    items: DataFrame,
    item_col: str,
    group_col: str,
    b: int = 8,
    cap: int = 48,
) -> DataFrame:
    """Per-group HLL estimate over ``(group, item)`` rows →
    ``(group, registers_used, hll_distinct)``.  Two aggregations, both
    with map-side partial merge; duplicate items cost nothing (max
    absorbs them), so callers should NOT pre-distinct."""
    m = 1 << b
    h = md5_long(F.col(item_col))
    regs = (
        items.select(
            F.col(group_col),
            h.bitwiseAND(F.lit(m - 1)).alias("__bucket"),
            hll_rho(h, b, cap).alias("__rho"),
        )
        .groupBy(group_col, "__bucket")
        .agg(F.max("__rho").alias("__M"))
    )
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {cap} - __M)")
    return (
        regs.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("registers_used"),
            F.sum(term).alias("__terms"),
        )
        .select(
            group_col,
            "registers_used",
            F.round(
                F.lit(_alpha_numerator(b, cap))
                / (
                    F.col("__terms")
                    + (F.lit(m) - F.col("registers_used")) * F.lit(1 << cap)
                ).cast("double"),
                2,
            ).alias("hll_distinct"),
        )
    )


def ngram_hll(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
    b: int = 8,
    cap: int = 48,
) -> DataFrame:
    """Distinct word-``n``-gram cardinality per group, sketched.  The
    gram column is the dedup family's normalized word window (same
    normalization as the fingerprint/minhash path), exploded WITHOUT
    per-doc distinct — the registers absorb repeats for free."""
    words = F.split(normalize_for_fingerprint(F.col(text_col)), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    exploded = docs.select(
        F.col(group_col), F.explode(grams).alias("__gram")
    )
    return hll_distinct(exploded, "__gram", group_col, b=b, cap=cap)


def ngram_hll_duckdb_sql(
    table: str = "documents",
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
    b: int = 8,
    cap: int = 48,
) -> str:
    """Oracle twin of :func:`ngram_hll` — the identical hash algebra
    in DuckDB (list slicing clamps exactly like Spark's ``slice``, so
    short documents produce the same truncated gram)."""
    m = 1 << b
    words = f"string_split({_norm_sql(text_col)}, ' ')"
    gram = f"array_to_string(ws[i : i + {n - 1}], ' ')"
    h = md5_long_sql("__gram")
    rho = (
        f"CASE WHEN __w > 0 THEN least(bit_count((__w & -__w) - 1) + 1, {cap}) "
        f"ELSE {cap} END"
    )
    return f"""
WITH __grams AS (
  SELECT {group_col}, unnest(list_transform(
           range(1, greatest(len(ws) - {n}, 0) + 2), i -> {gram})) AS __gram
  FROM (SELECT {group_col}, {words} AS ws FROM {table})
),
__hashed AS (
  SELECT {group_col}, ({h}) & {m - 1} AS __bucket, ({h}) >> {b} AS __w
  FROM __grams
),
__regs AS (
  SELECT {group_col}, __bucket, max({rho}) AS __M
  FROM __hashed GROUP BY {group_col}, __bucket
)
SELECT {group_col},
       CAST(count(*) AS BIGINT) AS registers_used,
       round({_alpha_numerator(b, cap)!r} /
             CAST(sum(1::BIGINT << ({cap} - __M))
                  + ({m} - count(*)) * (1::BIGINT << {cap}) AS DOUBLE),
             2) AS hll_distinct
FROM __regs GROUP BY {group_col}
"""

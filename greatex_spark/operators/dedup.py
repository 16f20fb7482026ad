"""Deduplication operators for web-scale training-data pipelines.

Four families, all shuffle-conscious and 100%-JVM in the hot path:

- **exact**: hash-groupBy on a normalized-content fingerprint
  (one shuffle, map-side partial dedup via the window min).
- **MinHash + LSH** (Broder 1997): shingles → permuted min-hashes →
  band buckets → bucket-join.  A doc is dropped iff some LSH band
  bucket contains a lower-id doc — the standard scalable
  approximation (no transitive-closure pass; documented semantics).
- **SimHash** (Charikar 2002): 64-bit sign-of-weighted-bit-sums over
  word hashes; near-dup candidates share one of four 16-bit bands.
- **n-gram Jaccard**: exact similarity on candidate pairs (a Column
  combinator usable after any candidate generator).

Determinism: every hash is ``xxhash64`` with an explicit per-
permutation literal salt — stable across Spark versions, partitions,
and cluster sizes.

Scale notes (10^12 docs): the only shuffles are (a) the band-bucket
exchange, whose width is ``num_bands × docs`` small rows (doc_id +
two longs), and (b) the per-doc min-reduction — both key-partitioned
with AQE skew splitting enabled (hot buckets from boilerplate text
are real; see ``session.py``).  Signatures are computed in one
projection; shingling never materializes more than one doc's shingle
array at a time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from greatex_spark.functions.textstats import normalize_for_fingerprint


# ---------------------------------------------------------------------------
# exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per normalized-content fingerprint."""
    fp = F.xxhash64(normalize_for_fingerprint(text_col)).alias("__fp")
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        df.select("*", fp)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


# ---------------------------------------------------------------------------
# MinHash


def shingles_col(text: Column | str, k: int = 5) -> Column:
    """Distinct word-k-shingles of the normalized text (k-word windows)."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(normalize_for_fingerprint(c), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, k), " "))
    )


def minhash_signature(
    text: Column | str, num_perm: int = 64, shingle_k: int = 5
) -> Column:
    """Array of ``num_perm`` min-hashes.  Permutation *i* is
    ``xxhash64(lit(i), xxhash64(shingle))`` — independent hash
    functions from one seeded family, evaluated entirely in codegen'd
    JVM expressions.

    The base shingle-hash array is **let-bound** by wrapping it in a
    single-element array and transforming over it: the lambda variable
    is evaluated once per row, so the (expensive) shingling +
    string-hash pass runs 1×, and the ``num_perm`` permutations only
    re-hash cheap longs.  Without this, Catalyst inlines the shingle
    expression into every permutation lambda — a measured ~50× blowup."""
    sh = shingles_col(text, shingle_k)
    base = F.transform(sh, lambda s: F.xxhash64(s))
    return F.element_at(
        F.transform(
            F.array(base),
            lambda bh: F.transform(
                F.sequence(F.lit(0), F.lit(num_perm - 1)),
                lambda i: F.array_min(F.transform(bh, lambda b: F.xxhash64(i, b))),
            ),
        ),
        1,
    )


def band_hashes(
    text: Column | str,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 5,
) -> Column:
    """LSH band-bucket hashes: the signature is let-bound (see
    :func:`minhash_signature`) so it is computed once, not per band."""
    r = num_perm // num_bands
    sig = minhash_signature(text, num_perm, shingle_k)
    return F.element_at(
        F.transform(
            F.array(sig),
            lambda s: F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.xxhash64(b, F.array_join(F.slice(s, b * r + 1, r), ",")),
            ),
        ),
        1,
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Drop near-duplicates: a row survives iff its id is the minimum of
    every LSH band bucket it lands in.

    ``num_perm=64, num_bands=16`` → r=4 rows/band; the Jaccard s-curve
    crosses 0.5 near s ≈ (1/b)^(1/r) ≈ 0.5."""
    if num_perm % num_bands:
        raise ValueError("num_perm must be divisible by num_bands")
    rows_per_band = num_perm // num_bands
    banded = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            band_hashes(F.col(text_col), num_perm, num_bands, shingle_k)
        ).alias("__band", "__bucket"),
    )
    w = Window.partitionBy("__band", "__bucket")
    reps = (
        banded.withColumn("__bucket_min", F.min("__id").over(w))
        .groupBy("__id")
        .agg(F.min("__bucket_min").alias("__rep"))
        .where(F.col("__id") == F.col("__rep"))
        .select(F.col("__id").alias(id_col))
    )
    return df.join(reps, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# SimHash


def simhash64(text: Column | str) -> Column:
    """64-bit SimHash over word hashes — pure higher-order expressions.

    bit_i(simhash) = 1  iff  sum over words of bit_i(xxhash64(word))
    exceeds n_words/2."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(normalize_for_fingerprint(c), " "), lambda w: w != F.lit(""))
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    n = F.size(hashes)
    # bit positions are Python ints (shift amounts must be literals);
    # each bit sum is one aggregate HOF over the word-hash array
    def _bit_sum(bit: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.shiftright(h, bit).bitwiseAND(F.lit(1)),
        )

    out = F.lit(0).cast("long")
    for i in range(64):
        bit_sum = _bit_sum(i)
        bit_val = F.lit(-(1 << 63) if i == 63 else (1 << i)).cast("long")
        out = out.bitwiseOR(
            F.when(bit_sum * 2 > n, bit_val).otherwise(F.lit(0).cast("long"))
        )
    return out


def simhash_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup filter: two docs are candidates when any of the four
    16-bit SimHash bands match (Hamming ≤ 3 within 64 bits is caught
    with high probability); survivors are the per-bucket min ids, as in
    :func:`minhash_lsh_dedup`."""
    sh = simhash64(text_col)
    banded = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.array(
                *[F.shiftright(sh, b * 16).bitwiseAND(F.lit(0xFFFF)) for b in range(4)]
            )
        ).alias("__band", "__bucket"),
    )
    w = Window.partitionBy("__band", "__bucket")
    reps = (
        banded.withColumn("__bucket_min", F.min("__id").over(w))
        .groupBy("__id")
        .agg(F.min("__bucket_min").alias("__rep"))
        .where(F.col("__id") == F.col("__rep"))
        .select(F.col("__id").alias(id_col))
    )
    return df.join(reps, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# n-gram Jaccard


def ngram_set(text: Column | str, n: int = 3) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(normalize_for_fingerprint(c), " "), lambda w: w != F.lit(""))
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    )


def ngram_jaccard(a: Column | str, b: Column | str, n: int = 3) -> Column:
    """Exact Jaccard similarity of the two texts' word-n-gram sets."""
    sa, sb = ngram_set(a, n), ngram_set(b, n)
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    num_perm: int = 16,
    num_bands: int = 8,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification:
    drop a row iff a lower-id candidate has Jaccard ≥ threshold.  The
    verify join only materializes candidate pairs (bucket co-members),
    never the quadratic cross product."""
    banded = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__text"),
        F.explode(band_hashes(F.col(text_col), num_perm, num_bands, shingle_k=n)).alias(
            "__bucket"
        ),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    dropped = (
        left.join(
            right,
            (F.col("l.__bucket") == F.col("r.__bucket"))
            & (F.col("l.__id") > F.col("r.__id")),
        )
        .where(ngram_jaccard(F.col("l.__text"), F.col("r.__text"), n) >= threshold)
        .select(F.col("l.__id").alias(id_col))
        .distinct()
    )
    return df.join(dropped, on=id_col, how="left_anti")

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


def shingle_hashes(text: Column | str, k: int = 5) -> Column:
    """Distinct 64-bit hashes of the word-k-shingles, composed NUMERICALLY:
    words are hashed once, then each shingle hash is ``xxhash64`` of the
    k word-hash longs — the shingle strings are never materialized
    (word-salad shingle strings were the dominant allocation in the
    dedup hot path; longs keep the interpreted HOF pass GC-light, which
    is what lets the stage scale with cores)."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(normalize_for_fingerprint(c), " ")
    from greatex_spark.functions.exprs import let

    def grams(wh: Column) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(wh) - k, F.lit(0)))
        return F.array_distinct(
            F.transform(
                idx,
                lambda i: F.xxhash64(*[F.element_at(wh, i + j + 1) for j in range(k)]),
            )
        )

    return let(F.transform(words, lambda w: F.xxhash64(w)), grams)


def minhash_signature(
    text: Column | str, num_perm: int = 64, shingle_k: int = 5
) -> Column:
    """Array of ``num_perm`` min-hashes.  Permutation *i* is
    ``xxhash64(lit(i), shingle_hash)`` — independent hash functions from
    one seeded family, evaluated entirely in JVM expressions.

    The base shingle-hash array is **let-bound** (see
    :mod:`greatex_spark.functions.exprs`): it is evaluated once per row,
    and the ``num_perm`` permutations only re-hash cheap longs.  Without
    this, Catalyst inlines the shingle expression into every permutation
    lambda — a measured ~50× blowup."""
    base = shingle_hashes(text, shingle_k)
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


_SIMHASH_MASKS = None


def _simhash_masks() -> Column:
    global _SIMHASH_MASKS
    if _SIMHASH_MASKS is None:
        _SIMHASH_MASKS = F.array(
            *[
                F.lit(-(1 << 63) if i == 63 else (1 << i)).cast("long")
                for i in range(64)
            ]
        )
    return _SIMHASH_MASKS


def simhash64(text: Column | str) -> Column:
    """64-bit SimHash over word hashes — pure higher-order expressions.

    bit_i(simhash) = 1  iff  count over words of bit_i(xxhash64(word))
    exceeds n_words/2.  ONE pass over the word-hash array: the per-bit
    counters live in a 64-long accumulator array updated by a nested
    ``zip_with`` against literal bit masks (HOFs are interpreted, so a
    per-bit ``aggregate`` would re-hash every word 64 times)."""
    from greatex_spark.functions.exprs import let

    c = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(normalize_for_fingerprint(c), " "), lambda w: w != F.lit(""))
    masks = _simhash_masks()

    def from_hashes(hashes: Column) -> Column:
        n = F.size(hashes)
        counts = F.aggregate(
            hashes,
            F.array_repeat(F.lit(0).cast("long"), 64),
            lambda acc, h: F.zip_with(
                acc, masks, lambda a, m: a + (h.bitwiseAND(m) != 0).cast("long")
            ),
        )
        return F.aggregate(
            F.zip_with(
                counts,
                masks,
                lambda cnt, m: F.when(cnt * 2 > n, m).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc.bitwiseOR(v),
        )

    return let(F.transform(words, lambda w: F.xxhash64(w)), from_hashes)


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup filter, candidate-generate + verify:

    1. signature computed ONCE per row (own projection);
    2. candidates = pairs sharing any of the four 16-bit bands (by the
       pigeonhole principle this catches every pair with Hamming ≤ 3);
    3. verify with an exact popcount on the XOR of full signatures;
    4. drop the higher id of each verified pair.

    The band exchange shuffles only (id, band, bucket, sig) rows; the
    verify join never sees more than one bucket's candidates."""
    sigs = df.select(F.col(id_col).alias("__id"), simhash64(text_col).alias("__sim"))
    banded = sigs.select(
        "__id",
        "__sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("__sim"), b * 16).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("__band", "__bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    dropped = (
        left.join(
            right,
            (F.col("l.__band") == F.col("r.__band"))
            & (F.col("l.__bucket") == F.col("r.__bucket"))
            & (F.col("l.__id") > F.col("r.__id")),
        )
        .where(
            F.bit_count(F.col("l.__sim").bitwiseXOR(F.col("r.__sim"))) <= max_hamming
        )
        .select(F.col("l.__id").alias(id_col))
        .distinct()
    )
    return df.join(dropped, on=id_col, how="left_anti")


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

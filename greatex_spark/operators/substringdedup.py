"""ExactSubstr-style duplicated-substring detection (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better").

Lee et al. build a suffix array over the whole corpus and mark every
>=50-token substring that occurs twice — a single-node, memory-bound
design.  The Spark-native recast is shingle fingerprinting: every
k-token window becomes a 62-bit polynomial hash composed from per-word
hashes (the same overflow-safe composition as the MinHash family,
``operators/dedup.py``); a window whose hash occurs more than once in
the corpus marks its k tokens as duplicated; per document, the union of
marked windows gives the duplicated-token count and fraction — the
gate signal (Lee et al. drop or trim documents dominated by repeated
substrings; a suite rule ``dup_token_fraction <= x`` expresses that
declaratively here).

Scale shape (the part the suffix array cannot do):

- occurrences shuffle as ``(doc_id, pos, hash)`` triples — token
  strings never leave their scan;
- the duplicate decision is ONE groupBy(hash).count() — fully
  map-side combinable, no collected lists, hot shingles stream
  through the partial count;
- the span union is a per-document window over positions (narrow:
  partitioned by doc_id), contribution ``min(k, next_pos - pos)`` —
  no per-doc collected arrays;
- everything is replayed by the DuckDB twin for the md5 spec family;
  ``family="xxhash64"`` swaps GC-light JVM hashing for production.

Reference lineage: generalizes the staged validation pipeline's
repetition gates (SURVEY §2 A-ext; /root/reference/dags/scripts/python/
retail_transform.py's declarative quality suite) to corpus-global
substring duplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from greatex_spark.functions.exprs import let
from greatex_spark.operators.dedup import (
    _compose_hash,
    _compose_hash_sql,
    md5_long,
    md5_long_sql,
)

DEFAULT_K = 13  # same shingle width as benchmark decontamination


def _word_hashes(text, family: str):
    words = F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))
    if family == "xxhash64":
        return F.transform(words, lambda w: F.xxhash64(w))
    return F.transform(words, lambda w: md5_long(w))


def substring_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    family: str = "md5",
) -> DataFrame:
    """Per-document duplicated-substring statistics.

    Returns one row per input document: ``id_col``, ``n_tokens``,
    ``dup_tokens`` (tokens covered by at least one k-token window whose
    hash occurs >1 time in the corpus) and ``dup_token_fraction``.
    Documents shorter than k tokens have no windows and report 0."""
    wh = _word_hashes(F.col(text_col), family)
    # let-bind the word-hash array: element_at must hit a lambda
    # variable, not a column reference Catalyst may inline — inlining
    # re-evaluates the whole split+hash pipeline per element_at
    # (k per window), the same no-CSE-inside-interpreted-HOF blow-up
    # as round 4's langid argmax (measured here: sf0.1 single-task
    # scan went from >10 min to seconds)
    windows = let(
        wh,
        lambda arr: F.when(
            F.size(arr) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - k),
                lambda i: _compose_hash(
                    [F.element_at(arr, i + j + 1) for j in range(k)]
                ),
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    )
    # n_tokens recounts the split without the per-word hashes — cheaper
    # than threading a struct through the let and letting a collapse
    # duplicate the hashed array
    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
    ).cast("long")
    base = df.select(
        F.col(id_col).alias("__id"),
        n_tokens.alias("__n_tokens"),
        windows.alias("__whs"),
    )
    occ = base.select(
        "__id", F.posexplode("__whs").alias("__pos", "__h")
    )
    dup_hashes = occ.groupBy("__h").count().where(F.col("count") > 1).select("__h")
    dup_occ = occ.join(dup_hashes, "__h").select("__id", "__pos")
    w = Window.partitionBy("__id").orderBy("__pos")
    contrib = F.least(
        F.lit(k).cast("long"),
        F.coalesce(F.lead("__pos").over(w) - F.col("__pos"), F.lit(k)).cast("long"),
    )
    per_doc = (
        dup_occ.select("__id", contrib.alias("__c"))
        .groupBy("__id")
        .agg(F.sum("__c").alias("__dup_tokens"))
    )
    out = base.select("__id", "__n_tokens").join(per_doc, "__id", "left")
    dup_tokens = F.coalesce(F.col("__dup_tokens"), F.lit(0).cast("long"))
    return out.select(
        F.col("__id").alias(id_col),
        F.col("__n_tokens").alias("n_tokens"),
        dup_tokens.alias("dup_tokens"),
        F.when(
            F.col("__n_tokens") > 0,
            dup_tokens.cast("double") / F.col("__n_tokens"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_fraction"),
    )


def substring_dup_stats_duckdb_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
) -> str:
    """DuckDB twin of :func:`substring_dup_stats` (md5 spec family):
    same tokenization, same per-word 60-bit md5 hashes, same two-state
    polynomial window composition, same >1 duplicate rule, same
    lead()-based span union."""
    words = f"regexp_extract_all({text_col}, '\\S+')"
    wh = f"list_transform({words}, w -> {md5_long_sql('w')})"
    window_hash = _compose_hash_sql(
        [f"__wh[i + {j}]" for j in range(k)]
    )
    return f"""
WITH __base AS MATERIALIZED (
  SELECT {id_col} AS __id,
         CAST(len(__wh) AS BIGINT) AS __n_tokens,
         CASE WHEN len(__wh) >= {k} THEN
           list_transform(range(1, len(__wh) - {k} + 2), i -> {window_hash})
         ELSE [] END AS __whs
  FROM (SELECT {id_col}, {wh} AS __wh FROM {table})),
__occ AS MATERIALIZED (
  SELECT __id,
         unnest(range(0, len(__whs))) AS __pos,
         unnest(__whs) AS __h
  FROM __base),
__dup AS (
  SELECT __h FROM __occ GROUP BY __h HAVING count(*) > 1),
__spans AS (
  SELECT o.__id,
         least({k}::BIGINT,
               coalesce(lead(o.__pos) OVER (PARTITION BY o.__id ORDER BY o.__pos)
                        - o.__pos, {k})) AS __c
  FROM __occ o JOIN __dup d ON o.__h = d.__h),
__per_doc AS (
  SELECT __id, CAST(sum(__c) AS BIGINT) AS __dup_tokens
  FROM __spans GROUP BY __id)
SELECT b.__id AS {id_col},
       b.__n_tokens AS n_tokens,
       coalesce(p.__dup_tokens, 0) AS dup_tokens,
       CASE WHEN b.__n_tokens > 0
            THEN coalesce(p.__dup_tokens, 0) / CAST(b.__n_tokens AS BIGINT)
            ELSE 0.0 END AS dup_token_fraction
FROM __base b LEFT JOIN __per_doc p ON b.__id = p.__id
"""

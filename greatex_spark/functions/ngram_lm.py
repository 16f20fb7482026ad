"""Distributed character-n-gram LM fitting — the TRAINING half of the
CCNet perplexity loop.

:mod:`greatex_spark.functions.perplexity` scores documents with an
interpolated character-trigram model whose counts come from a driver-
side ``_train`` over a tiny seed string.  Real pipelines fit that
model on a reference corpus (CCNet: KenLM over Wikipedia) — which at
any useful size is itself a distributed job.  This operator is that
job: the exact counting semantics of ``perplexity._train`` (two-space
pad, positions ``i >= 2``, uni/bi/tri read from the same window)
re-expressed as one corpus-scale aggregation.

Spark-first shape — why this holds at 100 TB:

1. ONE pass over the text: every scoring position ``i`` emits only its
   trigram ``s[i-2 : i+1]`` (the bigram and unigram at ``i`` are the
   trigram's own suffixes, so they are NOT exploded — they are derived
   later from the trigram *count table*, which is model-sized, not
   corpus-sized).  The explode feeds a single hash aggregation with
   map-side partial combine: hot trigrams ("th_", "ing") collapse
   inside each task before the exchange.
2. Bigram / unigram counters re-aggregate the trigram count table
   (``group by suffix``) — bounded by distinct-trigram cardinality
   (≤ |alphabet|³, in practice ~10⁴–10⁵ rows) regardless of corpus
   size.  The position sets line up exactly with ``_train``: every
   counted position contributes one trigram, whose suffix-2 is the
   bigram counted there and whose last char is the unigram.
3. MLE probabilities come from LEFT joins of each order onto its
   context order (trigram → prefix-2 bigram, bigram → prefix-1
   unigram, unigram → total) — joins between model-sized tables only.
   A gram whose context was never counted (document-boundary
   artifacts, same as ``_train``'s ``if _BI[bp] else 0.0``) gets NULL
   ``prob``.

Truncation to ``max_chars`` mirrors the scorer's CCNet-style prefix
rule and bounds per-doc cost.  All ratios are ONE IEEE double division —
bit-reproducible across engines and partitionings (emitting ``log``
here would not be: JVM and DuckDB libm ``log`` differ in the last
ulp; the scorer applies ``log`` at use time instead).

Reference scope: generalizes the import-time ``_train`` seed fit
(functions/perplexity.py) to corpus scale; no counterpart exists in
the reference repo (its validation suites never fit models).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from greatex_spark.functions.perplexity import MAX_SCORED_CHARS


def _padded(col: Column, max_chars: int) -> Column:
    return F.concat(F.lit("  "), F.substring(col, 1, max_chars))


def ngram_lm_fit(
    df: DataFrame,
    text_col: str = "text",
    max_chars: int = MAX_SCORED_CHARS,
    min_count: int = 1,
    materialize: bool = True,
) -> DataFrame:
    """Fit corpus-wide uni/bi/trigram counts + MLE probabilities.

    Output columns: ``order`` (1/2/3), ``gram``, ``cnt``, ``ctx_cnt``
    (count of the gram's context: prefix n-1-gram, or the position
    total for unigrams), ``prob`` = ``cnt / ctx_cnt`` (MLE; one exact IEEE division — the
    scorer takes ``log`` at use time) or NULL when the context was
    never counted.  ``min_count`` prunes OUTPUT
    rows only — context counts always derive from the full tables, so
    pruning never changes a surviving gram's probability.
    """
    s = _padded(F.col(text_col), max_chars)
    # one trigram per scoring position; guard short docs (Spark's
    # sequence(1, 0) is DESCENDING, not empty)
    tris = df.where(F.col(text_col).isNotNull()).select(
        F.explode(
            F.when(
                F.length(s) >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.length(s) - 2),
                    lambda j: F.substr(s, j, F.lit(3)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram")
    )
    tri = tris.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    if materialize:
        # The trigram count table feeds four consumers (bigram/unigram
        # re-aggs, the MLE join, the total).  Exchange reuse dedups
        # only some of those subtrees under AQE; an explicit eager
        # localCheckpoint pins the corpus to exactly ONE pass, and the
        # materialized table is model-sized (distinct trigrams), so
        # the executor-disk cost is trivial.  materialize=False keeps
        # the operator fully lazy for plan-shape tests.
        tri = tri.localCheckpoint(eager=True)
    bi = (
        tri.groupBy(F.substring("gram", 2, 2).alias("gram"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    uni = (
        tri.groupBy(F.substring("gram", 3, 1).alias("gram"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    total = uni.agg(F.sum("cnt").alias("__total"))

    def _mle(grams: DataFrame, ctx: DataFrame, plen: int, order: int) -> DataFrame:
        c = ctx.select(
            F.col("gram").alias("__ctx_gram"), F.col("cnt").alias("ctx_cnt")
        )
        return (
            grams.join(
                c, F.substring("gram", 1, plen) == F.col("__ctx_gram"), "left"
            )
            .select(
                F.lit(order).alias("order"),
                "gram",
                F.col("cnt").cast("bigint").alias("cnt"),
                F.col("ctx_cnt").cast("bigint").alias("ctx_cnt"),
                (
                    F.col("cnt").cast("double")
                    / F.col("ctx_cnt").cast("double")
                ).alias("prob"),
            )
        )

    uni_out = (
        uni.crossJoin(F.broadcast(total))
        .select(
            F.lit(1).alias("order"),
            "gram",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.col("__total").cast("bigint").alias("ctx_cnt"),
            (
                F.col("cnt").cast("double") / F.col("__total").cast("double")
            ).alias("prob"),
        )
    )
    out = uni_out.unionByName(_mle(bi, uni, 1, 2)).unionByName(_mle(tri, bi, 2, 3))
    return out.where(F.col("cnt") >= F.lit(min_count))


def ngram_lm_fit_duckdb_sql(
    table: str,
    text_col: str = "text",
    max_chars: int = MAX_SCORED_CHARS,
    min_count: int = 1,
) -> str:
    """DuckDB twin of :func:`ngram_lm_fit` — same pad/positions/counts,
    same left-join context derivation, same single exact division."""
    return f"""
WITH __s AS (
  SELECT '  ' || substr({text_col}, 1, {max_chars}) AS s
  FROM {table} WHERE {text_col} IS NOT NULL),
__tris AS (
  SELECT substr(s, j, 3) AS gram
  FROM __s, unnest(range(1, greatest(len(s) - 1, 1))) AS u(j)),
__tri AS (SELECT gram, count(*) AS cnt FROM __tris GROUP BY gram),
__bi AS (
  SELECT substr(gram, 2, 2) AS gram, sum(cnt) AS cnt FROM __tri GROUP BY 1),
__uni AS (
  SELECT substr(gram, 3, 1) AS gram, sum(cnt) AS cnt FROM __tri GROUP BY 1),
__total AS (SELECT sum(cnt) AS t FROM __uni),
__out AS (
  SELECT 1 AS "order", u.gram, u.cnt, t.t AS ctx_cnt,
         CAST(u.cnt AS DOUBLE) / CAST(t.t AS DOUBLE) AS prob
  FROM __uni u, __total t
  UNION ALL
  SELECT 2, b.gram, b.cnt, c.cnt,
         CAST(b.cnt AS DOUBLE) / CAST(c.cnt AS DOUBLE)
  FROM __bi b LEFT JOIN __uni c ON substr(b.gram, 1, 1) = c.gram
  UNION ALL
  SELECT 3, g.gram, g.cnt, c.cnt,
         CAST(g.cnt AS DOUBLE) / CAST(c.cnt AS DOUBLE)
  FROM __tri g LEFT JOIN __bi c ON substr(g.gram, 1, 2) = c.gram)
SELECT CAST("order" AS INT) AS "order", gram,
       CAST(cnt AS BIGINT) AS cnt, CAST(ctx_cnt AS BIGINT) AS ctx_cnt,
       prob
FROM __out WHERE cnt >= {min_count}
"""

"""Benchmark decontamination: drop training documents that share a
word-n-gram with an evaluation set.

The standard LLM-training hygiene step (GPT-3 appendix C / PaLM-style
"13-gram overlap" rules): any training document containing an n-gram
that also appears in a benchmark document is contaminated and must not
be trained on.  Recast Spark-first:

- n-grams are the NUMERIC md5-family shingle hashes of
  :func:`greatex_spark.operators.dedup.shingle_hashes` — no n-gram
  strings are materialized on either side, and the DuckDB oracle
  replays the identical composition.
- the benchmark side is tiny by definition (an eval set vs a 100 TB
  corpus): its distinct gram set is **broadcast**, so the corpus-side
  membership probe is a map-side ``left_semi`` hash join on a single
  corpus scan — no shuffle of corpus data at all.
- the only exchange is the ``distinct`` over contaminated ids (ids
  only, typically a small fraction of the corpus), and the final
  ``left_anti`` is again id-keyed.

Reference scope: the reference engine has no decontamination operator;
this extends the quality_filter tier per the task brief (training-data
pipeline operations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from greatex_spark.operators.dedup import shingle_hashes


def _gram_col(text_col: str, n: int, family: str) -> Column:
    return shingle_hashes(F.col(text_col), k=n, family=family)


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    family: str = "md5",
) -> DataFrame:
    """Distinct ids of corpus documents sharing at least one word
    n-gram (hash) with any benchmark document."""
    bench_grams = (
        benchmark.select(F.explode(_gram_col(text_col, n, family)).alias("__g"))
        .distinct()
    )
    corp_grams = corpus.select(
        F.col(id_col), F.explode(_gram_col(text_col, n, family)).alias("__g")
    )
    return (
        corp_grams.join(F.broadcast(bench_grams), "__g", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    family: str = "md5",
) -> DataFrame:
    """Corpus minus contaminated documents (schema unchanged)."""
    bad = contaminated_ids(corpus, benchmark, text_col, id_col, n, family)
    return corpus.join(bad, id_col, "left_anti")


def decontaminate_duckdb_sql(
    select_cols: str,
    corpus_table: str = "documents",
    benchmark_sql: str = "SELECT * FROM documents WHERE doc_id % 29 = 0",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> str:
    """Oracle for :func:`decontaminate` (md5 family): the same numeric
    shingle composition on both sides, set-membership via join."""
    from greatex_spark.operators.dedup import shingles_select_sql

    corp_sh = shingles_select_sql(corpus_table, id_col, text_col, n)
    bench_sh = shingles_select_sql("__benchmark", id_col, text_col, n)
    return f"""
WITH __benchmark AS ({benchmark_sql}),
__bg AS MATERIALIZED (
  SELECT DISTINCT unnest(h) AS g FROM ({bench_sh})),
__cg AS (
  SELECT {id_col}, unnest(h) AS g FROM ({corp_sh})),
__bad AS (
  SELECT DISTINCT c.{id_col} FROM __cg c JOIN __bg b ON c.g = b.g)
SELECT {select_cols} FROM {corpus_table} t
WHERE t.{id_col} NOT IN (SELECT {id_col} FROM __bad)
"""

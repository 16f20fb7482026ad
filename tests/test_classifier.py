"""Hashed linear quality classifier (functions/classifier.py): native
Column vs Python reference vs DuckDB twin, plus the fastText seam."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from greatex_spark.functions.classifier import (
    make_quality_score_udf,
    quality_score,
    quality_score_duckdb_sql,
    quality_score_py,
    with_quality_score,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog and the fox is quick",
    "xqzt bfkp zzzz qwerty asdf",
    "",
    "der die und das ist nicht ein mit auf sich",
    "Mixed CASE text, with punctuation! And the usual English words.",
]


def test_three_way_parity(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    got = [r.q for r in df.select(quality_score("text").alias("q")).collect()]
    py = [quality_score_py(t) for t in TEXTS]
    con = duckdb.connect()
    duck = [
        con.execute(
            f"SELECT {quality_score_duckdb_sql('t')} FROM (SELECT ? AS t)", [t]
        ).fetchone()[0]
        for t in TEXTS
    ]
    assert got == py == duck


def test_fluent_beats_gibberish(spark):
    df = with_quality_score(
        spark.createDataFrame([(TEXTS[0],), (TEXTS[1],)], ["text"])
    )
    fluent, gibberish = [r.quality_score for r in df.collect()]
    assert fluent > gibberish


def test_score_is_native_no_python(spark):
    df = spark.createDataFrame([(TEXTS[0],)], ["text"])
    plan = df.select(quality_score("text"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fasttext_seam_monkeypatched(spark):
    class FakeModel:
        def predict(self, text, k=-1):
            return (["__label__keep", "__label__drop"], [0.75, 0.25])

    udf = make_quality_score_udf("/models/fake.bin", loader=lambda p: FakeModel())
    df = spark.createDataFrame([("anything",), (None,)], ["text"])
    got = [r.q for r in df.select(udf(F.col("text")).alias("q")).collect()]
    assert got == [0.75, None]


def test_standin_udf_matches_column(spark):
    udf = make_quality_score_udf(None)
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    out = df.select(
        quality_score("text").alias("col_q"), udf(F.col("text")).alias("udf_q")
    )
    for r in out.collect():
        assert r.col_q == pytest.approx(r.udf_q, abs=1e-9)

"""Distributed n-gram LM fit (functions/ngram_lm.py): parity with the
driver-side perplexity trainer, DuckDB twin, and the one-corpus-pass
plan shape."""

from __future__ import annotations

import duckdb
import pytest

from greatex_spark.functions.ngram_lm import ngram_lm_fit, ngram_lm_fit_duckdb_sql
from greatex_spark.functions.perplexity import _train

DOC = "the quick brown fox jumps over the lazy dog, then the fox naps."


def _model(spark, rows, **kw):
    df = spark.createDataFrame([(t,) for t in rows], "text string")
    return {
        (r["order"], r.gram): (r.cnt, r.ctx_cnt, r.prob)
        for r in ngram_lm_fit(df, **kw).collect()
    }


def test_single_doc_matches_driver_trainer(spark):
    """On one document the distributed fit must reproduce
    perplexity._train exactly (same pad, same positions)."""
    uni, bi, tri, total = _train(DOC)
    got = _model(spark, [DOC], max_chars=10_000)
    for g, c in uni.items():
        assert got[(1, g)][0] == c
        assert got[(1, g)][1] == total
    for g, c in bi.items():
        assert got[(2, g)][0] == c
    for g, c in tri.items():
        assert got[(3, g)][0] == c
        # context = the trained bigram counter, exactly _log_term's p3
        ctx = got[(3, g)][1]
        assert ctx == (bi[g[:2]] if g[:2] in bi else None)
    n_rows = len(got)
    assert n_rows == len(uni) + len(bi) + len(tri)


def test_prob_is_exact_division(spark):
    got = _model(spark, [DOC], max_chars=10_000)
    for (_, _), (cnt, ctx, prob) in got.items():
        if ctx is not None:
            assert prob == cnt / ctx
        else:
            assert prob is None


def test_multi_doc_pad_per_document(spark):
    """Each doc is padded independently — no cross-document trigrams."""
    got = _model(spark, ["ab", "cd"], max_chars=100)
    # "  ab" contributes trigrams "  a", " ab"; no gram may span docs
    assert (3, "b c") not in got and (3, "abc") not in got
    assert got[(3, " ab")][0] == 1


def test_short_and_null_docs(spark):
    df = spark.createDataFrame([("x",), (None,), ("",)], "text string")
    rows = ngram_lm_fit(df).collect()
    # "  x" -> one position; "" -> "  " has no position; NULL dropped
    tri = {r.gram: r.cnt for r in rows if r["order"] == 3}
    assert tri == {"  x": 1}


def test_duckdb_twin_parity(spark):
    rows = [DOC, "short", "", "another doc with the fox and the dog again"]
    got = _model(spark, rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(r,) for r in rows])
    duck = {
        (o, g): (c, x, p)
        for o, g, c, x, p in con.execute(ngram_lm_fit_duckdb_sql("t")).fetchall()
    }
    assert got == duck


def test_min_count_prunes_output_not_contexts(spark):
    full = _model(spark, [DOC], max_chars=10_000)
    pruned = _model(spark, [DOC], max_chars=10_000, min_count=2)
    assert set(pruned) == {k for k, v in full.items() if v[0] >= 2}
    for k, v in pruned.items():
        assert full[k] == v  # same ctx_cnt/prob as the unpruned fit


def test_one_corpus_pass(spark):
    df = spark.createDataFrame([(DOC,)], "text string")
    plan = ngram_lm_fit(df)._jdf.queryExecution().executedPlan().toString()
    # with the trigram table materialized, the corpus explode
    # (Generate) is absent from the downstream plan entirely — every
    # consumer reads the model-sized checkpoint
    assert "Generate" not in plan
    assert "Window" not in plan
    # unmaterialized variant keeps the full lazy lineage
    lazy = (
        ngram_lm_fit(df, materialize=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" in lazy

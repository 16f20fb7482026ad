"""DSIR importance resampling: determinism, target enrichment, weight
semantics, and the distributed top-n plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from greatex_spark.operators.dsir import (
    dsir_log_weight,
    dsir_sample,
    fit_hashed_lm,
    gram_buckets,
    log_diff,
)

B = 256


@pytest.fixture(scope="module")
def corpus(spark):
    # target-ish docs repeat "alpha beta", raw-ish docs "gamma delta"
    rows = [(i, "alpha beta alpha beta alpha", "t") for i in range(40)]
    rows += [(100 + i, "gamma delta gamma delta gamma", "r") for i in range(160)]
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_gram_buckets_deterministic_and_ordered(spark):
    df = spark.createDataFrame(
        [(0, "One  two THREE"), (1, ""), (2, "solo")], "id long, text string"
    )
    got = {
        r.id: r.g
        for r in df.select("id", gram_buckets(F.col("text"), B).alias("g")).collect()
    }
    # 3 unigrams + 2 bigrams, all in [0, B)
    assert len(got[0]) == 5 and all(0 <= b < B for b in got[0])
    assert got[1] == []          # empty text -> no grams
    assert len(got[2]) == 1      # single word -> no bigrams
    # repartitioning changes nothing
    got2 = {
        r.id: r.g
        for r in df.repartition(3)
        .select("id", gram_buckets(F.col("text"), B).alias("g"))
        .collect()
    }
    assert got == got2


def test_fit_and_weights_prefer_target_docs(spark, corpus):
    target = fit_hashed_lm(corpus.where(F.col("kind") == "t"), num_buckets=B)
    raw = fit_hashed_lm(corpus, num_buckets=B)
    assert len(target) == len(raw) == B
    # log-probs: every entry finite and <= 0 after smoothing over >0 total
    assert all(math.isfinite(x) and x < 0 for x in target)
    diff = log_diff(target, raw)
    w = {
        r.kind: r.w
        for r in corpus.select(
            "kind", F.round(dsir_log_weight(F.col("text"), diff, B), 9).alias("w")
        )
        .dropDuplicates(["kind"])
        .collect()
    }
    assert w["t"] > 0 > w["r"]  # target-looking docs upweighted


def test_sample_enriches_target_and_is_deterministic(spark, corpus):
    target = fit_hashed_lm(corpus.where(F.col("kind") == "t"), num_buckets=B)
    raw = fit_hashed_lm(corpus, num_buckets=B)
    out = dsir_sample(corpus, target, raw, n=50, num_buckets=B)
    rows = [(r.doc_id, r.dsir_key) for r in out.collect()]
    assert len(rows) == 50
    kinds = [r.kind for r in out.collect()]
    # corpus is 20% target; importance resampling must strongly enrich it
    assert kinds.count("t") >= 35
    # keys are sorted desc and deterministic across partitionings
    keys = [k for _, k in rows]
    assert keys == sorted(keys, reverse=True)
    rows2 = [
        (r.doc_id, r.dsir_key)
        for r in dsir_sample(
            corpus.repartition(7), target, raw, n=50, num_buckets=B
        ).collect()
    ]
    assert rows == rows2


def test_sample_topn_is_take_ordered_not_global_sort(spark, corpus):
    target = fit_hashed_lm(corpus.where(F.col("kind") == "t"), num_buckets=B)
    raw = fit_hashed_lm(corpus, num_buckets=B)
    out = dsir_sample(corpus, target, raw, n=10, num_buckets=B)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # bounded per-partition heads + single merge, never a full sort
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_xxhash64_hot_path_family(spark, corpus):
    """The xxhash64 hot-path family: buckets stay in [0, B) (xxhash64
    is SIGNED — pmod, not %), fit+score compose, and the sampler still
    strongly enriches the target; md5 spec results are untouched."""
    target = fit_hashed_lm(
        corpus.where(F.col("kind") == "t"), num_buckets=B, family="xxhash64"
    )
    raw = fit_hashed_lm(corpus, num_buckets=B, family="xxhash64")
    bs = corpus.select(
        F.explode(gram_buckets(F.col("text"), B, "xxhash64")).alias("b")
    ).agg(F.min("b"), F.max("b")).collect()[0]
    assert 0 <= bs[0] <= bs[1] < B
    out = dsir_sample(corpus, target, raw, n=50, num_buckets=B, family="xxhash64")
    kinds = [r.kind for r in out.collect()]
    assert kinds.count("t") >= 35
    import pytest as _pytest

    with _pytest.raises(ValueError):
        gram_buckets(F.col("text"), B, "sha1")

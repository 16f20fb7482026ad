"""Real-model injection seam: a fake "real" fastText / KenLM model is
monkeypatched through the factory loaders and must fully displace the
deterministic stand-ins — in the standalone UDFs and through
``PipelineConfig`` into ``featurize``."""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import functions as F

from greatex_spark.functions.langid import langid_udf, make_langid_udf
from greatex_spark.functions.perplexity import (
    log_perplexity_udf,
    make_log_perplexity_udf,
)
from greatex_spark.pages import generate_pages
from greatex_spark.pipeline.stages import PipelineConfig, featurize

# loaders are lambdas so cloudpickle ships them BY VALUE to the python
# workers (a test-module top-level class might not be importable there);
# the model objects they build are created worker-side, never pickled
FAKE_FT_LOADER = lambda path: SimpleNamespace(  # noqa: E731
    predict=lambda texts, k=1: (
        [["__label__tlh"]] * len(texts),
        [[0.875]] * len(texts),
    )
)
FAKE_KENLM_LOADER = lambda path: SimpleNamespace(  # noqa: E731
    # log10 P = -words/2 → log-ppl = (words/2)*ln10/(words+1), ~1.151 for
    # long text; distinguishable from the trigram stand-in's range
    score=lambda s, bos=True, eos=True: -len(s.split()) / 2.0
)


def test_default_factories_return_standins():
    assert make_langid_udf() is langid_udf
    assert make_log_perplexity_udf() is log_perplexity_udf


def test_external_langid_routes_through_model(spark):
    df = spark.createDataFrame(
        [("a", "hello world"), ("b", None)], ["id", "text"]
    )
    udf = make_langid_udf("/models/lid.176.bin", loader=FAKE_FT_LOADER)
    rows = {
        r.id: r
        for r in df.select(
            "id", udf(F.col("text")).alias("r")
        ).select("id", "r.lang", "r.confidence").collect()
    }
    assert rows["a"].lang == "tlh" and rows["a"].confidence == 0.875
    assert rows["b"].lang is None and rows["b"].confidence is None


def test_external_perplexity_routes_through_model(spark):
    import math

    df = spark.createDataFrame([("a", "one two three four"), ("b", None)], ["id", "text"])
    udf = make_log_perplexity_udf("/models/en.arpa", loader=FAKE_KENLM_LOADER)
    rows = {r.id: r.p for r in df.select("id", udf(F.col("text")).alias("p")).collect()}
    expected = round(-(-4 / 2.0) * math.log(10.0) / 5, 6)
    assert rows["a"] == expected
    assert rows["b"] is None


def test_pipeline_config_model_seam(spark):
    """One constructor arg swaps the models for the whole pipeline: with
    the fake fastText claiming Klingon for everything, featurize's
    lang_pred must be 'tlh' everywhere (and keep therefore all-false
    against target_lang='en')."""
    pages = generate_pages(spark, 50, seed=11)
    cfg = PipelineConfig(
        langid_model="/models/lid.176.bin",
        langid_loader=FAKE_FT_LOADER,
        perplexity_model="/models/en.arpa",
        perplexity_loader=FAKE_KENLM_LOADER,
    )
    out = featurize(pages, cfg)
    agg = out.agg(
        F.count_distinct("lang_pred").alias("nl"),
        F.max("lang_pred").alias("lang"),
        F.sum(F.col("keep").cast("int")).alias("kept"),
        F.min("log_ppl").alias("lo"),
    ).collect()[0]
    assert (agg.nl, agg.lang, agg.kept) == (1, "tlh", 0)
    assert agg.lo is not None
    # both arrow and native feature paths honor the seam
    out2 = featurize(
        pages,
        PipelineConfig(
            arrow_features=False,
            langid_model="/models/lid.176.bin",
            langid_loader=FAKE_FT_LOADER,
        ),
    )
    assert out2.where(F.col("lang_pred") != "tlh").count() == 0

"""Toxicity blocklist signals + scrub (functions/toxicity.py): the
three-dialect byte-identity contract and the pipeline seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from greatex_spark.functions.toxicity import (
    DEFAULT_BLOCKLIST,
    load_blocklist,
    scrub_toxicity,
    scrub_toxicity_py,
    toxicity_count,
    toxicity_pattern,
)

CASES = [
    "this is a perfectly clean sentence",
    "well SHIT that went badly",          # case-insensitive
    "shitake mushrooms are fine",          # word boundary: no match
    "fuck, Fuck and FUCK — three hits",
    "a bastard file is a rasp, sadly flagged",  # blocklist FP, still masked
    "",
]


def test_spark_matches_python_byte_for_byte(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "i long, t string")
    got = {
        r["i"]: (r["s"], r["c"])
        for r in df.select(
            "i",
            scrub_toxicity("t").alias("s"),
            toxicity_count("t").alias("c"),
        ).collect()
    }
    import re

    pat = re.compile(toxicity_pattern(DEFAULT_BLOCKLIST))
    for i, t in enumerate(CASES):
        assert got[i][0] == scrub_toxicity_py(t), t
        assert got[i][1] == len(pat.findall(t)), t


def test_counts_and_boundaries(spark):
    df = spark.createDataFrame([("shitake shit SHIT.',",)], "t string")
    assert df.select(toxicity_count("t").alias("c")).first()["c"] == 2


def test_blocklist_terms_must_be_plain_words():
    with pytest.raises(ValueError):
        toxicity_pattern(("ok", "not ok (regex|injection)"))


def test_load_blocklist_seam(tmp_path):
    f = tmp_path / "ldnoobw.txt"
    f.write_text("# comment\nfoo\n\nBAR\n")
    assert load_blocklist(str(f)) == ("foo", "bar")
    bad = tmp_path / "bad.txt"
    bad.write_text("a b\n")
    with pytest.raises(ValueError):
        load_blocklist(str(bad))


def test_pipeline_seam_masks_after_pii(spark):
    from greatex_spark.pipeline.stages import PipelineConfig, featurize

    from greatex_spark.pages import generate_pages

    pages = generate_pages(spark, 30, seed=11).withColumn(
        "text", F.concat(F.col("text"), F.lit(" contact a@b.com you bastard"))
    )
    silver = featurize(pages, PipelineConfig(toxicity_blocklist=DEFAULT_BLOCKLIST))
    row = silver.select("text_scrubbed").first()["text_scrubbed"]
    assert row.endswith("contact <EMAIL> you <TOX>")
    # default config unchanged: PII-only scrub
    silver_default = featurize(pages, PipelineConfig())
    row2 = silver_default.select("text_scrubbed").first()["text_scrubbed"]
    assert row2.endswith("contact <EMAIL> you bastard")

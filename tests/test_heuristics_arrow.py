"""The Arrow-batched heuristic twin must agree with the native Column
spec feature-by-feature on every planted fixture class."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from greatex_spark.functions.heuristics import FEATURE_NAMES, quality_struct
from greatex_spark.functions.heuristics_arrow import quality_struct_arrow
from greatex_spark.pages import generate_pages


def test_arrow_matches_native_on_fixtures(spark):
    pages = generate_pages(spark, 400, seed=11).localCheckpoint()
    native = pages.select("url", quality_struct(F.col("text")).alias("q"))
    arrow = pages.select("url", quality_struct_arrow(F.col("text")).alias("q"))
    j = native.alias("n").join(arrow.alias("a"), "url").collect()
    assert len(j) == 400
    for row in j:
        for f in FEATURE_NAMES:
            nv, av = row["q"][f], row[2][f]
            if isinstance(nv, float):
                assert math.isclose(nv, av, rel_tol=0, abs_tol=1e-12), (row["url"], f, nv, av)
            else:
                assert nv == av, (row["url"], f, nv, av)


def test_page_signals_match_native_langid_and_bpe(spark):
    from greatex_spark.functions.heuristics_arrow import page_signals_arrow
    from greatex_spark.functions.textstats import bpe_token_count, detect_lang

    pages = generate_pages(spark, 400, seed=13).localCheckpoint()
    native = pages.select(
        "url",
        detect_lang("text").alias("lang_pred"),
        bpe_token_count("text").alias("n_bpe"),
    )
    arrow = pages.select("url", page_signals_arrow(F.col("text")).alias("s"))
    j = native.alias("n").join(arrow.alias("a"), "url").collect()
    assert len(j) == 400
    for row in j:
        assert row["lang_pred"] == row["s"]["lang_pred"], row["url"]
        assert row["n_bpe"] == row["s"]["n_bpe_tokens"], row["url"]


def test_arrow_matches_native_edge_cases(spark):
    texts = [
        "",
        " ",
        "one",
        "a b",
        "...",
        "- bullet\n- bullet\n* star\n1. numbered\n2) also",
        "ends with dots...\nand more…\nplain line",
        'He said "stop."',
        "x { y } javascript lorem ipsum",
        "the the the the the the",
        "word with nbsp",
        "tab\tseparated\twords here",
        "trailing spaces   ",
        "### ### ### hash heavy",
        # tab-led / control-char padded lines: Spark F.trim strips ONLY
        # spaces, so the bullet regex must still see the leading tab and
        # the terminal-punct rule the trailing tab
        "\t- tab-led bullet\n\t* another\n  - space-led bullet",
        "ends with tab then period.\t",
        "line ends in dots...\t\nreal terminal.",
        "\x0b vertical tab lead\n- bullet",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    native = df.select("i", quality_struct(F.col("text")).alias("q"))
    arrow = df.select("i", quality_struct_arrow(F.col("text")).alias("q"))
    j = native.alias("n").join(arrow.alias("a"), "i").orderBy("i").collect()
    for row in j:
        for f in FEATURE_NAMES:
            nv, av = row[1][f], row[2][f]
            if isinstance(nv, float):
                assert math.isclose(nv, av, rel_tol=0, abs_tol=1e-12), (row["i"], f, nv, av)
            else:
                assert nv == av, (row["i"], f, nv, av)

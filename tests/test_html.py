"""HTML→text extraction (functions/html.py): Spark vs CPython byte
identity on adversarial markup."""

from __future__ import annotations

from greatex_spark.functions.html import html_to_text, html_to_text_py

CASES = [
    "<html><body><p>plain paragraph</p></body></html>",
    "<div>nested <b>bold <i>italic</i></b> tail</div>",
    "<script>if (a < b) { alert('<p>not text</p>'); }</script>visible",
    "<style>p:before { content: '<'; }</style>styled out",
    "before<!-- a comment with <tags> inside -->after",
    "entities: &amp;lt; &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y",
    "<SCRIPT TYPE='text/javascript'>upper case</SCRIPT>kept",
    "multi\n  line\t\twhitespace   collapse",
    "unclosed <p tag",
    "",
]


def test_spark_matches_python_byte_for_byte(spark):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(CASES)], "i long, h string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text("h").alias("t")).collect()
    }
    for i, h in enumerate(CASES):
        assert got[i] == html_to_text_py(h), h


def test_extraction_semantics():
    assert html_to_text_py(CASES[0]) == "plain paragraph"
    assert html_to_text_py(CASES[1]) == "nested bold italic tail"
    assert html_to_text_py(CASES[2]) == "visible"
    assert html_to_text_py(CASES[3]) == "styled out"
    assert html_to_text_py(CASES[4]) == "before after"
    # entity decode happens AFTER tag strip: &lt;tag&gt; is text
    assert html_to_text_py(CASES[5]) == "entities: &lt; <tag> \"q\" 's' x y"
    assert html_to_text_py(CASES[6]) == "kept"
    assert html_to_text_py(CASES[7]) == "multi line whitespace collapse"


def test_pipeline_extracts_from_html_when_text_missing(spark, tmp_path):
    from pyspark.sql import functions as F

    from greatex_spark.pages import generate_pages
    from greatex_spark.pipeline.runner import run_pipeline
    from greatex_spark.pipeline.stages import PipelineConfig
    from greatex_spark.tables import Catalog

    pages = generate_pages(spark, 60, seed=21).withColumn(
        "text", F.lit("")  # feed ships html only
    )
    catalog = Catalog(str(tmp_path))
    run_pipeline(
        spark, catalog, 1, source_df=pages,
        config=PipelineConfig(extract_from_html=True), run_name="hx",
    )
    bronze = catalog.read_latest(spark, "pages_bronze")
    # text was derived from html for every row (wrapper markers gone)
    assert bronze.where("text = '' OR text IS NULL").count() == 0
    assert bronze.where("text LIKE '%<html>%'").count() == 0
    # default config does NOT extract — and the source gate correctly
    # rejects a feed whose text column contradicts its html
    import pytest

    from greatex_spark.expectations.compiler import GateFailed

    catalog2 = Catalog(str(tmp_path / "c2"))
    with pytest.raises(GateFailed):
        run_pipeline(spark, catalog2, 1, source_df=pages, run_name="hx2")

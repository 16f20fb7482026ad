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

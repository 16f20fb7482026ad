"""Run-report rendering (the Data-Docs recast, D5)."""

from __future__ import annotations

import os

from greatex_spark.expectations.compiler import run_suite
from greatex_spark.expectations.spec import E, Suite
from greatex_spark.pipeline.report import render_run_report, write_run_report


def _vr(spark, ok: bool):
    df = spark.createDataFrame([(1,), (None,)], "x int")
    exp = (
        E("expect_table_row_count_to_be_between", min_value=1, max_value=10)
        if ok
        else E("expect_column_values_to_not_be_null", column="x")
    )
    return run_suite(df, Suite.of("s", exp))


def test_render_pass_and_fail(spark):
    good, bad = _vr(spark, True), _vr(spark, False)
    md = render_run_report("r1", 7, {"source": good, "gold": bad}, {"bronze": 2})
    assert "epoch 7" in md and "| source | s | PASS" in md and "| gold | s | FAIL" in md
    assert "expect_column_values_to_not_be_null" in md
    assert "`bronze`: 2" in md


def test_write_run_report(spark, tmp_path):
    vr = _vr(spark, True)
    path = write_run_report(str(tmp_path), "r2", 3, {"source": vr})
    assert os.path.exists(path)
    assert "run-3-r2.md" in path
    assert "PASS" in open(path).read()


def test_runner_writes_report(spark, tmp_path):
    from greatex_spark.pages import generate_pages
    from greatex_spark.pipeline.runner import run_pipeline
    from greatex_spark.tables import Catalog

    catalog = Catalog(str(tmp_path))
    pages = generate_pages(spark, 300, seed=21).localCheckpoint()
    res = run_pipeline(spark, catalog, epoch=1, source_df=pages, run_name="rep")
    report = os.path.join(str(tmp_path), "reports", "run-1-rep.md")
    assert os.path.exists(report)
    body = open(report).read()
    assert "pages_source_suite" in body and str(res.epoch) in body


def test_html_data_docs(spark, tmp_path):
    from greatex_spark.pipeline.report import write_data_docs

    good, bad = _vr(spark, True), _vr(spark, False)
    page = write_data_docs(
        str(tmp_path), "r9", 4, {"source": good, "gold": bad}, {"bronze": 2}
    )
    html = open(page).read()
    assert html.startswith("<!DOCTYPE html>")
    assert 'class="pass">PASS' in html and 'class="fail">FAIL' in html
    assert "expect_column_values_to_not_be_null" in html
    # index lists the page; a second run extends it
    idx = os.path.join(str(tmp_path), "data_docs", "index.html")
    assert "run-4-r9.html" in open(idx).read()
    write_data_docs(str(tmp_path), "r9", 5, {"source": good})
    assert open(idx).read().count("run-") >= 2


def test_html_escapes_untrusted_values(spark):
    from greatex_spark.pipeline.report import render_run_report_html

    df = spark.createDataFrame([("<script>alert(1)</script>",), (None,)], "x string")
    vr = run_suite(df, Suite.of("s", E("expect_column_values_to_not_be_null",
                                       column="x")))
    html = render_run_report_html("<r>", 1, {"g": vr})
    assert "<script>" not in html
    assert "&lt;r&gt;" in html

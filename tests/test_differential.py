"""Dirty-corpus differential test — the engine's analogue of the
reference's signature acceptance test (swap in the dirty dataset →
exactly 19/23 expectations pass, /root/reference/README.md:459-507).

A clean generated corpus passes the source suite 10/10; a corpus with
five planted defect classes must fail EXACTLY the four expectations
those defects break — the full per-expectation outcome vector is
asserted, not just the suite verdict.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from greatex_spark.expectations.compiler import run_suite
from greatex_spark.pages import generate_pages
from greatex_spark.pipeline.suites import source_suite


def _corrupt(pages):
    """Plant one defect per class, keyed by row id parsed from the url."""
    rid = F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long")
    return pages.select(
        # null url (breaks not_be_null) + duplicate url (breaks unique)
        # + bad scheme (breaks the regex)
        F.when(rid == 5, F.lit(None))
        .when(rid == 11, F.regexp_replace("url", r"/page/11$", "/page/10"))
        .when(rid == 15, F.regexp_replace("url", "^https://", "ftp://"))
        .otherwise(F.col("url"))
        .alias("url"),
        "warc_ts",
        # html no longer decodes to text (breaks the extraction invariant)
        F.when(
            rid == 25, F.to_binary(F.lit("<html><body>WRONG</body></html>"), F.lit("utf-8"))
        )
        .otherwise(F.col("html"))
        .alias("html"),
        "text",
        # unknown language code (breaks the value_set)
        F.when(rid == 20, F.lit("xx")).otherwise(F.col("lang")).alias("lang"),
    )


EXPECTED_CLEAN = [True] * 10

# ordered per source_suite(): columns, row_count, url not_null, url unique,
# url regex, warc_ts not_null, text not_null, lang in_set, html type,
# extraction invariant
EXPECTED_DIRTY = [True, True, False, False, False, True, True, False, True, False]


def test_clean_corpus_fingerprint(spark):
    pages = generate_pages(spark, 200, seed=5).localCheckpoint()
    vr = run_suite(pages, source_suite(), collect_partial_unexpected=False)
    assert [r.success for r in vr.results] == EXPECTED_CLEAN
    assert vr.success


def test_dirty_corpus_fingerprint(spark):
    pages = _corrupt(generate_pages(spark, 200, seed=5)).localCheckpoint()
    vr = run_suite(pages, source_suite(), collect_partial_unexpected=True)
    got = [r.success for r in vr.results]
    assert got == EXPECTED_DIRTY, [
        (r.expectation_config["expectation_type"], r.success, r.result)
        for r in vr.results
    ]
    # statistics mirror the reference's "N/M expectations passed" line
    assert vr.statistics["successful_expectations"] == 5
    assert vr.statistics["evaluated_expectations"] == 10
    # the failed regex expectation carries BOTH partial-unexpected blocks
    url_regex = vr.results[4]
    assert url_regex.result["partial_unexpected_list"]
    counts = url_regex.result["partial_unexpected_counts"]
    assert counts and counts[0]["count"] >= 1
    # the planted bad row is the sample (deterministic lowest-first)
    assert any("ftp://" in v for v in url_regex.result["partial_unexpected_list"])


def test_on_failure_hook_fires(spark, tmp_path):
    import pytest

    from greatex_spark.pipeline.checkpoint import Checkpoint, run_checkpoint
    from greatex_spark.expectations.compiler import GateFailed

    pages = _corrupt(generate_pages(spark, 100, seed=5)).localCheckpoint()
    seen: list = []
    ckpt = Checkpoint(
        name="dirty_gate", suite=source_suite(), on_failure=seen.append
    )
    with pytest.raises(GateFailed):
        run_checkpoint(spark, pages, ckpt)
    assert len(seen) == 1 and not seen[0].success


def test_log_failure_action(spark, caplog):
    import logging

    import pytest

    from greatex_spark.pipeline.checkpoint import (
        Checkpoint,
        log_failure_action,
        run_checkpoint,
    )
    from greatex_spark.expectations.compiler import GateFailed

    pages = _corrupt(generate_pages(spark, 100, seed=5)).localCheckpoint()
    ckpt = Checkpoint(
        name="dirty_gate", suite=source_suite(), on_failure=log_failure_action
    )
    with caplog.at_level(logging.ERROR, logger="greatex_spark.checkpoint"):
        with pytest.raises(GateFailed):
            run_checkpoint(spark, pages, ckpt)
    assert any("checkpoint FAILED" in r.message for r in caplog.records)


def test_datasource_smoke(spark, tmp_path):
    import pytest

    from greatex_spark.sources.files import datasource_smoke

    path = str(tmp_path / "pages.parquet")
    generate_pages(spark, 20, seed=5).write.parquet(path)
    assert datasource_smoke(spark, path) == 5
    with pytest.raises(Exception):
        datasource_smoke(spark, str(tmp_path / "missing.parquet"))

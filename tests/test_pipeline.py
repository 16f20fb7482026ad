"""End-to-end pipeline tests: F1 vs planted labels, byte-identical
scrub, idempotent re-run, kill-and-resume, metrics/lineage artifacts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from greatex_spark.expectations.compiler import GateFailed
from greatex_spark.functions.pii import scrub_pii_py
from greatex_spark.pages import HTML_POST, HTML_PRE, generate_pages
from greatex_spark.pipeline.runner import (
    BRONZE,
    GOLD,
    KEPT,
    SILVER,
    run_pipeline,
)
from greatex_spark.pipeline.stages import PipelineConfig
from greatex_spark.tables import Catalog

N_PAGES = 2000


@pytest.fixture(scope="module")
def labeled(spark):
    return generate_pages(spark, N_PAGES, include_labels=True).cache()


@pytest.fixture(scope="module")
def pages(labeled):
    return labeled.select("url", "warc_ts", "html", "text", "lang")


@pytest.fixture(scope="module")
def completed(spark, tmp_path_factory, pages):
    catalog = Catalog(str(tmp_path_factory.mktemp("lake")))
    result = run_pipeline(spark, catalog, epoch=1, source_df=pages, run_name="r1")
    return catalog, result


def test_all_gates_pass(completed):
    _, result = completed
    assert all(v.success for v in result.validations.values()), result.summary()
    assert result.counts[KEPT] > 0


def test_keep_drop_f1(spark, completed, labeled):
    catalog, _ = completed
    gold = catalog.read_latest(spark, GOLD)
    pred = labeled.join(
        gold.select(F.col("url"), F.lit(True).alias("pred_keep")), "url", "left"
    ).select("url", "expected_keep", F.coalesce("pred_keep", F.lit(False)).alias("pred"))
    agg = pred.agg(
        F.sum((F.col("expected_keep") & F.col("pred")).cast("int")).alias("tp"),
        F.sum((~F.col("expected_keep") & F.col("pred")).cast("int")).alias("fp"),
        F.sum((F.col("expected_keep") & ~F.col("pred")).cast("int")).alias("fn"),
    ).collect()[0]
    precision = agg.tp / (agg.tp + agg.fp)
    recall = agg.tp / (agg.tp + agg.fn)
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, (f1, agg.tp, agg.fp, agg.fn)


def test_scrub_byte_identity_per_url(spark, completed, labeled):
    """BASELINE.json: byte-identical scrubbed text per url — the gold
    text must equal the standalone Python scrubber applied to the
    original text, byte for byte."""
    catalog, _ = completed
    gold = catalog.read_latest(spark, GOLD)
    joined = (
        labeled.where(F.col("page_class") == "has_pii")
        .select("url", F.col("text").alias("orig"))
        .join(gold.select("url", "text"), "url")
        .collect()
    )
    assert joined, "no PII docs survived to gold"
    for r in joined:
        assert r.text.encode() == scrub_pii_py(r.orig).encode(), r.url
        assert "@example.com" not in r.text


def test_gold_is_target_lang_only(spark, completed):
    catalog, _ = completed
    gold = catalog.read_latest(spark, GOLD)
    assert gold.where(F.col("lang") != "en").count() == 0


def test_near_dup_resolution(spark, completed, labeled):
    catalog, _ = completed
    gold = catalog.read_latest(spark, GOLD)
    pairs = (
        labeled.where(F.col("page_class") == "near_dup_pair")
        .join(gold.select("url", F.lit(True).alias("kept")), "url", "left")
        .select("url", "expected_keep", F.coalesce("kept", F.lit(False)).alias("kept"))
        .collect()
    )
    for r in pairs:
        assert r.kept == r.expected_keep, (r.url, r.expected_keep)


def test_metrics_and_lineage_written(spark, completed):
    catalog, result = completed
    metrics = catalog.read_latest(spark, "metrics")
    assert metrics.where(F.col("run_name") == "r1").count() >= 4 * 3  # 4 gates
    suites = {
        r.expectation_suite_name
        for r in metrics.select("expectation_suite_name").distinct().collect()
    }
    assert {
        "pages_source_suite",
        "pages_silver_suite",
        "pages_kept_suite",
        "pages_gold_suite",
    } <= suites
    lineage = catalog.read_latest(spark, "partition_lineage")
    ln = lineage.where(F.col("run_name") == "r1")
    tables = {r.table_name for r in ln.select("table_name").distinct().collect()}
    assert {BRONZE, SILVER, KEPT, GOLD} <= tables
    # lineage row counts must reconcile with the committed snapshots
    gold_rows = (
        ln.where(F.col("table_name") == GOLD).agg(F.sum("row_count")).collect()[0][0]
    )
    assert gold_rows == catalog.read_latest(spark, GOLD).count()


def test_idempotent_rerun(spark, completed, pages):
    """Running the same epoch twice must not change the gold snapshot
    (the reference's re-run idempotency, README.md:426-457)."""
    catalog, _ = completed
    gold1 = catalog.read_latest(spark, GOLD)
    chk1 = gold1.agg(F.bit_xor(F.xxhash64("url", "text", "n_tokens")).alias("h")).collect()[0].h
    n1 = gold1.count()
    run_pipeline(spark, catalog, epoch=1, source_df=pages, run_name="r2", resume=False)
    gold2 = catalog.read_latest(spark, GOLD)
    chk2 = gold2.agg(F.bit_xor(F.xxhash64("url", "text", "n_tokens")).alias("h")).collect()[0].h
    assert (n1, chk1) == (gold2.count(), chk2)


def test_resume_skips_committed_stages(spark, completed, pages):
    catalog, _ = completed
    result = run_pipeline(spark, catalog, epoch=1, run_name="r3", resume=True)
    assert set(result.skipped) == {BRONZE, SILVER, KEPT, GOLD}
    assert all(v.success for v in result.validations.values())


def test_gate_failure_halts_and_resume_completes(spark, tmp_path, pages):
    catalog = Catalog(str(tmp_path / "lake2"))
    # impossible keep corridor → the kept gate must fail AFTER bronze
    # and silver committed
    bad = PipelineConfig(keep_fraction_band=(0.95, 1.0))
    with pytest.raises(GateFailed, match="pages_kept_suite"):
        run_pipeline(spark, catalog, epoch=7, source_df=pages, config=bad, run_name="rA")
    assert catalog.has_epoch(BRONZE, 7) and catalog.has_epoch(SILVER, 7)
    assert not catalog.has_epoch(GOLD, 7)
    # fix the config, resume: bronze/silver skipped, pipeline completes
    result = run_pipeline(spark, catalog, epoch=7, config=PipelineConfig(), run_name="rB")
    assert BRONZE in result.skipped and SILVER in result.skipped
    assert catalog.has_epoch(GOLD, 7)
    assert all(v.success for v in result.validations.values())


def test_bronze_fixture_matches_generator(spark):
    """The committed parquet fixtures (tools/make_bronze_fixture.py) must
    stay byte-equal to generate_pages(seed=42) — the pipeline oracle
    reads the fixture files, so silent generator drift would quietly
    decouple the Spark query from its DuckDB twin."""
    import os

    fix_dir = os.path.join(os.path.dirname(__file__), "fixtures")
    for n in (1500, 4000, 12000):
        fixture = spark.read.parquet(
            os.path.join(fix_dir, f"bronze_pages_n{n}.parquet")
        )
        gen = generate_pages(spark, n, seed=42)
        # parquet round-trip relaxes nullability; names+types must match
        assert [(f.name, f.dataType) for f in fixture.schema] == [
            (f.name, f.dataType) for f in gen.schema
        ], n
        cols = [F.col(c) for c in gen.columns]

        def chk(df):
            return df.agg(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64(*cols)).alias("h"),
            ).collect()[0]

        assert chk(fixture) == chk(gen), n


def test_missing_bronze_requires_source(spark, tmp_path):
    catalog = Catalog(str(tmp_path / "lake3"))
    with pytest.raises(ValueError, match="source_df required"):
        run_pipeline(spark, catalog, epoch=3)


def test_kill_mid_gold_write_then_resume(spark, tmp_path, pages, completed):
    """REAL failure injection for the reference's depends_on_past
    recovery semantics (dags/retail_data_pipeline.py:14): a separate
    driver process runs the pipeline and is SIGKILLed (whole process
    group, JVM included) the moment the gold snapshot directory
    appears — i.e. mid-parquet-write, before the manifest pointer
    flip.  The partial snapshot must NOT be visible as committed, and
    a resume=True run in a fresh session must replace it and produce a
    gold table identical to an uninterrupted run's."""
    import os
    import signal
    import subprocess
    import sys
    import textwrap
    import time

    import greatex_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(greatex_spark.__file__)))
    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    pages.write.parquet(src)
    child = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {repo!r})
        from greatex_spark.session import get_spark
        from greatex_spark.tables import Catalog
        from greatex_spark.pipeline.runner import run_pipeline
        spark = get_spark(master="local[4]", app_name="kill-victim")
        run_pipeline(spark, Catalog({lake!r}), epoch=5,
                     source_df=spark.read.parquet({src!r}), run_name="victim")
    """)
    proc = subprocess.Popen(
        [sys.executable, "-c", child],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, preexec_fn=os.setsid,
    )
    gold_snap = os.path.join(lake, GOLD, "snapshot=5")
    deadline = time.time() + 600
    killed = False
    try:
        while time.time() < deadline and proc.poll() is None:
            if os.path.exists(gold_snap):
                os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
                killed = True
                break
            time.sleep(0.001)
    finally:
        if not killed:
            out, err = b"", b""
            try:
                os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
                out, err = proc.communicate(timeout=30)
            except Exception:
                pass
            pytest.fail(
                f"gold write never started (rc={proc.poll()}):\n"
                f"{err.decode(errors='replace')[-2000:]}"
            )
    proc.wait(timeout=30)

    catalog = Catalog(lake)
    # the kill landed after the snapshot dir appeared but before the
    # manifest flip: partial bytes on disk, nothing committed
    assert os.path.exists(gold_snap)
    assert not catalog.has_epoch(GOLD, 5)
    # upstream stages committed before the crash are reused by resume
    assert catalog.has_epoch(BRONZE, 5)

    result = run_pipeline(spark, catalog, epoch=5, run_name="resumed", resume=True)
    assert result.counts[KEPT] > 0
    assert catalog.has_epoch(GOLD, 5)

    def table_sig(cat, epoch):
        df = cat.read_snapshot(spark, GOLD, epoch)
        cols = [F.col(c) for c in df.columns]
        return df.agg(
            F.count("*").alias("n"), F.bit_xor(F.xxhash64(*cols)).alias("h")
        ).collect()[0]

    ref_catalog, _ = completed
    assert table_sig(catalog, 5) == table_sig(ref_catalog, 1)


def test_retention_expires_old_epochs_after_gated_run(spark, tmp_path, pages):
    """retain_epochs: after a fully-gated run, staged tables keep only
    the newest N epochs; the append-only metrics/lineage audit trail is
    never expired; the retained epoch stays fully readable."""
    catalog = Catalog(str(tmp_path / "lake"))
    cfg = PipelineConfig(retain_epochs=1, orphan_min_age_sec=0.0)
    run_pipeline(spark, catalog, epoch=1, source_df=pages, run_name="m1", config=cfg)
    r2 = run_pipeline(spark, catalog, epoch=2, source_df=pages, run_name="m2", config=cfg)

    for table in (BRONZE, SILVER, KEPT, GOLD):
        assert r2.maintenance[table]["expired_epochs"] == [1]
        assert catalog.latest_epoch(table) == 2
        assert not catalog.has_epoch(table, 1)
    assert catalog.read_latest(spark, GOLD).count() > 0
    # the audit trail survives retention: both runs' metrics are there
    metrics = catalog.read_latest(spark, "metrics")
    assert metrics.where(F.col("run_name") == "m1").count() > 0
    assert metrics.where(F.col("run_name") == "m2").count() > 0


def test_substring_trim_stage(spark, tmp_path, pages):
    """Opt-in ExactSubstr rewrite between dedup and gold: a 22-token
    boilerplate suffix planted on ~1/7 of the pages survives in at most
    ONE gold page (the corpus-canonical copy); every gold row's
    n_tokens equals the whitespace token count of its final text."""
    boiler = (
        "the quality of the data and the value of the text must be"
        " clear and complete for all users of the system today."
    )
    marked = pages.withColumn(
        "text",
        F.when(
            F.pmod(F.xxhash64("url"), F.lit(7)) == 0,
            F.concat(F.col("text"), F.lit(" " + boiler)),
        ).otherwise(F.col("text")),
    ).withColumn(  # keep the source-suite extraction invariant intact
        "html",
        F.encode(
            F.concat(F.lit(HTML_PRE), F.col("text"), F.lit(HTML_POST)),
            "UTF-8",
        ),
    )
    catalog = Catalog(str(tmp_path / "lake"))
    cfg = PipelineConfig(substring_trim=True)
    result = run_pipeline(
        spark, catalog, epoch=1, source_df=marked, config=cfg, run_name="rT"
    )
    assert all(v.success for v in result.validations.values()), result.summary()

    gold = catalog.read_latest(spark, GOLD).cache()
    marker = "must be clear and complete for all users"
    hits = gold.where(F.col("text").contains(marker)).count()
    marked_in_gold = gold.where(
        F.pmod(F.xxhash64("url"), F.lit(7)) == 0
    ).count()
    assert hits <= 1
    if marked_in_gold >= 1:
        assert hits == 1  # the canonical copy, and only it, keeps it
    # trim rewrites text whitespace-normalized and recounts n_tokens
    mismatch = gold.where(
        F.size(F.filter(F.split("text", r"\s+"), lambda w: w != F.lit("")))
        != F.col("n_tokens")
    ).count()
    assert mismatch == 0
    gold.unpersist()

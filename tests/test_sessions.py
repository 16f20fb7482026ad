"""Sessionization (operators/sessions.py): native session_window
semantics, gap boundaries, and streaming parity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from greatex_spark.operators.sessions import session_stats

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(seconds=s), float(v)) for u, s, v in rows],
        "user_id long, ts timestamp, value double",
    )


def test_gap_boundary_touching_merges_strictly_greater_splits(spark):
    # Spark merges touching windows: an event exactly gap (60s) after
    # the previous one still merges; 61s after does not
    df = _ev(spark, [(1, 0, 1), (1, 60, 2), (1, 121, 4), (1, 140, 8)])
    out = sorted(
        session_stats(df, gap="1 minutes", value_col="value").collect(),
        key=lambda r: r["session_start"],
    )
    assert len(out) == 2
    assert out[0]["n_events"] == 2 and out[0]["sum_value"] == 3.0
    assert out[0]["session_end"] == T0 + dt.timedelta(seconds=120)
    assert out[1]["n_events"] == 2 and out[1]["sum_value"] == 12.0
    assert out[1]["session_start"] == T0 + dt.timedelta(seconds=121)


def test_sessions_merge_within_gap_and_per_user(spark):
    df = _ev(spark, [(1, 0, 1), (1, 59, 1), (1, 118, 1), (2, 0, 5)])
    out = session_stats(df, gap="1 minutes", value_col="value")
    got = {(r["user_id"], r["n_events"]) for r in out.collect()}
    # user 1: each event within 59s of the previous → ONE session of 3
    assert got == {(1, 3), (2, 1)}


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """The same session_stats expression runs under readStream with a
    watermark: sessions the watermark has passed flush with exactly the
    batch answer (append mode holds back still-open sessions)."""
    early = _ev(spark, [(1, 0, 1), (1, 30, 2), (1, 200, 4), (2, 10, 8)])
    # a later sentinel event advances the watermark past the early
    # sessions' ends so append mode can emit them
    late = _ev(spark, [(99, 7200, 0)])
    src = str(tmp_path / "src")
    early.coalesce(1).write.parquet(f"{src}/f1")
    late.coalesce(1).write.parquet(f"{src}/f2")
    stream = (
        spark.readStream.schema(early.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
        .withWatermark("ts", "10 minutes")
    )
    out = []

    def capture(bdf, bid):
        out.extend(
            (r["user_id"], r["n_events"], r["sum_value"]) for r in bdf.collect()
        )

    (
        session_stats(stream, value_col="value")
        .writeStream.foreachBatch(capture)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    batch = {
        (r["user_id"], r["n_events"], r["sum_value"])
        for r in session_stats(early, value_col="value").collect()
    }
    # the sentinel's own session stays open (watermark never passes it)
    assert set(out) == batch


def test_with_session_id_matches_session_stats_boundaries(spark):
    from greatex_spark.operators.sessions import with_session_id

    df = _ev(spark, [(1, 0, 1), (1, 60, 2), (1, 121, 4), (1, 140, 8)]).withColumn(
        "event_id", F.monotonically_increasing_id()
    )
    got = {
        (r["ts"], r["session_id"])
        for r in with_session_id(df, gap_seconds=60).collect()
    }
    # exactly-gap merges (session 1), strictly-greater splits (session 2)
    expect = {
        (T0 + dt.timedelta(seconds=0), 1),
        (T0 + dt.timedelta(seconds=60), 1),
        (T0 + dt.timedelta(seconds=121), 2),
        (T0 + dt.timedelta(seconds=140), 2),
    }
    assert got == expect


def test_session_transitions_counts_within_session_only(spark):
    from greatex_spark.operators.sessions import session_transitions

    # user 1 session A: view->click->buy; long gap; session B: view->view
    # the A->B boundary (buy->view) must NOT count as a transition
    rows = [
        (1, 0, "view"), (1, 10, "click"), (1, 20, "buy"),
        (1, 9000, "view"), (1, 9010, "view"),
    ]
    df = spark.createDataFrame(
        [(u, i, T0 + dt.timedelta(seconds=s_), t) for i, (u, s_, t) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in session_transitions(df, gap_seconds=1800).collect()
    }
    assert got == {("view", "click"): 1, ("click", "buy"): 1, ("view", "view"): 1}

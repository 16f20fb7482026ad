"""Sessionization: gap-based session aggregates over an event stream.

Uses Spark's NATIVE ``F.session_window`` (the Catalyst session
aggregation operator) rather than a hand-rolled lag/cumsum — the same
expression works unchanged in Structured Streaming with a watermark,
where the state store merges open sessions across micro-batches.

Semantics (Spark's): consecutive events merge while their windows
``[t, t + gap)`` overlap OR TOUCH — an event exactly ``gap`` after the
previous one still merges; only a gap STRICTLY greater than ``gap``
starts a new session.  The session's ``end`` is the last event's
timestamp + gap.  (Pinned by test: the touching-boundary event merges.)

Scale: one shuffle on the user key; per-key session merging is a
sort-based aggregation with partial merging map-side.  Hot users (bots,
monitors) concentrate a key — AQE skew handling applies, and a
``user_id`` with millions of events is still processed by a single
streaming sort, not materialized as a window buffer.

Oracle: DuckDB reconstructs identical sessions with
lag + running-sum (``sessionize_duckdb_sql``); the value sum goes
through DECIMAL per the cross-engine determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregates: ``(user, session_start, session_end,
    n_events[, sum_value])``.  ``sum_value`` accumulates via
    DECIMAL(18,2) so the result is order-independent (and replayable in
    the DuckDB oracle)."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value")
        )
    return (
        df.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap).alias("__w"))
        .agg(*aggs)
        .select(
            user_col,
            F.col("__w.start").alias("session_start"),
            F.col("__w.end").alias("session_end"),
            *[c for c in ("n_events", "sum_value")][: 1 + (value_col is not None)],
        )
    )


def sessionize_duckdb_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    value_col: str | None = None,
) -> str:
    """Oracle for :func:`session_stats`: lag + running-sum session
    reconstruction (new session iff the gap from the previous event of
    the same user is STRICTLY greater than ``gap_seconds`` — Spark
    merges touching windows)."""
    val_sel = (
        f",\n       CAST(sum(CAST({value_col} AS DECIMAL(18,2))) AS DOUBLE) AS sum_value"
        if value_col is not None
        else ""
    )
    lag = f"lag({ts_col}) OVER (PARTITION BY {user_col} ORDER BY {ts_col})"
    return f"""
WITH __o AS (
  SELECT *, CASE WHEN {lag} IS NULL
                 OR epoch({ts_col}) - epoch({lag}) > {gap_seconds}
            THEN 1 ELSE 0 END AS __new
  FROM {table}),
__s AS (
  SELECT *, SUM(__new) OVER (PARTITION BY {user_col} ORDER BY {ts_col}
            ROWS UNBOUNDED PRECEDING) AS __sid
  FROM __o)
SELECT {user_col}, min({ts_col}) AS session_start,
       max({ts_col}) + INTERVAL {gap_seconds} SECOND AS session_end,
       CAST(count(*) AS BIGINT) AS n_events{val_sel}
FROM __s GROUP BY {user_col}, __sid
"""

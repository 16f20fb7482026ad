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


def with_session_id(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Per-EVENT session index (``session_id``, 1-based per user) via
    lag + running sum — the row-level complement of
    :func:`session_stats` (same strictly-greater gap rule, so the two
    agree on boundaries).  Use this when downstream logic needs the
    session key on every event (funnels, transitions, per-session
    joins); use the native ``session_stats`` for plain aggregates.

    Scale: one user-key shuffle; both window passes share the same
    partitioning and sort, so Catalyst runs them in a single Window
    stage.  ``tiebreak_col`` makes the order (hence ids) deterministic
    under equal timestamps."""
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    # timestamp + interval comparison works for TIMESTAMP and
    # TIMESTAMP_NTZ alike (a double cast does not exist for NTZ)
    gap = F.expr(f"INTERVAL {int(gap_seconds)} SECOND")
    new_s = F.when(
        prev.isNull() | (F.col(ts_col) > prev + gap), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Within-session event-type transition counts (the funnel kernel):
    ``(from_type, to_type, n)`` over consecutive events of the same
    session.  Same single Window stage as :func:`with_session_id` plus
    one count aggregation."""
    from pyspark.sql import Window

    s = with_session_id(df, user_col, ts_col, gap_seconds, tiebreak_col)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(user_col, "session_id").orderBy(*order)
    prev_type = F.lag(F.col(type_col)).over(w)
    return (
        s.select(prev_type.alias("from_type"), F.col(type_col).alias("to_type"))
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def session_transitions_duckdb_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap_seconds: int = 1800,
    tiebreak_col: str = "event_id",
) -> str:
    """Oracle for :func:`session_transitions` (same lag/cumsum rule,
    same tiebreak)."""
    order = f"{ts_col}, {tiebreak_col}"
    lag_ts = f"lag({ts_col}) OVER (PARTITION BY {user_col} ORDER BY {order})"
    return f"""
WITH __o AS (
  SELECT *, CASE WHEN {lag_ts} IS NULL
                 OR epoch({ts_col}) - epoch({lag_ts}) > {gap_seconds}
            THEN 1 ELSE 0 END AS __new
  FROM {table}),
__s AS (
  SELECT *, SUM(__new) OVER (PARTITION BY {user_col} ORDER BY {order}
            ROWS UNBOUNDED PRECEDING) AS __sid
  FROM __o),
__t AS (
  SELECT lag({type_col}) OVER (PARTITION BY {user_col}, __sid ORDER BY {order})
           AS from_type,
         {type_col} AS to_type
  FROM __s)
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
FROM __t WHERE from_type IS NOT NULL
GROUP BY from_type, to_type
"""

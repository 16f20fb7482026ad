"""As-of join: match each left row to the most recent right row at or
before it, per key — the time-series join Spark's DataFrame API lacks
(pandas ``merge_asof`` / kdb ``aj`` / Flink temporal-join semantics).

Reference scope: GreatEx validates batches against the *latest*
committed state of a table (`great_expectations/checkpoints/
retail_source_checkpoint.yml` ``data_connector_query: index: -1``);
the as-of join is that "latest at or before" rule expressed per-row
at corpus scale — e.g. attributing each purchase to the last click,
or stamping each document with the newest crawl snapshot preceding it.

HOW, Spark-first — the union-merge formulation, not a join node:
a real range/theta join here is a BroadcastNestedLoop (quadratic per
key) or an exploded window self-join.  Instead both inputs are tagged
and UNIONED, shuffled ONCE on the key, sorted by (ts, side, tiebreak),
and a single running ``last(right_payload, ignoreNulls)`` window
carries the newest right row forward into every left row that follows
it.  One exchange, one sort, zero join operators; cost is
O((|L|+|R|) log) per partition, independent of how many left rows each
right row serves.

Ordering contract (pinned by tests and the DuckDB oracle):
- right side sorts BEFORE left at equal timestamps, so a right row at
  exactly ``left_ts`` matches (inclusive at-or-before — DuckDB
  ``ASOF JOIN ... ON l.ts >= r.ts`` semantics);
- among right rows sharing (key, ts), the one with the LARGEST
  ``tiebreak`` value wins (the window orders tiebreak ascending and
  ``last`` takes the final one; the oracle dedupes right to
  max-tiebreak per (key, ts) before its ASOF JOIN).

Scale: one hash shuffle of |L|+|R| rows on the key; the carried
payload is a struct of only the requested right columns, so wide right
rows never ride the exchange.  A hot key concentrates on one task —
the sort is streaming (ExternalSorter spills), and the carry-forward
is O(1) per row, so a million-event key is CPU-bound, not
memory-bound.  Salting is NOT applicable (the carry is
order-dependent across the whole key); cap pathological keys upstream
if needed.

Oracle: DuckDB's native ``ASOF LEFT JOIN`` over a max-tiebreak-deduped
right side (:func:`asof_join_duckdb_sql`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = ("event_id",),
    tiebreak: str = "event_id",
    prefix: str = "matched_",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``prefix``-renamed
    ``right_payload`` columns (and ``prefix + right_ts``) from the
    newest ``right`` row of the same ``on`` key with
    ``right.right_ts <= left.left_ts`` — NULLs when no prior right row
    exists (or the match is older than ``tolerance_seconds``)."""
    payload = [c for c in right_payload if c != right_ts]
    rstruct = F.struct(
        F.col(right_ts).alias("__mt"), *[F.col(c).alias(c) for c in payload]
    )
    mtype = right.select(rstruct.alias("__m")).schema["__m"].dataType
    tb_type = right.schema[tiebreak].dataType

    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.col(tiebreak).alias("__tb"),
        F.lit(0).alias("__side"),
        rstruct.alias("__m"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__l"),
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(mtype).alias("__m"),
        F.struct(*left.columns).alias("__l"),
    )

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__m", ignorenulls=True).over(w)
    if tolerance_seconds is not None:
        # NTZ→TIMESTAMP cast is identity for TIMESTAMP and reads NTZ as
        # UTC (session tz pinned) — unix_micros rejects NTZ directly
        tol_us = tolerance_seconds * 1_000_000
        age = F.unix_micros(F.col("__t").cast("timestamp")) - F.unix_micros(
            carried["__mt"].cast("timestamp")
        )
        carried = F.when(age <= tol_us, carried)

    out = (
        l.unionByName(r)
        .withColumn("__c", carried)
        .where(F.col("__side") == 1)
    )
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        F.col("__c.__mt").alias(prefix + right_ts),
        *[F.col(f"__c.{c}").alias(prefix + c) for c in payload],
    )


def asof_join_duckdb_sql(
    left_expr: str,
    right_expr: str,
    on: str,
    left_cols: tuple[str, ...],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = ("event_id",),
    tiebreak: str = "event_id",
    prefix: str = "matched_",
    tolerance_seconds: int | None = None,
) -> str:
    """Oracle twin of :func:`asof_join`: native ``ASOF LEFT JOIN``
    over a right side deduped to the max-``tiebreak`` row per
    (key, ts) — the same tie rule the window's ordered ``last``
    applies."""
    payload = [c for c in right_payload if c != right_ts]
    guard = ""
    if tolerance_seconds is not None:
        guard = (
            f"CASE WHEN epoch_us(__lhs.{left_ts}) - epoch_us(__r.__t)"
            f" <= {tolerance_seconds * 1_000_000} THEN {{v}} END"
        )
    def emit(v: str) -> str:
        return guard.format(v=v) if guard else v

    sels = [f"__lhs.{c} AS {c}" for c in left_cols]
    sels.append(f"{emit('__r.__t')} AS {prefix}{right_ts}")
    sels += [f"{emit('__r.' + c)} AS {prefix}{c}" for c in payload]
    pay_sel = "".join(f", {c}" for c in payload)
    return f"""
WITH __r AS (
  SELECT {on} AS __k, {right_ts} AS __t{pay_sel}
  FROM {right_expr}
  QUALIFY row_number() OVER (PARTITION BY {on}, {right_ts}
                             ORDER BY {tiebreak} DESC) = 1
)
SELECT {", ".join(sels)}
FROM {left_expr} __lhs
ASOF LEFT JOIN __r ON __lhs.{on} = __r.__k AND __lhs.{left_ts} >= __r.__t
"""

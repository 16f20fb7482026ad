"""Sequence packing: lay filtered documents into fixed-capacity
training sequences (concatenate-and-chunk, GPT-style pretraining prep).

After filtering/dedup, a training pipeline concatenates documents and
slices the stream into ``max_tokens``-sized sequences.  This operator
assigns every document its position in that layout — ``(seq_id,
seq_offset)`` — so the downstream tokenizer/chunker can materialize
sequences without a global sort.

Layout rule (deterministic, partitioning-independent):

- documents are hash-assigned to ``num_streams`` independent
  concatenation streams (``md5_long(id:salt) mod num_streams`` — the
  same replayable key family as sampling/dedup);
- within a stream, documents concatenate in ``id`` order; a document's
  ``stream_pos`` is the exclusive prefix sum of token counts;
- ``seq_id = stream * 2^44 + stream_pos // max_tokens`` and
  ``seq_offset = stream_pos mod max_tokens``.  A document may straddle
  a sequence boundary — exactly like the concatenate-then-chunk
  convention, where the chunker splits it across the two sequences.

Scale: the only shuffle is the window partition by stream — streams
are uniform by construction (hash of id), so width is controlled by
``num_streams`` (set it ≥ cluster cores; each stream's prefix sum is
one ordered partition scan).  A greedy never-split bin packer would
need a sequential fill per stream too, but its bin state doesn't
reduce to a prefix sum — this rule keeps the whole layout in one
window aggregate, and wastes no token slots at all (straddling instead
of padding).

No counterpart in the reference (GreatEx stops at validation); part of
the beyond-reference training-data brief.  Oracle: same window sum in
DuckDB (``pack_sequences_duckdb_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from greatex_spark.operators.dedup import md5_long, md5_long_sql

# 2^44 local sequences per stream before ids could collide: at
# max_tokens=2048 that is ~3.6e16 tokens per stream, far past the
# 10^12-document design point (2^32 would overflow at ~10^13 tokens
# per stream); stream count is bounded well under 2^19 so
# stream * STRIDE stays inside int64
_SEQ_STRIDE = 1 << 44


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    id_col: str = "doc_id",
    max_tokens: int = 2048,
    num_streams: int = 64,
    salt: int = 13,
) -> DataFrame:
    """Add ``stream``, ``seq_id``, ``seq_offset`` to every row (see
    module docstring for the layout rule).  ``seq_id`` is globally
    unique across streams via a 2^44 stride."""
    stream = F.pmod(
        md5_long(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))),
        F.lit(num_streams),
    ).alias("stream")
    w = (
        Window.partitionBy("stream")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pos = F.coalesce(F.sum(token_count_col).over(w), F.lit(0))
    return (
        df.select("*", stream)
        .select(
            "*",
            (F.col("stream") * F.lit(_SEQ_STRIDE) + F.floor(pos / max_tokens))
            .alias("seq_id"),
            F.pmod(pos, F.lit(max_tokens)).alias("seq_offset"),
        )
    )


def pack_sequences_duckdb_sql(
    select_cols: str,
    table: str,
    token_count_col: str,
    id_col: str = "doc_id",
    max_tokens: int = 2048,
    num_streams: int = 64,
    salt: int = 13,
) -> str:
    """Oracle for :func:`pack_sequences` — same md5 stream key, same
    exclusive-prefix window sum."""
    key = md5_long_sql(f"({id_col}::VARCHAR || ':{salt}')")
    return f"""
SELECT {select_cols},
  stream * {_SEQ_STRIDE} + (pos // {max_tokens}) AS seq_id,
  pos % {max_tokens} AS seq_offset
FROM (
  SELECT t.*, ({key} % {num_streams}) AS stream,
    COALESCE(CAST(sum({token_count_col}) OVER (
      PARTITION BY ({key} % {num_streams}) ORDER BY {id_col}
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS pos
  FROM {table} t) t
"""

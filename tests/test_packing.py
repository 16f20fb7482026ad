"""Sequence packing (operators/packing.py): concatenate-and-chunk
layout invariants."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from greatex_spark.operators.packing import pack_sequences


def test_single_stream_layout_is_exact_prefix_sum(spark):
    rows = [(i, 100) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "n_tokens", max_tokens=250, num_streams=1)
    got = {r["doc_id"]: (r["seq_id"], r["seq_offset"]) for r in out.collect()}
    # doc k starts at 100k: seq = 100k // 250, offset = 100k % 250
    for k in range(10):
        assert got[k] == ((100 * k) // 250, (100 * k) % 250), k
    assert out.where("stream != 0").count() == 0


def test_streams_are_independent_and_stride_separates_seq_ids(spark):
    rows = [(i, 1000) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "n_tokens", max_tokens=2048, num_streams=4)
    # every stream starts its own packing at offset 0 for its lowest id
    firsts = (
        out.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("stream").orderBy("doc_id")),
        )
        .where("rn = 1")
    )
    assert firsts.where("seq_offset != 0").count() == 0
    # seq_ids of different streams never collide (2^44 stride)
    pairs = out.select("stream", "seq_id").distinct()
    per_seq = pairs.groupBy("seq_id").count().where("count > 1").count()
    assert per_seq == 0


def test_layout_is_partitioning_independent(spark):
    rows = [(i, 17 * (i % 5) + 3) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = pack_sequences(df.repartition(13), "n_tokens", max_tokens=64, num_streams=8)
    b = pack_sequences(df.coalesce(1), "n_tokens", max_tokens=64, num_streams=8)
    assert a.select("doc_id", "seq_id", "seq_offset").subtract(
        b.select("doc_id", "seq_id", "seq_offset")
    ).count() == 0


def test_no_token_slot_wasted_within_stream(spark):
    """Concatenate-and-chunk never pads: within a stream, consecutive
    docs' offsets advance exactly by token count (mod max_tokens)."""
    rows = [(i, 50 + i) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "n_tokens", max_tokens=128, num_streams=2)
    rows_ = sorted(
        out.select("stream", "doc_id", "n_tokens", "seq_id", "seq_offset").collect(),
        key=lambda r: (r["stream"], r["doc_id"]),
    )
    for prev, cur in zip(rows_, rows_[1:]):
        if prev["stream"] != cur["stream"]:
            continue
        prev_abs = (prev["seq_id"] % (1 << 44)) * 128 + prev["seq_offset"]
        cur_abs = (cur["seq_id"] % (1 << 44)) * 128 + cur["seq_offset"]
        assert cur_abs == prev_abs + prev["n_tokens"]

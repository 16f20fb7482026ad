"""Source/sink layer: lossless format hops + batch identity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from greatex_spark.pages import generate_pages
from greatex_spark.sources import (
    PAGE_SCHEMA,
    latest_batch,
    list_batches,
    read_pages,
    sample_batch,
    write_pages,
)


def _digest(df):
    """Order-insensitive content digest over all page columns."""
    row = (
        df.select(
            F.sum(
                F.xxhash64(
                    "url",
                    F.col("warc_ts").cast("string"),
                    F.coalesce(F.base64("html"), F.lit("")),
                    F.coalesce("text", F.lit("")),
                    F.coalesce("lang", F.lit("")),
                ).cast("decimal(38,0)")
            ).alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    return (row["d"], row["n"])


def test_roundtrip_all_formats(spark, tmp_path):
    pages = generate_pages(spark, 200, seed=7)
    base = str(tmp_path / "pq")
    write_pages(pages, base, "parquet")
    ref = read_pages(spark, base, "parquet")
    want = _digest(ref)
    assert want[1] == 200
    for fmt in ("csv", "jsonl"):
        p = str(tmp_path / fmt)
        write_pages(ref, p, fmt)
        back = read_pages(spark, p, fmt)
        assert [(f.name, f.dataType) for f in back.schema.fields] == [
            (f.name, f.dataType) for f in PAGE_SCHEMA.fields
        ]
        assert _digest(back) == want, f"{fmt} hop not lossless"


def test_schema_enforced_not_inferred(spark, tmp_path):
    pages = generate_pages(spark, 10, seed=7)
    p = str(tmp_path / "pq")
    write_pages(pages, p, "parquet")
    df = read_pages(spark, p, "parquet")
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "timestamp", "binary", "string", "string",
    ]


def test_batch_identity_and_latest(tmp_path):
    for name in (
        "pages-2024-01-01.csv",
        "pages-2024-02-15.csv",
        "pages-2024-02-03.csv",
        "other-2024-03-01.csv",
        "not_a_batch.csv",
    ):
        (tmp_path / name).write_text("x")
    batches = list_batches(str(tmp_path), asset="pages")
    assert [b.date for b in batches] == ["2024-01-01", "2024-02-03", "2024-02-15"]
    assert latest_batch(str(tmp_path), "pages").date == "2024-02-15"
    assert latest_batch(str(tmp_path), "pages", index=0).date == "2024-01-01"
    all_assets = list_batches(str(tmp_path))
    assert {b.asset for b in all_assets} == {"pages", "other"}


def test_sample_batch(spark):
    df = spark.range(5000).withColumnRenamed("id", "x")
    assert sample_batch(df, 100).count() == 100

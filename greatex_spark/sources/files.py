"""File sources/sinks for the page table, with batch identity.

Capabilities mirrored from the reference (not its mechanism):

- **Explicit schema at every hop** — the reference re-declares its DDL
  at each store (``/root/reference/database-setup/sourcedb.sql:6-15``);
  here every reader passes the page StructType to ``spark.read`` so a
  drifted file fails loudly instead of silently re-typing (the engine
  deliberately does NOT reproduce pandas' int64→float64 drift,
  SURVEY.md §1.3).
- **Lossless CSV/JSONL hops** — binary ``html`` is base64-wrapped on
  write and unwrapped on read, so a parquet→csv→parquet round trip is
  byte-identical (the reference's parquet→CSV hop exists only because
  Postgres COPY can't read parquet, ``README.md:379-383``; ours exists
  for interop and must not corrupt).
- **Filename-regex batch identity** — the reference infers batch
  membership from ``(.*)(-\\d{4})-(\\d{2})-(\\d{2})\\.csv``
  (``great_expectations.yml:46-52``); :func:`list_batches` parses the
  same shape and :func:`latest_batch` is the ``index: -1`` selector.
  This is driver-side *metadata* work (a directory listing), never a
  data scan.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# the text-format twin: html travels as base64 text
_PAGE_SCHEMA_TEXTFMT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html_b64", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_CSV_OPTS = {
    "header": "true",
    "escape": '"',
    "multiLine": "true",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    # the CSV *writer* trims trailing whitespace by default, which would
    # silently corrupt text fields — byte identity is the contract
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}

BATCH_PATTERN = re.compile(r"(?P<asset>.+)-(?P<year>\d{4})-(?P<month>\d{2})-(?P<day>\d{2})")


@dataclass(frozen=True)
class PageBatch:
    """One dated batch of one data asset (C3/C4 batch identity)."""

    path: str
    asset: str
    date: str  # YYYY-MM-DD

    @property
    def sort_key(self) -> tuple[str, str]:
        return (self.date, self.path)


def _to_textfmt(df: DataFrame) -> DataFrame:
    return df.select(
        "url", "warc_ts", F.base64("html").alias("html_b64"), "text", "lang"
    )


def _from_textfmt(df: DataFrame) -> DataFrame:
    return df.select(
        "url", "warc_ts", F.unbase64("html_b64").alias("html"), "text", "lang"
    )


def write_pages(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write a page-table DataFrame as parquet / csv / jsonl."""
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif fmt == "csv":
        _to_textfmt(df).write.mode("overwrite").options(**_CSV_OPTS).csv(path)
    elif fmt == "jsonl":
        _to_textfmt(df).write.mode("overwrite").option(
            "timestampFormat", _CSV_OPTS["timestampFormat"]
        ).json(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a page-table file with the schema ENFORCED (no inference)."""
    if fmt == "parquet":
        return spark.read.schema(PAGE_SCHEMA).parquet(path)
    if fmt == "csv":
        raw = spark.read.schema(_PAGE_SCHEMA_TEXTFMT).options(**_CSV_OPTS).csv(path)
        return _from_textfmt(raw)
    if fmt == "jsonl":
        raw = (
            spark.read.schema(_PAGE_SCHEMA_TEXTFMT)
            .option("timestampFormat", _CSV_OPTS["timestampFormat"])
            .json(path)
        )
        return _from_textfmt(raw)
    raise ValueError(f"unknown format {fmt!r}")


def list_batches(root: str, asset: str | None = None) -> list[PageBatch]:
    """Parse batch identity out of dated directory/file names under
    ``root`` (driver-side metadata only)."""
    out = []
    for name in sorted(os.listdir(root)):
        stem = name
        for suffix in (".csv", ".parquet", ".jsonl", ".json"):
            if stem.endswith(suffix):
                stem = stem[: -len(suffix)]
                break
        m = BATCH_PATTERN.fullmatch(stem)
        if not m:
            continue
        if asset is not None and m.group("asset") != asset:
            continue
        out.append(
            PageBatch(
                path=os.path.join(root, name),
                asset=m.group("asset"),
                date=f"{m.group('year')}-{m.group('month')}-{m.group('day')}",
            )
        )
    return sorted(out, key=lambda b: b.sort_key)


def latest_batch(root: str, asset: str | None = None, index: int = -1) -> PageBatch:
    """The reference's ``data_connector_query: {index: -1}`` — pick the
    index-th batch in date order (C5)."""
    batches = list_batches(root, asset)
    if not batches:
        raise FileNotFoundError(f"no batches for asset={asset!r} under {root}")
    return batches[index]


def sample_batch(df: DataFrame, n: int = 1000) -> DataFrame:
    """Profiling sample (C2 — the reference's ``LIMIT 1000`` runtime
    batch, ``retail_source.py:35-43``); authoring only, never a gate."""
    return df.limit(n)


def datasource_smoke(
    spark: SparkSession, path: str, fmt: str = "parquet", n: int = 5
) -> int:
    """Datasource connection smoke test (D7 — the reference's
    ``test_yaml_config`` + head-rows probe, ``retail_source.py:72-97``):
    read at most ``n`` rows and return how many came back; raises if the
    source is unreachable or unreadable.  LIMIT is pushed to the scan —
    this never scans the table."""
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", True)
    return len(reader.format(fmt).load(path).limit(n).collect())

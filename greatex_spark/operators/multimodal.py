"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns travelling next to typed
metadata structs — the Spark-side schema, partitioning, UDF signature
and Arrow batch shape are real and tested; only the codec step is
stubbed (PIL/ffmpeg/torchaudio are not in this container).  Set
``GREATEX_FAKE_DECODE=1`` (default in tests) to use the deterministic
fake decoder; otherwise the decode stage raises ``NotImplementedError``
with a clear message, exactly at the point where a real deployment
would link the codec library.

All stages are ``mapInPandas`` over Arrow batches: one
JVM↔Python crossing per batch, media bytes never pass through
row-at-a-time pickling.  Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — for multi-MB media
cells, size it so a batch stays within executor memory (e.g. 64 rows
of ~4 MB images ≈ 256 MB per batch per core).
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def _fake_decode_features(payload: bytes | None, kind: str) -> list[float] | None:
    """Deterministic stand-in for decode + feature-extract: features are
    a folded digest of the payload bytes, so tests can assert exact
    values and partition-independence."""
    if payload is None:
        return None
    digest = hashlib.sha256(bytes(payload) + kind.encode()).digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float64)
    return list(np.round(arr / 65535.0, 6))


def _decode_enabled() -> bool:
    return os.environ.get("GREATEX_FAKE_DECODE", "1") == "1"


def extract_features(df: DataFrame) -> DataFrame:
    """media rows → (media_id, kind, features array<double>).

    Real deployment: replace ``_fake_decode_features`` with the codec
    call (PIL.Image.open / soundfile.read / pyav frame iter) — the
    Spark plumbing around it does not change."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not _decode_enabled():
            raise NotImplementedError(
                "media decode requires a codec library (PIL/ffmpeg); "
                "set GREATEX_FAKE_DECODE=1 for the deterministic stub"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [
                        _fake_decode_features(p, k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return df.mapInPandas(op, schema=out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage (stubbed codec): payload bytes are passed
    through the fake 'resizer' (sha256-fold to the target byte budget)
    and metadata is updated to the new dimensions — schema/meta
    behavior is the contract under test."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not _decode_enabled():
            raise NotImplementedError("image resize requires PIL; see extract_features")
        for pdf in batches:
            meta = pd.DataFrame(
                {
                    "mime": [m["mime"] if m is not None else None for m in pdf["meta"]],
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "duration_ms": [
                        m["duration_ms"] if m is not None else None for m in pdf["meta"]
                    ],
                }
            )
            payload = [
                None
                if p is None
                else hashlib.sha256(bytes(p) + f"{width}x{height}".encode()).digest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payload,
                    "meta": meta.to_dict("records"),
                }
            )

    return df.mapInPandas(op, schema=MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling (stubbed codec): emits one row per sampled
    frame with a deterministic fake frame payload — exercises the
    1-row-in/N-rows-out mapInPandas shape real frame extraction uses."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not _decode_enabled():
            raise NotImplementedError("frame sampling requires ffmpeg; see extract_features")
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video" or r.payload is None or r.meta is None:
                    continue
                dur = int(r.meta["duration_ms"] or 0)
                for i, ts in enumerate(range(0, dur, every_ms)):
                    frame = hashlib.sha256(
                        bytes(r.payload) + ts.to_bytes(8, "little")
                    ).digest()
                    rows.append((int(r.media_id), i, ts, frame))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame"]
            ).astype({"frame_idx": "int32", "ts_ms": "int32"})

    return df.mapInPandas(op, schema=out_schema)


def media_from_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Wrap a text table as media rows (payload = utf-8 bytes, typed
    metadata) — pure Column expressions, fully distributed; the ingest
    shape a binary-asset pipeline uses when payloads arrive inline."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    kind = F.element_at(kinds, (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"))
    mimes = F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4"))
    mime = F.element_at(mimes, (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"))
    is_audio = kind == "audio"
    is_image = kind == "image"
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.to_binary(F.col(text_col), F.lit("utf-8")).alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.when(~is_audio, F.lit(640)).alias("width"),
            F.when(~is_audio, F.lit(480)).alias("height"),
            F.when(~is_image, F.lit(3500)).alias("duration_ms"),
        ).alias("meta"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic in-repo media fixture: payload = sha256 stream of
    the id; kinds cycle image/audio/video."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        meta = {
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            "width": 640 if kind != "audio" else None,
            "height": 480 if kind != "audio" else None,
            "duration_ms": 3500 if kind != "image" else None,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

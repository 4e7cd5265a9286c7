"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed in Arrow-batched pandas over ``mapInPandas``.

The decode step itself (PIL/libsndfile/ffmpeg) is NOT available in this
container, so it is stubbed behind ``NotImplementedError`` /
a deterministic fake — but the Spark-side plumbing is real and tested:
schema contract, partition-preserving mapInPandas, Arrow batch iteration,
and binary-column handling all match what a real decoder UDF needs.

Scale notes: binary payloads ride in parquet as-is; mapInPandas streams
Arrow batches (bounded memory per task, set
``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap batch bytes for
multi-MB blobs); decode is embarrassingly parallel — no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("declared_format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, width int, height int, "
    "first_byte int, checksum_mod int"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat documents.text bytes as a fake media payload so the
    binary plumbing is exercised against real parquet data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("fake/image").alias("media_type"),
        F.struct(
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.lit("raw").alias("declared_format"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Real decoder stub — requires PIL, not in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire the real decoder here on a "
        "cluster image that ships it"
    )


def _fake_decode_features(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake 'decode': derive pseudo width/height/pixel stats
    from the payload bytes. Stands in for the real decoder while keeping the
    whole pipeline testable + oracle-checkable."""
    payload = pdf["payload"]
    n_bytes = payload.map(len).astype("int64")
    first_byte = payload.map(lambda b: b[0] if len(b) else -1).astype("int32")
    checksum = payload.map(lambda b: sum(b[:64]) % 251).astype("int32")
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "n_bytes": n_bytes,
            "width": (n_bytes % 640).astype("int32"),
            "height": (n_bytes % 480).astype("int32"),
            "first_byte": first_byte,
            "checksum_mod": checksum,
        }
    )


def extract_features(media: DataFrame, batch_size_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the canonical
    multimodal operator shape: Iterator[pd.DataFrame] → Iterator[pd.DataFrame],
    partition-preserving, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_features(pdf)

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through mapInPandas unchanged (real
    impl would decode→resize→re-encode per batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "payload"]].copy()
            out["target_w"] = width
            out["target_h"] = height
            yield out

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id long, payload binary, target_w int, target_h int"
    )

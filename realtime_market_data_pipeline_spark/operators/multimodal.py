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


def decode_audio(payload: bytes) -> object:
    """Real decoder stub — requires soundfile/librosa, not in this container."""
    raise NotImplementedError(
        "audio decode requires libsndfile/librosa; wire the real decoder "
        "here on a cluster image that ships it"
    )


def decode_video_frames(payload: bytes, every_n: int) -> object:
    """Real decoder stub — requires ffmpeg/pyav, not in this container."""
    raise NotImplementedError(
        "video decode requires ffmpeg/pyav; wire the real decoder here on a "
        "cluster image that ships it"
    )


def frame_sample_stub(media: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled 'frame'
    (every ``every_n_bytes``-th payload byte stands in for a decoded frame).
    The real operator decodes with ffmpeg per batch and yields
    (media_id, frame_idx, frame_payload) — same fan-out shape: mapInPandas
    expanding rows, no shuffle, output rows ≫ input rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, vals = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    ids.append(mid)
                    idxs.append(i)
                    vals.append(int(payload[off]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_byte": vals}
            )

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id long, frame_idx int, frame_byte int"
    )


def audio_features_stub(media: DataFrame, frame_len: int = 32) -> DataFrame:
    """Audio feature plumbing: fixed-length framing + per-frame energy proxy
    over raw payload bytes (real impl: decode → frame → RMS/MFCC per frame).
    Demonstrates the frame-window fan-out with deterministic fake values."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i in range(0, max(len(payload) // frame_len, 1)):
                    chunk = payload[i * frame_len : (i + 1) * frame_len]
                    ids.append(mid)
                    idxs.append(i)
                    energies.append(
                        float(sum(b * b for b in chunk)) / max(len(chunk), 1)
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "energy": energies}
            )

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id long, frame_idx int, energy double"
    )


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

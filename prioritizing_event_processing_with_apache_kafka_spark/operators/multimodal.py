"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so the heavy per-item work is vectorized per partition
and never bottlenecks the driver.

The actual media decode is STUBBED in this environment (no image/audio
libraries in the container): ``decode_stub`` raises
``NotImplementedError`` by design, and ``extract_features`` computes a
deterministic byte-level feature set instead, so all the Spark-side
plumbing — binary schema, Arrow batch shapes, partition-parallel UDF
execution, metadata passthrough — is real and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "as_blob_table",
    "decode_stub",
    "extract_features",
    "resize_payloads",
    "sample_frames",
    "FEATURE_SCHEMA",
    "RESIZE_SCHEMA",
    "FRAME_SCHEMA",
]

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("last_byte", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), False),
    ]
)


def as_blob_table(documents: DataFrame) -> DataFrame:
    """Model the documents table as a multimodal blob table:
    payload = UTF-8 bytes, plus a typed metadata struct (the shape an
    image/audio table would have: format + declared size)."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.col("n_chars").alias("declared_size"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, fmt: str) -> object:
    """Placeholder for the real media decoder (PIL/ffmpeg/soundfile).

    The container ships no media libraries; production deployments
    replace this with the real decoder. Kept as an explicit seam so the
    pipeline shape (binary in → decoded object → features) is honest.
    """
    raise NotImplementedError(
        f"media decode for format {fmt!r} requires an image/audio library "
        "not present in this environment; plug a real decoder in here"
    )


def extract_features(blobs: DataFrame, *, batch_hint: int | None = None) -> DataFrame:
    """Deterministic byte-level feature extraction via ``mapInPandas``.

    Features: payload length, first/last byte, and a rolling checksum
    ``(first*31 + n_bytes) mod 997`` — a stand-in for real embedding /
    EXIF / spectrogram extraction with the same execution shape
    (Arrow-batched, partition-parallel, binary input).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            first = payloads.map(lambda b: b[0] if len(b) else None)
            last = payloads.map(lambda b: b[-1] if len(b) else None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "first_byte": first.astype("Int32"),
                    "last_byte": last.astype("Int32"),
                    "checksum": (
                        first.fillna(0).astype("int64") * 31 + n_bytes.astype("int64")
                    )
                    % 997,
                }
            )

    return blobs.mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("orig_bytes", T.IntegerType(), False),
        T.StructField("resized_bytes", T.IntegerType(), False),
        T.StructField("resized_payload", T.BinaryType(), True),
    ]
)


def resize_payloads(blobs: DataFrame, *, step: int = 4) -> DataFrame:
    """Deterministic payload "resize" via ``mapInPandas``: keep every
    ``step``-th byte (the stand-in for an image resize — a real
    deployment swaps the kernel for PIL's ``Image.resize`` inside the
    same batch loop). Execution shape is the production one: binary in,
    smaller binary out, Arrow-batched, partition-parallel, no driver
    involvement."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            resized = payloads.map(lambda b: bytes(b[::step]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": payloads.map(len).astype("int32"),
                    "resized_bytes": resized.map(len).astype("int32"),
                    "resized_payload": resized,
                }
            )

    return blobs.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_first_byte", T.IntegerType(), True),
        T.StructField("frame_bytes", T.IntegerType(), False),
    ]
)


def sample_frames(
    blobs: DataFrame, *, frame_size: int = 16, every: int = 4
) -> DataFrame:
    """Frame sampling via ``mapInPandas``: the payload is modeled as a
    sequence of fixed-size frames (a video stand-in) and every
    ``every``-th frame is emitted as its own row — the exploding shape a
    real frame sampler has (one input row → many frame rows), with a
    deterministic per-frame feature instead of a decoded image. The
    final partial frame is kept, mirroring how a sampler must handle
    truncated tails."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_first, out_len = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                idx = 0
                for start in range(0, n, frame_size * every):
                    frame = payload[start : start + frame_size]
                    out_ids.append(doc_id)
                    out_idx.append(idx)
                    out_first.append(frame[0] if frame else None)
                    out_len.append(len(frame))
                    idx += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_first_byte": pd.Series(out_first, dtype="Int32"),
                    "frame_bytes": pd.Series(out_len, dtype="int32"),
                }
            )

    return blobs.mapInPandas(batches, FRAME_SCHEMA)

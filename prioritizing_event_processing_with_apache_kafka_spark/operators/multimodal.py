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

__all__ = ["as_blob_table", "decode_stub", "extract_features", "FEATURE_SCHEMA"]

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

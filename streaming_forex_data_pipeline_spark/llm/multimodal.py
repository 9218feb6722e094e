"""Multimodal columns: opaque binary payloads + typed metadata.

Mandated LLM-pipeline extension: image/audio/video content is carried
as an opaque ``binary`` column plus a typed metadata struct; decode /
feature-extraction runs as an Arrow-batched pandas kernel over
``mapInPandas`` (per-batch, no per-row Python), because byte-level
decoding is not expressible in Column algebra.

The container has no image/audio codecs, so the decode stage is a
DETERMINISTIC STUB: it parses real byte-level facts (length, header
bytes, validity) instead of pixels/samples.  The Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and
oracle-tested; swapping the stub body for PIL/ffmpeg is a one-function
change.

Payloads derive from the driver's documents table (UTF-8 bytes of
``text``) so the pipeline runs on the provided testdata without
synthesizing inputs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MODALITIES = ("image", "audio", "video")

#: decode output schema: doc_id + modality carried through, plus the
#: stub-extracted byte-level features.
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("header", StringType()),
        StructField("is_valid", BooleanType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

MIN_VALID_BYTES = 16


def attach_payload(docs: DataFrame) -> DataFrame:
    """Wrap documents as multimodal rows: opaque binary payload + typed
    metadata struct.  Modality is assigned deterministically
    (doc_id mod 3) so the same row maps to the same modality on any
    engine."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        F.col("source").alias("origin"),
        F.col("n_chars").cast("int").alias("declared_size"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
    )
    return docs.select(
        "doc_id",
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def decode_stub(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched decode over ``mapInPandas``.

    Stub semantics (deterministic, byte-level): n_bytes = payload
    length, header = first 4 bytes as lowercase hex, is_valid =
    n_bytes >= MIN_VALID_BYTES, width/height echoed from metadata (a
    real decoder would read them from the payload).  Batches stream
    through Arrow; no per-row Python calls besides the vectorized
    pandas ops.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.map(len).astype("int64")
            header = payload.map(lambda b: bytes(b[:4]).hex())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "modality": pdf["modality"],
                    "n_bytes": n_bytes,
                    "header": header,
                    "is_valid": n_bytes >= MIN_VALID_BYTES,
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                }
            )

    narrow = multimodal.select("doc_id", "modality", "payload", "meta")
    return narrow.mapInPandas(decode, DECODE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("orig_width", IntegerType()),
        StructField("orig_height", IntegerType()),
    ]
)


def resize_stub(
    multimodal: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Image-resize stage over ``mapInPandas`` (Arrow-batched).

    STUB: a real implementation decodes the payload with PIL and
    re-encodes at (target_w, target_h); no codec exists in this
    container, so the stub scales the PAYLOAD LENGTH by the pixel ratio
    (truncation — deterministic and schema-faithful) and rewrites the
    size metadata.  The plumbing a swap-in decoder needs — binary in,
    binary out, metadata rewrite, batch iteration — is all real.
    """

    def resize(batches) -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            w = pdf["meta"].map(lambda m: m["width"]).astype("int32")
            h = pdf["meta"].map(lambda m: m["height"]).astype("int32")
            ratio = (target_w * target_h) / (w * h).clip(lower=1)
            n = pdf["payload"].map(len)
            keep = (n * ratio).clip(upper=n).astype("int64").clip(lower=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "modality": pdf["modality"],
                    "payload": [
                        bytes(b[:k]) for b, k in zip(pdf["payload"], keep)
                    ],
                    "width": target_w,
                    "height": target_h,
                    "orig_width": w,
                    "orig_height": h,
                }
            )

    narrow = multimodal.filter(F.col("modality") == "image").select(
        "doc_id", "modality", "payload", "meta"
    )
    return narrow.mapInPandas(resize, RESIZE_SCHEMA)


FRAME_BYTES = 256

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", IntegerType()),
    ]
)


def frame_sample_stub(multimodal: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame-sampling stage over ``mapInPandas`` — a ROW-EXPANDING
    kernel (one input video -> many frame rows), the shape a real
    ffmpeg-backed sampler needs.

    STUB: a "frame" is a FRAME_BYTES-byte slice of the payload; every
    ``every_n``-th frame is emitted with its index and length.  Output
    row count per doc = ceil(ceil(n_bytes / FRAME_BYTES) / every_n),
    which is what the oracle checks.
    """

    def sample(batches) -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_len"].append(
                        min(FRAME_BYTES, n - i * FRAME_BYTES)
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_len": pd.Series(out["frame_len"], dtype="int32"),
                }
            )

    narrow = multimodal.filter(F.col("modality") == "video").select(
        "doc_id", "payload"
    )
    return narrow.mapInPandas(sample, FRAME_SCHEMA)

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

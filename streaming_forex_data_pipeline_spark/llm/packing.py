"""Sequence-packing operators for LLM pretraining pipelines.

After dedup/quality/mixing, a training-data pipeline has to turn
variable-length documents into fixed-token-budget training sequences.
Two standard strategies, both absent from the reference (its pipeline
stops at feature tables; reference scope: `pipeline.py` ends at
normalized ML features):

- **concat-and-chunk** (`pack_chunks`): concatenate the corpus in a
  canonical order and slice it into fixed-size chunks; documents may
  straddle chunk boundaries (the GPT-style pretraining packer).  Pure
  integer column algebra — the only nontrivial piece is a GLOBAL
  prefix sum of token counts, which is implemented as a two-level
  distributed prefix sum (see below) instead of a single-partition
  window, so the plan survives a 100 TB corpus.
- **greedy no-split packing** (`pack_greedy`): documents are never
  split; each is appended to the current sequence if it fits the token
  budget, else a new sequence starts (the SFT/instruction-tuning
  packer).  The running-fill-with-reset recurrence is not expressible
  as window algebra (the reset makes it non-associative), so it runs
  as a sanctioned per-bucket `applyInPandas` kernel — the same escape
  class as PSAR (SURVEY §2.13) — with buckets as the parallel axis.

Determinism: both packers are pure integer arithmetic over a canonical
(doc_id) order; outputs are exactly hash-checkable against DuckDB
(window cumsum oracle for `pack_chunks`, recursive-CTE fold for
`pack_greedy`).

Scale notes (100 TB documents table):
- `pack_chunks` prefix sum: stage 1 aggregates per-bucket token totals
  (map-side combined; ~N/bucket_width rows), stage 2 turns those into
  bucket offsets with a window over the TINY aggregated frame (its one
  task is bounded by #buckets, not rows), stage 3 adds the
  within-bucket cumsum partitioned by bucket.  Buckets are contiguous
  doc_id ranges, so bucket order == global order and the two-level sum
  equals the sequential cumsum exactly.  At 25 T tokens pick
  bucket_width ~1e6: the offset frame is ~25 M rows over #buckets
  tasks — if even that outgrows one window task, the same construction
  nests recursively (log-depth prefix sum).
- `pack_greedy` shuffles once on the bucket key; packing quality
  degrades gracefully with more buckets (each bucket wastes at most
  one partial sequence), so #buckets can scale with the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def _idiv(c: Column, k: int) -> Column:
    """Exact non-negative integer division (no double rounding even
    past 2^53): Spark's ``div`` operator divides longs in integer
    arithmetic end-to-end.  (The earlier ``(c - c % k) / k`` routed
    through double division, which itself rounds past 2^53.)"""
    return F.call_function("div", c.cast("long"), F.lit(k))


def doc_offsets(
    docs: DataFrame, text: str = "text", bucket_width: int = 64
) -> DataFrame:
    """Each document's [start, start+n_tokens) span in the token stream
    formed by concatenating all documents in doc_id order.

    Returns (doc_id, n_tokens, start) for documents with at least one
    token.  ``start`` comes from the two-level distributed prefix sum
    described in the module docstring — no window ever scans the full
    corpus in one task.
    """
    t = docs.select(
        "doc_id",
        token_count(text).cast("long").alias("n_tokens"),
        _idiv(F.col("doc_id"), bucket_width).alias("bucket"),
    ).filter(F.col("n_tokens") > 0)

    # stage 1+2: per-bucket totals, then exclusive cumsum over the tiny
    # aggregated frame (one row per bucket) = each bucket's global
    # token offset.  Integer sums are order-exact.
    w_b = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        t.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_tokens"))
        .select(
            "bucket",
            F.coalesce(F.sum("bucket_tokens").over(w_b), F.lit(0)).alias(
                "bucket_off"
            ),
        )
    )

    # stage 3: within-bucket exclusive cumsum, partitioned by bucket
    # (the parallel axis), plus the broadcast bucket offset.
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        t.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("bucket_off")
                + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
            ).alias("start"),
        )
    )


def pack_chunks(
    docs: DataFrame,
    chunk_tokens: int = 64,
    text: str = "text",
    bucket_width: int = 64,
) -> DataFrame:
    """Concat-and-chunk packing: slice the doc_id-ordered token stream
    into fixed ``chunk_tokens`` windows and emit one row per
    (document, chunk) overlap.

    Returns (doc_id, chunk_id, n_tokens) where ``n_tokens`` is how many
    of the document's tokens land in that chunk; a document spanning a
    boundary contributes rows to every chunk it touches (the GPT-style
    packer keeps those tokens and lets attention masking handle the
    seam).  Σ n_tokens per chunk == chunk_tokens except the final
    chunk; Σ n_tokens per doc == the doc's token count — both asserted
    in tests/test_packing.py.

    Plan: doc_offsets' two shuffles + one Generate (the per-doc chunk
    explosion, at most ⌈len/chunk⌉+1 rows per doc).  All integer
    arithmetic — exactly portable.
    """
    spans = doc_offsets(docs, text=text, bucket_width=bucket_width)
    end = F.col("start") + F.col("n_tokens")  # exclusive
    chunks = F.sequence(
        _idiv(F.col("start"), chunk_tokens),
        _idiv(end - 1, chunk_tokens),
    )
    return (
        spans.select(
            "doc_id",
            "start",
            "n_tokens",
            F.explode(chunks).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            (
                F.least(
                    F.col("start") + F.col("n_tokens"),
                    (F.col("chunk_id") + 1) * chunk_tokens,
                )
                - F.greatest(F.col("start"), F.col("chunk_id") * chunk_tokens)
            ).alias("n_tokens"),
        )
    )


def pack_greedy(
    docs: DataFrame,
    budget: int = 128,
    n_buckets: int = 8,
    text: str = "text",
) -> DataFrame:
    """Greedy no-split packing: within each bucket (doc_id % n_buckets),
    walk documents in doc_id order appending each to the current
    sequence while the token budget holds, else open a new sequence.

    Returns (bucket, doc_id, n_tokens, seq_id, seq_fill) — ``seq_id``
    is the sequence index within the bucket, ``seq_fill`` the running
    fill after placing the document.  An over-budget document gets a
    sequence to itself (real packers truncate it downstream).

    The fill-with-reset recurrence is non-associative (a reset erases
    history), so no window/aggregate expresses it; the per-bucket
    kernel is the sanctioned `applyInPandas` escape class (SURVEY
    §2.13, like PSAR).  Oracle: a recursive CTE folding the identical
    recurrence per bucket — all-integer state, exactly portable.
    """
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % n_buckets).alias("bucket"),
        token_count(text).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    schema = (
        "bucket bigint, doc_id bigint, n_tokens bigint, "
        "seq_id bigint, seq_fill bigint"
    )

    def kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id", ignore_index=True)
        toks = pdf["n_tokens"].to_numpy()
        seq_ids = [0] * len(toks)
        fills = [0] * len(toks)
        seq, fill = 0, 0
        for i, tok in enumerate(toks):
            if i > 0 and fill + tok > budget:
                seq, fill = seq + 1, 0
            fill += int(tok)
            seq_ids[i], fills[i] = seq, fill
        return pd.DataFrame(
            {
                "bucket": pdf["bucket"],
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "seq_id": seq_ids,
                "seq_fill": fills,
            }
        )

    return t.groupBy("bucket").applyInPandas(kernel, schema)


def chunk_sliding(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 32,
    text: str = "text",
) -> DataFrame:
    """RAG/context-window chunking: overlapping token windows per
    document — start positions 0, stride, 2*stride, ... while
    start < n_tokens; the final window may be short.  Complements
    `chunk_packed` (pretraining concat-and-chunk): this one never
    crosses document boundaries and preserves overlap for retrieval
    context.

    Pure per-document column algebra (sequence -> explode -> slice):
    one Generate, no shuffle, no state — embarrassingly parallel at
    any corpus size.  Output: (doc_id, chunk_idx, start_tok, n_toks,
    chunk)."""
    from .corpus import words_array

    ws = words_array(text)
    n = F.size(ws)
    n_chunks = F.call_function("div", (n - 1).cast("long"), F.lit(stride)) + 1
    starts = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: i * stride,
    )
    ex = docs.select(
        "doc_id",
        ws.alias("__ws"),
        n.alias("__n"),
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    piece = F.slice(F.col("__ws"), F.col("start_tok") + 1, chunk_tokens)
    return ex.select(
        "doc_id",
        "chunk_idx",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_toks"),
        F.array_join(piece, " ").alias("chunk"),
    )

"""Invariant tests for the sequence-packing operators (llm/packing.py).

The oracle-parity sweep checks exact output equality; these assert the
packing SEMANTICS directly — conservation (no token lost or invented),
chunk capacity, and greedy budget discipline — so a change that is
consistently wrong on both engines still fails.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_forex_data_pipeline_spark.llm import packing as PK
from streaming_forex_data_pipeline_spark.llm.text import token_count
from streaming_forex_data_pipeline_spark.sources.tables import load_table

CHUNK = 64
BUDGET = 128


def test_pack_chunks_conserves_tokens_per_doc(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    want = (
        d.select("doc_id", token_count().cast("long").alias("n"))
        .filter(F.col("n") > 0)
    )
    got = (
        PK.pack_chunks(d, chunk_tokens=CHUNK)
        .groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("n"))
    )
    w = {r["doc_id"]: r["n"] for r in want.collect()}
    g = {r["doc_id"]: r["n"] for r in got.collect()}
    assert w == g


def test_pack_chunks_full_chunks_at_capacity(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    per_chunk = (
        PK.pack_chunks(d, chunk_tokens=CHUNK)
        .groupBy("chunk_id")
        .agg(F.sum("n_tokens").alias("n"))
        .collect()
    )
    last = max(r["chunk_id"] for r in per_chunk)
    for r in per_chunk:
        if r["chunk_id"] != last:
            assert r["n"] == CHUNK, f"chunk {r['chunk_id']} holds {r['n']}"
        else:
            assert 0 < r["n"] <= CHUNK
    # chunk ids are dense 0..last
    assert sorted(r["chunk_id"] for r in per_chunk) == list(range(last + 1))


def test_pack_chunks_offsets_match_sequential_cumsum(spark, sf_dir):
    """The two-level distributed prefix sum must equal the plain
    sequential cumsum (bucket order == global order)."""
    d = load_table(spark, sf_dir, "documents")
    rows = PK.doc_offsets(d).orderBy("doc_id").collect()
    running = 0
    for r in rows:
        assert r["start"] == running, (r["doc_id"], r["start"], running)
        running += r["n_tokens"]


def test_pack_greedy_budget_and_order(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    rows = PK.pack_greedy(d, budget=BUDGET, n_buckets=8).orderBy(
        "bucket", "doc_id"
    ).collect()
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, rs in by_bucket.items():
        seq, fill = 0, 0
        for r in rs:
            assert r["doc_id"] % 8 == bucket
            if fill > 0 and fill + r["n_tokens"] > BUDGET:
                seq, fill = seq + 1, 0
            fill += r["n_tokens"]
            assert r["seq_id"] == seq
            assert r["seq_fill"] == fill
            # fill only exceeds the budget for a singleton overflow doc
            if r["seq_fill"] > BUDGET:
                assert r["seq_fill"] == r["n_tokens"]


def test_pack_greedy_no_split(spark, sf_dir):
    """Every document lands in exactly one (bucket, seq) — the no-split
    contract — and every input doc with tokens appears exactly once."""
    d = load_table(spark, sf_dir, "documents")
    out = PK.pack_greedy(d, budget=BUDGET, n_buckets=8)
    n_docs_in = d.filter(token_count() > 0).count()
    assert out.count() == n_docs_in
    assert out.select("doc_id").distinct().count() == n_docs_in

"""Semantics tests for the quality gate and tokenizer-prep operators.

Oracle parity proves engine equality; these prove the operators are
MEANINGFUL on the corpus (the gate actually splits it) and internally
consistent (reasons agree with attributes, BPE counts agree with a
direct recount).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_forex_data_pipeline_spark.llm import corpus as CO
from streaming_forex_data_pipeline_spark.llm import vocab as VB
from streaming_forex_data_pipeline_spark.sources.tables import load_table


def test_quality_gate_splits_corpus_and_reasons_consistent(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    rows = CO.quality_gate(d).collect()
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows), "gate must actually split the corpus"
    for r in rows:
        want = []
        if r["n_words"] < 20:
            want.append("too_short")
        if r["n_words"] > 1000:
            want.append("too_long")
        if r["dup_word_frac"] > 0.6:
            want.append("dup_words")
        if r["top_word_frac"] > 0.15:
            want.append("top_word")
        if not (2.0 <= r["avg_word_len"] <= 10.0):
            want.append("word_len")
        assert r["reasons"] == ",".join(want)
        assert r["keep"] == (not want)


def test_bpe_pair_counts_match_direct_recount(spark, sf_dir):
    """The vocab-weighted pair count must equal counting pairs over the
    raw token stream (the naive O(corpus) definition)."""
    d = load_table(spark, sf_dir, "documents")
    got = {
        r["pair"]: r["n_occurrences"]
        for r in VB.bpe_pair_counts(d).collect()
    }
    words = (
        d.select(F.explode(CO.words_array()).alias("w"))
        .collect()
    )
    want: dict[str, int] = {}
    for row in words:
        w = row["w"]
        for i in range(len(w) - 1):
            want[w[i : i + 2]] = want.get(w[i : i + 2], 0) + 1
    assert got == want


def test_vocab_counts_totals(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    v = VB.vocab_counts(d)
    total = v.agg(F.sum("n_occurrences")).collect()[0][0]
    n_tokens = d.select(
        F.sum(F.size(CO.words_array()))
    ).collect()[0][0]
    assert total == n_tokens


def test_substring_removal_agrees_with_coverage_metric(spark, sf_dir):
    """The removal transform and the coverage metric must agree:
    kept tokens == n_tokens - covered_tokens for every document."""
    from streaming_forex_data_pipeline_spark.llm import dedup as DD

    d = load_table(spark, sf_dir, "documents")
    cov = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
        for r in DD.cross_doc_ngram_coverage(d, n=5, min_docs=2).collect()
    }
    rem = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"])
        for r in DD.remove_duplicated_spans(d, n=5, min_docs=2).collect()
    }
    assert cov.keys() == rem.keys()
    for doc_id, (nt, covered) in cov.items():
        nt2, kept = rem[doc_id]
        assert nt2 == nt
        assert kept == nt - covered, (doc_id, kept, nt, covered)


def test_bpe_train_matches_textbook_implementation(spark, sf_dir):
    """The 3-step merge table must equal a pure-Python textbook BPE
    run (Sennrich et al. 2016 alg. 1) over the same word counts."""
    d = load_table(spark, sf_dir, "documents")
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in VB.bpe_train(d, n_merges=3).orderBy("step").collect()
    ]
    counts: dict[tuple[str, ...], int] = {}
    for row in d.select(F.explode(CO.words_array()).alias("w")).collect():
        key = tuple(row["w"])
        counts[key] = counts.get(key, 0) + 1
    want = []
    for step in range(1, 4):
        pc: dict[tuple[str, str], int] = {}
        for syms, wc in counts.items():
            for i in range(len(syms) - 1):
                pc[syms[i], syms[i + 1]] = pc.get((syms[i], syms[i + 1]), 0) + wc
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((step, l, r, l + r, c))
        merged: dict[tuple[str, ...], int] = {}
        for syms, wc in counts.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            merged[key] = merged.get(key, 0) + wc
        counts = merged
    assert got == want


def test_bpe_segment_roundtrip_and_merge_consistency(spark, sf_dir):
    """Every segmentation must concatenate back to its word, and no
    learned merge pair may survive unmerged in any segmentation."""
    d = load_table(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in VB.bpe_train(d, n_merges=3).collect()
    ]
    rows = VB.bpe_segment(d, n_merges=3).collect()
    assert len(rows) > 0
    for r in rows:
        syms = r["segmented"].split(" ")
        assert "".join(syms) == r["word"]
        assert len(syms) == r["n_symbols"]
        for left, right in merges:
            for i in range(len(syms) - 1):
                assert not (syms[i] == left and syms[i + 1] == right), (
                    r["word"], left, right)


def test_bpe_merge_handles_overlapping_pair_chains(spark):
    """'aaaa'/'banana'-class words: consecutive occurrences of the
    winning pair must merge pairwise left-to-right (textbook greedy),
    not skip every second occurrence — the single-space-separator
    replace consumed the shared boundary space and got [aa, a, a]
    for 'aaaa'."""
    docs = spark.createDataFrame(
        [(i, "aaaa banana aaaa aaaa xy") for i in range(3)],
        "doc_id long, text string",
    )
    seg = {
        r["word"]: (r["segmented"], r["n_symbols"])
        for r in VB.bpe_segment(docs, n_merges=1).collect()
    }
    merges = VB.bpe_train(docs, n_merges=1).collect()
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "a")
    # 'aaaa' under merge (a,a): textbook greedy = [aa, aa]
    assert seg["aaaa"] == ("aa aa", 2)
    # 'banana': no adjacent 'a a'; unchanged
    assert seg["banana"] == ("b a n a n a", 6)
    assert seg["xy"] == ("x y", 2)


def test_substring_removal_blank_document_edge(spark):
    """A whitespace-only document must report n_tokens=0, n_kept=0 —
    words_array('') is [''] and the phantom token must not survive."""
    from streaming_forex_data_pipeline_spark.llm import dedup as DD

    docs = spark.createDataFrame(
        [(0, "   "), (1, "a b c d e f"), (2, "a b c d e f")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            DD.remove_duplicated_spans(docs, n=5, min_docs=2).collect()}
    assert rows[0]["n_tokens"] == 0 and rows[0]["n_kept"] == 0
    assert rows[0]["cleaned"] == ""
    # docs 1 and 2 share every 5-gram: fully removed
    assert rows[1]["n_kept"] == 0 and rows[2]["n_kept"] == 0


def test_bpe_encode_counts_consistent_with_segmentations(spark, sf_dir):
    """Per-doc BPE token counts must equal summing each word's
    segmentation length over the document's word stream."""
    d = load_table(spark, sf_dir, "documents")
    pieces = {
        r["word"]: r["n_symbols"]
        for r in VB.bpe_segment(d, n_merges=3).collect()
    }
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in VB.bpe_encode_counts(d, n_merges=3).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in d.select("doc_id", "text").collect()
    }
    for doc_id, text in docs.items():
        words = text.strip().lower().split()
        want = (len(words), sum(pieces[w] for w in words))
        assert got[doc_id] == want

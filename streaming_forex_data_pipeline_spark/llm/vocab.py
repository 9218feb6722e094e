"""Vocabulary / tokenizer-prep operators for LLM-data pipelines.

Tokenizer training starts from corpus statistics: the word-frequency
table (vocabulary) and, for BPE, symbol-pair counts — the first merge
iteration of Sennrich et al. 2016 ("Neural Machine Translation of Rare
Words with Subword Units").  The reference has no text surface at all;
these extend the engine with the standard prep stage.

Scale shape (the part that matters at 100 TB): pair counting runs over
the AGGREGATED vocabulary weighted by word frequency, not over the raw
token stream — one corpus-wide word count (keyed shuffle, map-side
combine) reduces the input from trillions of token occurrences to a
vocabulary of maybe millions of rows, and every later BPE iteration is
O(vocab), not O(corpus).  The char-pair explode happens after that
reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus import words_array


def vocab_counts(docs: DataFrame, text: str = "text") -> DataFrame:
    """Corpus vocabulary: (token, n_occurrences, n_docs) — one explode
    + one keyed aggregation with map-side combine."""
    ex = docs.select("doc_id", F.explode(words_array(text)).alias("token"))
    return ex.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


def bpe_pair_counts(docs: DataFrame, text: str = "text") -> DataFrame:
    """Adjacent-character-pair frequencies weighted by word frequency —
    the statistic the first BPE merge maximizes.

    Computes the word-frequency table first, then explodes each
    DISTINCT word's characters into (left, right) pairs carrying the
    word's corpus count: the explode runs over the vocabulary, so a
    100 TB corpus pays one word-count shuffle plus O(vocab · word_len)
    pair rows.  Returns (pair, n_occurrences) where ``n_occurrences``
    is the corpus-wide count of the adjacent pair inside words.
    """
    vocab = (
        docs.select(F.explode(words_array(text)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    chars = F.split(F.col("word"), "")
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.concat(
            F.element_at(chars, i), F.element_at(chars, i + 1)
        ),
    )
    exploded = vocab.filter(F.length("word") >= 2).select(
        "wc", F.explode(pairs).alias("pair")
    )
    return exploded.groupBy("pair").agg(
        F.sum("wc").alias("n_occurrences")
    )


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, text: str = "text"
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the classic keyword-
    extraction / corpus-drift signal (Salton & Buckley 1988), with
    idf = ln(N / df) over raw document frequency.

    Returns (doc_id, term, tf, df, tfidf, rank); ties break by term so
    the output is total-ordered and exactly comparable.

    Plan: one explode + the (doc_id, term) count aggregation; document
    frequency re-aggregates THAT output (vocabulary-sized, not
    corpus-sized); N broadcasts as a 1-row frame; the top-k window
    partitions by doc_id (the parallel axis).  tf/df are exact
    integers; tfidf is per-row arithmetic over them (no float
    partials).
    """
    ex = docs.select("doc_id", F.explode(words_array(text)).alias("term"))
    per = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = per.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    scored = (
        per.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf")
            * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )

"""Registered queries for the corpus-hygiene operator family
(`llm/corpus.py`): Gopher-style repetition signals, deterministic
dataset splits, stratified sampling, and benchmark decontamination.

These extend the reference pipeline (which has no corpus stage) with
the standard large-scale training-data operations; every query is pure
Column algebra with an exactly-matching DuckDB oracle — the hash
arithmetic uses the engine-portable md5-hex-prefix trick shared with
`llm/dedup.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import corpus as CO
from ..llm import packing as PK
from ..sources.tables import fan_out, load_table
from .registry import register

#: DuckDB mirror of corpus.portable_bucket: first 60 bits of
#: md5(salt || key), non-negative, identical on both engines.
_HASH_SQL = "('0x' || substr(md5({expr}), 1, 15))::BIGINT"


@register(
    "repetition_stats",
    oracle=r"""
WITH ws AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, 0 AS g, u.gram FROM ws, UNNEST(w) AS u(gram)
  UNION ALL
  SELECT doc_id, 1 AS g, w[i] || ' ' || w[i + 1] AS gram
  FROM ws, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
),
per_gram AS (
  SELECT doc_id, g, gram, count(*) AS c FROM grams GROUP BY 1, 2, 3
),
per_kind AS (
  SELECT doc_id, g, max(c) AS top_c, sum(c) AS total,
         count(*) AS n_distinct
  FROM per_gram GROUP BY 1, 2
)
SELECT doc_id,
       CAST(max(CASE WHEN g = 0 THEN total END) AS BIGINT) AS n_words,
       round(1.0 - CAST(max(CASE WHEN g = 0 THEN n_distinct END) AS DOUBLE)
                   / max(CASE WHEN g = 0 THEN total END), 6)
         AS dup_word_frac,
       round(CAST(max(CASE WHEN g = 0 THEN top_c END) AS DOUBLE)
             / max(CASE WHEN g = 0 THEN total END), 6) AS top_word_frac,
       round(coalesce(CAST(max(CASE WHEN g = 1 THEN top_c END) AS DOUBLE)
                      / max(CASE WHEN g = 1 THEN total END), 0.0), 6)
         AS top_bigram_frac
FROM per_kind GROUP BY doc_id ORDER BY doc_id
""",
    doc="Gopher-style repetition signals per document "
    "(llm/corpus.py:repetition_stats): duplicate-word fraction, modal-"
    "word fraction, modal-bigram fraction — the boilerplate/templated-"
    "document detectors near-dup passes miss (Rae et al. 2021 §A1.1).  "
    "Plan: unigrams+bigrams tagged and exploded in ONE Generate, two "
    "shuffled aggregations with map-side combine, conditional-agg "
    "pivot instead of a unigram-bigram self-join.  Shuffle keys "
    "(doc_id, gram) are high-cardinality and unskewed — a 100 TB "
    "corpus is one scan + two well-keyed shuffles.",
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # single-row-group scan is unsplittable; the tagged-gram Generate
    # is CPU-heavy — fan out first (8.3 s -> 1.9 s at sf0.1)
    return CO.repetition_stats(fan_out(d)).orderBy("doc_id")


@register(
    "dataset_split",
    oracle=f"""
WITH b AS (
  SELECT doc_id,
         {_HASH_SQL.format(expr="'split:' || CAST(doc_id AS VARCHAR)")}
           % 100 AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'validation'
            ELSE 'test' END AS split
FROM b
ORDER BY doc_id
""",
    doc="Deterministic train/validation/test assignment by content-"
    "hash bucket (llm/corpus.py:assign_split): a document's split is a "
    "pure function of its key, so incremental corpus builds can never "
    "migrate yesterday's training doc into today's test set.  Narrow "
    "map stage — zero shuffles at any scale; the oracle embeds the "
    "identical md5-prefix arithmetic.",
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return CO.assign_split(d).select("doc_id", "bucket", "split").orderBy(
        "doc_id"
    )


@register(
    "stratified_sample",
    oracle=f"""
WITH h AS (
  SELECT doc_id, lang,
         {_HASH_SQL.format(expr="'sample:' || CAST(doc_id AS VARCHAR)")}
           % 1099511627776 AS hkey
  FROM documents
),
r AS (
  SELECT doc_id, lang,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY hkey, doc_id) AS INT)
           AS sample_rank
  FROM h
)
SELECT doc_id, lang, sample_rank
FROM r WHERE sample_rank <= 5
ORDER BY lang, sample_rank
""",
    doc="Deterministic stratified sampling "
    "(llm/corpus.py:stratified_sample): per-language eval slice = the "
    "5 docs with the smallest portable hash in each stratum — uniform "
    "sampling without replacement, reproducible across engines, runs, "
    "and cluster layouts (no RNG).  Window partitions by the stratum; "
    "strata are the parallel axis (SURVEY §2.13 degenerate case "
    "documented in the operator docstring).",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        CO.stratified_sample(d, strata="lang", k=5)
        .select("doc_id", "lang", "sample_rank")
        .orderBy("lang", "sample_rank")
    )


@register(
    "contamination",
    oracle=r"""
WITH ws AS (
  SELECT doc_id, source,
         regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM documents
),
g AS (
  SELECT doc_id, source = 'src0' AS is_bench,
         unnest(list_distinct(
           list_transform(range(1, greatest(len(w) - 1, 1)),
                          i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])
         )) AS gram
  FROM ws
),
bench AS (SELECT DISTINCT gram, 1 AS hit FROM g WHERE is_bench),
corpus AS (SELECT doc_id, gram FROM g WHERE NOT is_bench)
SELECT c.doc_id,
       count(*) AS n_ngrams,
       count(b.hit) AS n_matched,
       round(CAST(count(b.hit) AS DOUBLE) / count(*), 6) AS contamination
FROM corpus c LEFT JOIN bench b USING (gram)
GROUP BY c.doc_id
ORDER BY c.doc_id
""",
    doc="Benchmark decontamination (llm/corpus.py:contamination): "
    "word-trigram overlap of every corpus document against the "
    "benchmark subset (here: source='src0' stands in for a held-out "
    "eval set).  Per-doc gram sets deduped BEFORE the explode, the "
    "benchmark gram set broadcast (benchmarks are small by "
    "definition), one shuffle on the corpus side — the 100 TB-safe "
    "decontamination shape.",
)
def contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # fan out before the distinct-trigram Generate (7.6 s -> ~1 s)
    return CO.contamination(
        fan_out(d), F.col("source") == "src0", n=3
    ).orderBy("doc_id")


def _mix_targets() -> dict[str, float]:
    """Fixed demo mixture: double weight on even-numbered sources."""
    return {f"src{i}": 2.0 if i % 2 == 0 else 1.0 for i in range(20)}


_MIX_W_VALUES = ",\n  ".join(
    f"('src{i}', {(2.0 if i % 2 == 0 else 1.0) / 30.0!r})" for i in range(20)
)

_TOKCOUNT_SQL = (
    r"CASE WHEN trim(text) = '' THEN 0 "
    r"ELSE len(regexp_split_to_array(trim(text), '\s+')) END"
)


@register(
    "source_mix",
    oracle=f"""
WITH w(source, w) AS (VALUES
  {_MIX_W_VALUES}
),
stats AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum({_TOKCOUNT_SQL}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens FROM stats),
rated AS (
  SELECT s.source, n_docs, n_tokens,
         n_tokens / corpus_tokens AS share,
         w.w / (n_tokens / corpus_tokens) AS raw_rate
  FROM stats s, tot, w WHERE w.source = s.source
),
peak AS (SELECT max(raw_rate) AS peak FROM rated),
rated2 AS (
  SELECT source, n_docs, n_tokens, share,
         raw_rate / peak AS rate,
         CAST(floor((raw_rate / peak) * 1000000) AS BIGINT) AS thr
  FROM rated, peak
),
kept AS (
  SELECT d.source, count(*) AS kept_docs,
         CAST(sum({_TOKCOUNT_SQL}) AS BIGINT) AS kept_tokens
  FROM documents d JOIN rated2 r ON d.source = r.source
  WHERE {_HASH_SQL.format(expr="'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000 < r.thr
  GROUP BY d.source
)
SELECT r.source, n_docs, n_tokens,
       round(share, 6) AS share, round(rate, 6) AS rate,
       coalesce(kept_docs, 0) AS kept_docs,
       coalesce(kept_tokens, 0) AS kept_tokens
FROM rated2 r LEFT JOIN kept k ON r.source = k.source
ORDER BY r.source
""",
    doc="Mixture reweighting (Pile/Dolma data-mixing stage, "
    "llm/corpus.py:source_mix): per-source token shares -> "
    "deterministic downsampling rates scaled to the binding source "
    "(no upsampling), selection by the portable md5 bucket so reruns "
    "keep identical documents.  Integer counts, per-row rate "
    "arithmetic, broadcast rate table; no float parallel partials.",
)
def source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return CO.source_mix(d, _mix_targets()).orderBy("source")


@register(
    "pack_chunks",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
           AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS start
  FROM t WHERE n_tokens > 0
)
SELECT doc_id,
       CAST(u.cid AS BIGINT) AS chunk_id,
       CAST(least(start + n_tokens, (u.cid + 1) * 64)
            - greatest(start, u.cid * 64) AS BIGINT) AS n_tokens
FROM c, LATERAL (SELECT unnest(generate_series(start // 64,
                     (start + n_tokens - 1) // 64)) AS cid) u
ORDER BY doc_id, chunk_id
""",
    doc="Concat-and-chunk sequence packing (llm/packing.py:pack_chunks) "
    "— the GPT-style pretraining packer: slice the doc_id-ordered "
    "token stream into 64-token chunks, one row per (doc, chunk) "
    "overlap.  The global token prefix sum runs as a TWO-LEVEL "
    "distributed prefix sum (per-bucket totals -> tiny offset window "
    "-> within-bucket cumsum partitioned by bucket), so no window task "
    "ever scans the corpus — the oracle's single global cumsum is the "
    "semantic spec, not the plan.  All-integer arithmetic, exactly "
    "portable.",
)
def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return PK.pack_chunks(d, chunk_tokens=64).orderBy("doc_id", "chunk_id")


@register(
    "pack_greedy",
    oracle=r"""
WITH RECURSIVE t AS (
  SELECT doc_id, doc_id % 8 AS bucket,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
           AS BIGINT) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, bucket, n_tokens,
         CAST(row_number() OVER (PARTITION BY bucket ORDER BY doc_id)
           AS BIGINT) AS rn
  FROM t WHERE n_tokens > 0
),
fold AS (
  SELECT bucket, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS seq_id, n_tokens AS seq_fill
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.bucket, r.rn, r.doc_id, r.n_tokens,
         CASE WHEN f.seq_fill + r.n_tokens <= 128
              THEN f.seq_id ELSE f.seq_id + 1 END,
         CASE WHEN f.seq_fill + r.n_tokens <= 128
              THEN f.seq_fill + r.n_tokens ELSE r.n_tokens END
  FROM fold f JOIN r ON r.bucket = f.bucket AND r.rn = f.rn + 1
)
SELECT bucket, doc_id, n_tokens, seq_id, seq_fill
FROM fold
ORDER BY bucket, doc_id
""",
    doc="Greedy no-split sequence packing (llm/packing.py:pack_greedy) "
    "— the SFT packer: within each of 8 hash buckets, append each doc "
    "to the current 128-token sequence or open a new one.  The "
    "fill-with-reset recurrence is non-associative (no window "
    "expresses it), so it runs as the sanctioned per-bucket "
    "applyInPandas kernel class (SURVEY §2.13, like PSAR); buckets are "
    "the parallel axis and each bucket wastes at most one partial "
    "sequence, so #buckets scales with the cluster.  Oracle: a "
    "recursive CTE folding the identical all-integer recurrence.",
)
def pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return PK.pack_greedy(d, budget=128, n_buckets=8).orderBy(
        "bucket", "doc_id"
    )


@register(
    "corpus_pipeline",
    oracle=r"""
WITH RECURSIVE
d1 AS (
  SELECT * FROM documents
  QUALIFY row_number() OVER (
    PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
    ORDER BY doc_id) = 1
),
toksnd AS (
  SELECT doc_id,
         list_sort(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS t
  FROM d1
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM toksnd a JOIN toksnd b ON a.doc_id < b.doc_id AND a.t = b.t
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM p
  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM p
),
reach(node, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node),
d2 AS (
  SELECT * FROM d1
  WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id != cluster_id)
),
toks2 AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM d2
),
ex AS (SELECT doc_id, unnest(t) AS tok FROM toks2),
cnt AS (SELECT tok, count(*) AS c FROM ex GROUP BY tok),
tot AS (SELECT sum(c) AS big_t, count(*) AS v FROM cnt),
per AS (SELECT doc_id, tok, count(*) AS k FROM ex GROUP BY doc_id, tok),
arr AS (
  SELECT doc_id, list_sort(list({'tok': p2.tok, 'k': p2.k, 'c': c2.c})) AS a
  FROM per p2 JOIN cnt c2 ON p2.tok = c2.tok
  GROUP BY doc_id
),
scored AS (
  SELECT doc_id,
         list_reduce(list_transform(a, s -> s.k), (x, y) -> x + y) AS n_tokens,
         list_reduce(
           list_transform(a, s -> s.k * -ln((s.c + 1.0) / (big_t + v))),
           (x, y) -> x + y
         ) AS nll_sum
  FROM arr, tot
),
kept AS (
  SELECT s.doc_id, s.n_tokens, s.nll_sum / s.n_tokens AS avg_nll, d2.lang
  FROM scored s JOIN d2 USING (doc_id)
  WHERE s.nll_sum / s.n_tokens < 3.405
),
sp AS (
  SELECT lang, n_tokens, avg_nll,
         ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % 100 AS bucket
  FROM kept
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'validation'
            ELSE 'test' END AS split,
       lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(CAST(round(avg_nll * 1000000) AS BIGINT)) AS BIGINT) AS sum_nll_micro
FROM sp
GROUP BY 1, 2
ORDER BY split, lang
""",
    doc="The flagship end-to-end training-corpus build, every stage an "
    "already-oracle-checked operator composed into ONE lazy plan: "
    "exact dedup keep-first (llm/dedup.py dedup_exact) -> near-dup "
    "canonical keep via connected components (dedup_canonical) -> "
    "unigram-LM perplexity filter fit on the deduped corpus "
    "(llm/text.py unigram_lm_nll, fixed 3.405-nat gate) -> "
    "deterministic split assignment (llm/corpus.py assign_split) -> "
    "per-(split, lang) doc/token totals with the NLL mass as exact "
    "integer micro-nats.  Catalyst sees the whole pipeline at once: "
    "column pruning reaches the scan, the dedup window / CC loop / LM "
    "shuffles schedule as one DAG, and no stage materializes between "
    "steps.",
)
def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import dedup as DD
    from ..llm import text as TX

    d = load_table(spark, sf_dir, "documents")
    d1 = DD.dedup_exact(d)
    # the deduped corpus feeds both the LM fit and the lang join — in
    # a real pipeline it is THE reusable artifact; materialize it once
    # (lazily) instead of re-running the dedup stage per consumer
    # branch.  At threshold 1.0 the set-equality fast path replaces
    # the iterative CC loop (equivalent by transitivity of set
    # equality; asserted by test_identical_set_fast_path_matches_cc)
    d2 = DD.dedup_identical_token_sets(d1).localCheckpoint(eager=False)
    nll = TX.unigram_lm_nll(d2)
    kept = nll.filter(F.col("avg_nll") < 3.405).join(
        d2.select("doc_id", "lang"), "doc_id"
    )
    sp = CO.assign_split(kept)
    return (
        sp.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(
                F.round(F.col("avg_nll") * 1_000_000, 0).cast("long")
            ).alias("sum_nll_micro"),
        )
        .orderBy("split", "lang")
    )


@register(
    "vocab_topk",
    oracle=r"""
WITH ws AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM documents
),
ex AS (SELECT doc_id, unnest(w) AS token FROM ws)
SELECT token, count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs
FROM ex GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 50
""",
    doc="Corpus vocabulary top-k (llm/vocab.py:vocab_counts): token "
    "frequency + document frequency, the tokenizer-training / "
    "corpus-drift statistic.  One explode + one keyed aggregation "
    "with map-side combine, then TakeOrderedAndProject — the shuffle "
    "carries the vocabulary (distinct tokens), not the corpus.",
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import vocab as VB

    d = load_table(spark, sf_dir, "documents")
    return (
        VB.vocab_counts(d)
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(50)
    )


@register(
    "bpe_pairs",
    oracle=r"""
WITH ws AS (
  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM documents
),
tok AS (SELECT unnest(w) AS word FROM ws),
vocab AS (SELECT word, count(*) AS wc FROM tok GROUP BY word),
pairs AS (
  SELECT wc,
         unnest([substring(word, i, 2)
                 FOR i IN generate_series(1, length(word) - 1)]) AS pair
  FROM vocab WHERE length(word) >= 2
)
SELECT pair, CAST(sum(wc) AS BIGINT) AS n_occurrences
FROM pairs GROUP BY pair
ORDER BY n_occurrences DESC, pair
LIMIT 50
""",
    doc="BPE-prep pair counts (llm/vocab.py:bpe_pair_counts): "
    "adjacent-character-pair frequencies weighted by word frequency — "
    "the statistic the first BPE merge maximizes (Sennrich et al. "
    "2016).  The pair explode runs over the AGGREGATED vocabulary, not "
    "the raw token stream, so a 100 TB corpus pays one word-count "
    "shuffle and O(vocab * word_len) pair rows — the iteration cost "
    "every real BPE trainer relies on.",
)
def bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import vocab as VB

    d = load_table(spark, sf_dir, "documents")
    return (
        VB.bpe_pair_counts(d)
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(50)
    )


@register(
    "quality_gate",
    oracle=r"""
WITH ws AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM documents
),
g AS (SELECT doc_id, unnest(w) AS tok FROM ws),
c AS (SELECT doc_id, tok, count(*) AS k FROM g GROUP BY 1, 2),
m AS (
  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_words,
         round(1.0 - count(*) * 1.0 / sum(k), 6) AS dup_word_frac,
         round(max(k) * 1.0 / sum(k), 6) AS top_word_frac
  FROM c GROUP BY doc_id
),
a AS (
  SELECT doc_id,
         round(coalesce(
           CASE WHEN (CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+')) END) > 0
                THEN CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                     / (CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END)
           END, 0.0), 6) AS avg_word_len
  FROM documents
),
r AS (
  SELECT m.doc_id, n_words, dup_word_frac, top_word_frac, avg_word_len,
         concat_ws(',',
           CASE WHEN n_words < 20 THEN 'too_short' END,
           CASE WHEN n_words > 1000 THEN 'too_long' END,
           CASE WHEN dup_word_frac > 0.6 THEN 'dup_words' END,
           CASE WHEN top_word_frac > 0.15 THEN 'top_word' END,
           CASE WHEN avg_word_len < 2.0 OR avg_word_len > 10.0
                THEN 'word_len' END
         ) AS reasons
  FROM m JOIN a ON m.doc_id = a.doc_id
)
SELECT doc_id, n_words, dup_word_frac, top_word_frac, avg_word_len,
       reasons, reasons = '' AS keep
FROM r
ORDER BY doc_id
""",
    doc="Dolma-style per-document filter decision table "
    "(llm/corpus.py:quality_gate): the Gopher/C4 rule battery "
    "evaluated into attributes + keep/drop + machine-readable reason "
    "codes, so audits see WHY a document dropped.  Thresholds compare "
    "the 6dp-ROUNDED attributes — bit-identical on both engines, so "
    "the decision itself is exactly hash-checked, not just the "
    "attributes.  Plan: repetition_stats' single Generate + two keyed "
    "aggregations, a doc_id join back to per-row attributes, then "
    "pure row arithmetic.",
)
def quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # fan out before repetition_stats' Generate (9.3 s -> 1.8 s)
    return CO.quality_gate(fan_out(d)).orderBy("doc_id")


@register(
    "tfidf_topk",
    oracle=r"""
WITH ws AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM documents
),
ex AS (SELECT doc_id, unnest(w) AS term FROM ws),
per AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM per GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT p.doc_id, p.term, p.tf, d.df,
         p.tf * ln(CAST(n_docs AS DOUBLE) / d.df) AS tfidf
  FROM per p JOIN dfreq d USING (term), n
),
r AS (
  SELECT doc_id, term, tf, df, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, term ASC) AS INT)
           AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, round(tfidf, 6) AS tfidf, rank
FROM r WHERE rank <= 3
ORDER BY doc_id, rank
""",
    doc="Per-document top-3 TF-IDF terms (llm/vocab.py:tfidf_top_terms) "
    "— keyword extraction / corpus-drift monitoring.  Document "
    "frequency re-aggregates the (doc, term) count output "
    "(vocabulary-sized), N broadcasts as a 1-row frame, the top-k "
    "window partitions by doc_id.  tf/df are exact integers; the "
    "ranking compares per-row doubles that are bit-identical on both "
    "engines, so rank — not just score — is exactly hash-checked.",
)
def tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import vocab as VB

    d = load_table(spark, sf_dir, "documents")
    out = VB.tfidf_top_terms(d, k=3)
    return out.select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round("tfidf", 6).alias("tfidf"),
        "rank",
    ).orderBy("doc_id", "rank")


def _bpe_ctes(n_merges: int = 3) -> str:
    """Chained-CTE mirror of llm/vocab.py:_bpe_loop: vocab_0 is the
    char-spaced word-frequency table; each stage recomputes weighted
    adjacent-pair counts, picks the argmax (ties lexicographic), and
    rewrites the vocabulary with a boundary-aligned replace — the SAME
    1-row cross join the Spark plan uses."""
    parts = [
        r"""WITH ws AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM documents
),
vocab_0 AS (
  SELECT word,
         ' ' || rtrim(regexp_replace(word, '(.)', '\1  ', 'g')) || ' ' AS sym,
         count(*) AS wc
  FROM (SELECT unnest(w) AS word FROM ws) GROUP BY word
)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(f"""
pairs_{i} AS (
  SELECT a[i] AS l, a[i + 1] AS r, CAST(sum(wc) AS BIGINT) AS pair_count
  FROM (SELECT wc, string_split(trim(sym), '  ') AS a FROM vocab_{i - 1}),
       LATERAL (SELECT unnest(generate_series(1, len(a) - 1)) AS i) g
  GROUP BY 1, 2
),
best_{i} AS (
  SELECT l, r, pair_count FROM pairs_{i}
  ORDER BY pair_count DESC, l ASC, r ASC LIMIT 1
),
vocab_{i} AS (
  SELECT word, replace(sym, ' ' || b.l || '  ' || b.r || ' ',
                            ' ' || b.l || b.r || ' ') AS sym, wc
  FROM vocab_{i - 1}, best_{i} b
)""")
    return ",".join(parts)


def _bpe_oracle(n_merges: int = 3) -> str:
    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, l AS left, r AS right, l || r AS merged, "
        f"pair_count FROM best_{i}"
        for i in range(1, n_merges + 1)
    )
    return f"{_bpe_ctes(n_merges)}\nSELECT * FROM ({selects}) ORDER BY step"


def _bpe_segment_oracle(n_merges: int = 3, k: int = 20) -> str:
    return f"""{_bpe_ctes(n_merges)}
SELECT word, CAST(wc AS BIGINT) AS wc,
       array_to_string(string_split(trim(sym), '  '), ' ') AS segmented,
       CAST(len(string_split(trim(sym), '  ')) AS INT) AS n_symbols
FROM vocab_{n_merges}
ORDER BY wc DESC, word ASC LIMIT {k}"""


@register(
    "bpe_train",
    oracle=_bpe_oracle(3),
    doc="BPE merge training, 3 iterations (llm/vocab.py:bpe_train; "
    "Sennrich et al. 2016): per step, weighted adjacent-pair counts "
    "over the vocabulary, argmax pair (lexicographic ties), boundary-"
    "aligned merge rewrite.  Fully declarative — the per-step argmax "
    "is a 1-row broadcast cross join, no driver collect; every "
    "iteration is O(vocab) because the corpus pre-aggregates to word "
    "counts first (the reason real BPE trainers scale).  Output is "
    "the merge table a tokenizer ships — strings+integers only, "
    "exactly hash-checked including the merge ORDER.",
)
def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import vocab as VB

    d = load_table(spark, sf_dir, "documents")
    return VB.bpe_train(d, n_merges=3).orderBy("step")


@register(
    "bpe_segment",
    oracle=_bpe_segment_oracle(3, 20),
    doc="BPE apply — the train->apply half of the tokenizer story "
    "(llm/vocab.py:bpe_segment): the 20 most frequent words' "
    "segmentations under the 3 learned merges.  The merge rewrites "
    "already transform the vocabulary in-plan, so segmentation just "
    "exposes the final state; at scale this output is the tokenizer's "
    "word->pieces cache (vocabulary-sized) that the encode stage "
    "broadcast-joins against the corpus.",
)
def bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import vocab as VB

    d = load_table(spark, sf_dir, "documents")
    return (
        VB.bpe_segment(d, n_merges=3)
        .orderBy(F.desc("wc"), F.asc("word"))
        .limit(20)
    )


@register(
    "bpe_encode_counts",
    oracle=f"""{_bpe_ctes(3)},
seg AS (
  SELECT word,
         CAST(len(string_split(trim(sym), '  ')) AS BIGINT) AS n_pieces
  FROM vocab_3
),
ex AS (SELECT doc_id, unnest(w) AS word FROM ws)
SELECT ex.doc_id, count(*) AS n_words,
       CAST(sum(seg.n_pieces) AS BIGINT) AS n_bpe_tokens
FROM ex JOIN seg USING (word)
GROUP BY ex.doc_id
ORDER BY ex.doc_id
""",
    doc="BPE encode counts (llm/vocab.py:bpe_encode_counts): per-"
    "document token counts under the 3-merge trained tokenizer — THE "
    "statistic training-budget planning runs on.  The word->n_pieces "
    "cache is vocabulary-sized and joins the corpus word stream keyed "
    "by word (AQE broadcasts while it fits); integer outputs, exactly "
    "hash-checked.  Closes the tokenizer loop: pair counts -> merge "
    "training -> segmentation -> corpus encode.",
)
def bpe_encode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import vocab as VB

    d = load_table(spark, sf_dir, "documents")
    return VB.bpe_encode_counts(d, n_merges=3).orderBy("doc_id")


@register(
    "bpe_fertility",
    oracle=f"""{_bpe_ctes(3)},
seg AS (
  SELECT word,
         CAST(len(string_split(trim(sym), '  ')) AS BIGINT) AS n_pieces
  FROM vocab_3
),
ex AS (SELECT doc_id, unnest(w) AS word FROM ws),
per AS (
  SELECT ex.doc_id, count(*) AS n_words,
         CAST(sum(seg.n_pieces) AS BIGINT) AS n_bpe_tokens,
         CAST(sum(length(ex.word)) AS BIGINT) AS n_word_chars
  FROM ex JOIN seg USING (word)
  GROUP BY ex.doc_id
)
SELECT doc_id, n_words, n_bpe_tokens, n_word_chars,
       round(CAST(n_bpe_tokens AS DOUBLE) / n_words, 6) AS fertility,
       round(CAST(n_word_chars AS DOUBLE) / n_bpe_tokens, 6)
         AS chars_per_token
FROM per
ORDER BY doc_id
""",
    doc="Tokenizer fertility / compression per document "
    "(llm/vocab.py:bpe_fertility): BPE-tokens-per-word (the standard "
    "cross-lingual tokenizer-quality metric) and word-chars-per-BPE-"
    "token (the byte-budget -> token-budget conversion) under the "
    "3-merge trained tokenizer.  Same vocabulary-sized cache join as "
    "bpe_encode_counts with the char mass riding the same "
    "aggregation; the ratios are single divisions of exact integer "
    "sums, so they hash-check exactly.",
)
def bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import vocab as VB

    d = load_table(spark, sf_dir, "documents")
    s = VB.bpe_fertility(d, n_merges=3)
    return s.select(
        "doc_id",
        "n_words",
        "n_bpe_tokens",
        "n_word_chars",
        F.round("fertility", 6).alias("fertility"),
        F.round("chars_per_token", 6).alias("chars_per_token"),
    ).orderBy("doc_id")


@register(
    "length_quantiles",
    oracle=r"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS mean_chars,
       round(quantile_cont(n_chars, 0.5), 6) AS p50,
       round(quantile_cont(n_chars, 0.9), 6) AS p90,
       round(quantile_cont(n_chars, 0.99), 6) AS p99
FROM documents
GROUP BY source
ORDER BY source
""",
    doc="Per-source document-length distribution: count, total/mean "
    "chars, and exact p50/p90/p99 (linear-interpolation order stats "
    "— Spark `percentile` and DuckDB `quantile_cont` share the "
    "definition; verified bit-exact on this data).  The shard-"
    "sizing / truncation-policy statistic every corpus build starts "
    "with.  Exact percentile materializes each group's values — the "
    "right call for a bounded source taxonomy; an unbounded group "
    "key would swap in approx_percentile (t-digest) at 100 TB.",
)
def length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_chars"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(n_chars, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(n_chars, 0.99)"), 6).alias("p99"),
        )
        .orderBy("source")
    )


@register(
    "reservoir_sample",
    oracle=r"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ln((('0x' || substr(md5('res1:' || CAST(doc_id AS VARCHAR)),
                             1, 13))::BIGINT + 0.5)
            / 4503599627370496.0)
         / n_chars AS res_key_raw
  FROM documents WHERE n_chars > 0
),
r AS (
  SELECT doc_id, source, n_chars, res_key_raw,
         row_number() OVER (ORDER BY res_key_raw DESC, doc_id)
           AS sample_rank
  FROM keyed
)
SELECT doc_id, source, n_chars, round(res_key_raw, 6) + 0 AS res_key,
       sample_rank
FROM r WHERE sample_rank <= 50
ORDER BY sample_rank
""",
    doc="Distributed weighted reservoir sampling without replacement "
    "(llm/corpus.py:weighted_reservoir_sample; Efraimidis & Spirakis "
    "2006 A-Res, log form): 50 documents drawn with probability "
    "proportional to n_chars via key = ln(u)/w with seeded "
    "engine-portable md5 uniforms — the shard-sampling primitive.  "
    "Because the key is a pure per-row function, the 'reservoir' is "
    "just a global top-k: per-partition partial top-k + a 50-row "
    "merge (TakeOrderedAndProject), and a streaming ingest maintains "
    "it by max-merging keys across micro-batches.  Deterministic and "
    "reproducible: a seeded rerun at 100 TB picks the same rows, and "
    "DuckDB derives the identical ranking.",
)
def reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return CO.weighted_reservoir_sample(
        d, k=50, weight_col="n_chars", seed="res1"
    ).orderBy("sample_rank")


@register(
    "hist_quantiles",
    oracle="""
WITH binned AS (
  SELECT CASE WHEN n_chars < 0 THEN -1
              WHEN n_chars >= 1000 THEN 50
              ELSE CAST(floor((n_chars - 0.0) / 20.0) AS INT) END AS bin
  FROM documents WHERE n_chars IS NOT NULL
),
sk AS (
  SELECT s.bin, CAST(coalesce(t.c, 0) AS BIGINT) AS c
  FROM (SELECT unnest(range(-1, 51)) AS bin) s
  LEFT JOIN (SELECT bin, count(*) AS c FROM binned GROUP BY bin) t
    USING (bin)
),
cum AS (
  SELECT bin, c,
         sum(c) OVER (ORDER BY bin) AS cum,
         coalesce(sum(c) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cum_before
  FROM sk
),
tot AS (SELECT sum(c) AS n FROM sk)
SELECT q, bin AS hit_bin,
       CAST(cum_before AS BIGINT) AS cum_before,
       c AS bin_count,
       round(CASE WHEN bin < 0 THEN 0.0
                  WHEN bin >= 50 THEN 1000.0
                  ELSE (0.0 + CAST(bin AS DOUBLE) * 20.0)
                       + (CAST(CAST(ceil(q * n) AS BIGINT) - cum_before
                               AS DOUBLE) / CAST(c AS DOUBLE)) * 20.0
             END, 6) AS est_value
FROM (SELECT unnest([0.25, 0.5, 0.9, 0.99]) AS q) qs, tot, cum
WHERE c > 0
  AND cum >= CAST(ceil(q * n) AS BIGINT)
  AND cum_before < CAST(ceil(q * n) AS BIGINT)
ORDER BY q
""",
    doc="Histogram-sketch quantiles (llm/corpus.py:histogram_sketch/"
    "histogram_quantiles): P25/P50/P90/P99 of document length "
    "estimated from a 52-bin fixed-width histogram — the "
    "bounded-state RANK sketch completing the streaming triad (CMS = "
    "frequency, HLL = cardinality, histogram = rank).  The sketch is "
    "one keyed exact-integer count with a complete bin spine (always "
    "n_bins+2 rows) and merges across streams by bin-wise sum; the "
    "quantile walk is a window over the bins-sized frame, never the "
    "corpus.  The scale-path alternative to the exact distributed "
    "NTILE (curriculum_bins/length_quantiles): exact ranks cost a "
    "range exchange per run, the sketch costs 52 integers and an "
    "error of at most one bin width.",
)
def hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sk = CO.histogram_sketch(d, "n_chars", lo=0.0, hi=1000.0, n_bins=50)
    return CO.histogram_quantiles(
        sk, (0.25, 0.5, 0.9, 0.99), lo=0.0, hi=1000.0, n_bins=50
    )


@register(
    "split_leakage",
    oracle=rf"""
WITH s AS (
  SELECT doc_id, source, text,
         {_HASH_SQL.format(expr="'split:' || CAST(doc_id AS VARCHAR)")}
           % 100 AS bucket
  FROM documents
),
labeled AS (
  SELECT doc_id, source, text,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'validation'
              ELSE 'test' END AS split
  FROM s
),
ws AS (
  SELECT doc_id, source, split,
         regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM labeled
),
grams AS (
  SELECT DISTINCT doc_id, split,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS g
  FROM ws, LATERAL (SELECT unnest(range(1, len(w) - 2)) AS i) r
),
train_g AS (SELECT DISTINCT g FROM grams WHERE split = 'train'),
leaked AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE split = 'validation' AND g IN (SELECT g FROM train_g)
)
SELECT l.source,
       CAST(count(*) AS BIGINT) AS n_val_docs,
       CAST(sum(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leaked,
       round(CAST(sum(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS leak_frac
FROM labeled l LEFT JOIN leaked k USING (doc_id)
WHERE l.split = 'validation'
GROUP BY l.source
ORDER BY l.source
""",
    doc="Train-to-validation n-gram leakage audit "
    "(llm/corpus.py:split_leakage): per source, the fraction of "
    "validation documents sharing at least one word-4-gram with ANY "
    "training document under the deterministic hash split.  "
    "Decontamination protects an external benchmark; this audits the "
    "INTERNAL held-out split — near-duplicates straddling the split "
    "boundary make validation loss lie, and a random-by-hash split "
    "cannot prevent that by itself (dedup must run first; this "
    "measures what leakage remains).  Scale shape: both gram frames "
    "are corpus-sized, so the check is a plain hash join on the gram "
    "key (AQE absorbs Zipf-head skew) + per-doc any-collision — "
    "deliberately NOT the broadcast decontamination shape.",
)
def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = CO.split_leakage(fan_out(d), n=4)
    return out.select(
        "source",
        "n_val_docs",
        "n_leaked",
        F.round("leak_frac", 6).alias("leak_frac"),
    ).orderBy("source")


@register(
    "gate_by_source",
    oracle=r"""
WITH ws AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM documents
),
g AS (SELECT doc_id, unnest(w) AS tok FROM ws),
c AS (SELECT doc_id, tok, count(*) AS k FROM g GROUP BY 1, 2),
m AS (
  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_words,
         round(1.0 - count(*) * 1.0 / sum(k), 6) AS dup_word_frac,
         round(max(k) * 1.0 / sum(k), 6) AS top_word_frac
  FROM c GROUP BY doc_id
),
a AS (
  SELECT doc_id,
         round(coalesce(
           CASE WHEN (CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+')) END) > 0
                THEN CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                     / (CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END)
           END, 0.0), 6) AS avg_word_len
  FROM documents
),
r AS (
  SELECT m.doc_id, concat_ws(',',
           CASE WHEN n_words < 20 THEN 'too_short' END,
           CASE WHEN n_words > 1000 THEN 'too_long' END,
           CASE WHEN dup_word_frac > 0.6 THEN 'dup_words' END,
           CASE WHEN top_word_frac > 0.15 THEN 'top_word' END,
           CASE WHEN avg_word_len < 2.0 OR avg_word_len > 10.0
                THEN 'word_len' END
         ) AS reasons
  FROM m JOIN a ON m.doc_id = a.doc_id
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN reasons = '' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_keep,
       round(CAST(sum(CASE WHEN reasons = '' THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS keep_frac,
       CAST(sum(CASE WHEN list_contains(string_split(reasons, ','),
                                        'too_short') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_too_short,
       CAST(sum(CASE WHEN list_contains(string_split(reasons, ','),
                                        'too_long') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_too_long,
       CAST(sum(CASE WHEN list_contains(string_split(reasons, ','),
                                        'dup_words') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup_words,
       CAST(sum(CASE WHEN list_contains(string_split(reasons, ','),
                                        'top_word') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_top_word,
       CAST(sum(CASE WHEN list_contains(string_split(reasons, ','),
                                        'word_len') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_word_len
FROM r JOIN documents d ON r.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
""",
    doc="Per-source quality-gate dashboard: keep rate and per-rule "
    "drop counts for the Gopher/C4 battery (llm/corpus.py:"
    "quality_gate joined back to the source column) — the ingest "
    "compliance view every corpus pipeline watches (a source whose "
    "keep_frac collapses or whose rule mix shifts is a crawler or "
    "extraction regression).  Decisions are the gate's own "
    "6dp-rounded-attribute decisions, so the aggregation is exactly "
    "hash-checked; one extra doc_id join + a source-keyed aggregation "
    "over the gate output, output = #sources rows.",
)
def gate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    g = CO.quality_gate(fan_out(d)).select("doc_id", "reasons", "keep")
    j = g.join(d.select("doc_id", "source"), "doc_id")
    rules = ["too_short", "too_long", "dup_words", "top_word", "word_len"]
    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_keep"),
        *[
            F.sum(
                F.when(
                    F.array_contains(F.split("reasons", ","), rl), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"n_{rl}")
            for rl in rules
        ],
    )
    return agg.select(
        "source",
        "n_docs",
        "n_keep",
        F.round(
            F.col("n_keep").cast("double") / F.col("n_docs"), 6
        ).alias("keep_frac"),
        *[f"n_{rl}" for rl in rules],
    ).orderBy("source")


@register(
    "packing_stats",
    oracle=r"""
WITH RECURSIVE t AS (
  SELECT doc_id, doc_id % 8 AS bucket,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
           AS BIGINT) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, bucket, n_tokens,
         CAST(row_number() OVER (PARTITION BY bucket ORDER BY doc_id)
           AS BIGINT) AS rn
  FROM t WHERE n_tokens > 0
),
fold AS (
  SELECT bucket, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS seq_id, n_tokens AS seq_fill
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.bucket, r.rn, r.doc_id, r.n_tokens,
         CASE WHEN f.seq_fill + r.n_tokens <= 128
              THEN f.seq_id ELSE f.seq_id + 1 END,
         CASE WHEN f.seq_fill + r.n_tokens <= 128
              THEN f.seq_fill + r.n_tokens ELSE r.n_tokens END
  FROM fold f JOIN r ON r.bucket = f.bucket AND r.rn = f.rn + 1
),
seqs AS (
  SELECT bucket, seq_id, max(seq_fill) AS final_fill, count(*) AS n_docs
  FROM fold GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_sequences,
       CAST(sum(n_docs) AS BIGINT) AS n_docs_packed,
       CAST(sum(final_fill) AS BIGINT) AS total_tokens,
       round(CAST(sum(final_fill) AS DOUBLE) / (count(*) * 128.0), 6)
         AS avg_fill_frac,
       CAST(count(*) FILTER (final_fill > 128) AS BIGINT) AS n_overfull,
       CAST(max(final_fill) AS BIGINT) AS max_fill
FROM seqs
""",
    doc="Packing-efficiency dashboard over the greedy packer "
    "(llm/packing.py:pack_greedy, budget 128, 8 buckets): sequence "
    "count, packed docs/tokens, average fill fraction (= padding "
    "waste complement — the number that decides whether the packer "
    "earns its complexity vs plain concat-and-chunk), over-budget "
    "singleton count, and max fill.  Final fill per sequence is the "
    "max of the running fill (monotone within a sequence); every "
    "token lands in exactly one sequence so Σ final_fill equals the "
    "packed token mass — both facts the oracle recomputes through "
    "the identical recursive-CTE recurrence.  All-integer until two "
    "final divisions on the one-row summary.",
)
def packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    packed = PK.pack_greedy(d, budget=128, n_buckets=8)
    seqs = packed.groupBy("bucket", "seq_id").agg(
        F.max("seq_fill").alias("final_fill"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return seqs.agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("n_docs").alias("n_docs_packed"),
        F.sum("final_fill").alias("total_tokens"),
        F.round(
            F.sum("final_fill").cast("double")
            / (F.count(F.lit(1)) * F.lit(128.0)),
            6,
        ).alias("avg_fill_frac"),
        F.count(F.when(F.col("final_fill") > 128, 1)).alias("n_overfull"),
        F.max("final_fill").alias("max_fill"),
    )

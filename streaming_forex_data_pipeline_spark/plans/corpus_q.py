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
from ..sources.tables import load_table
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
    return CO.repetition_stats(d).orderBy("doc_id")


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
    return CO.contamination(d, F.col("source") == "src0", n=3).orderBy(
        "doc_id"
    )

"""Text-analysis operators for LLM-data pipelines (mandated extension).

All JVM-side Column expressions — language ID, quality scoring, token
counting and fingerprinting run inside whole-stage codegen, so a 100 TB
documents table is a single scan + projection (+ one shuffle only where
a groupBy is involved).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic. Deliberately small + deterministic so the DuckDB oracle can
# reproduce them in SQL.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "un"),
}


def token_count(text: str = "text") -> Column:
    """Whitespace token count: number of non-empty chunks split on
    runs of whitespace."""
    trimmed = F.trim(F.col(text))
    return F.when(trimmed == "", 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def char_count(text: str = "text") -> Column:
    return F.length(text)


def avg_word_len(text: str = "text") -> Column:
    tc = token_count(text)
    no_space = F.length(F.regexp_replace(F.col(text), r"\s+", ""))
    return F.when(tc > 0, no_space.cast("double") / tc)


def punct_ratio(text: str = "text") -> Column:
    """Punctuation chars / total chars."""
    total = F.length(text)
    punct = total - F.length(F.regexp_replace(F.col(text), r"[.,;:!?'\"()-]", ""))
    return F.when(total > 0, punct.cast("double") / total).otherwise(0.0)


def stopword_hits(lang: str, text: str = "text") -> Column:
    """Count of stopword occurrences (word-boundary matches) for one
    language."""
    total = F.lit(0)
    for wrd in STOPWORDS[lang]:
        # count occurrences of ' wrd ' in padded lowercase text
        padded = F.concat(F.lit(" "), F.lower(F.col(text)), F.lit(" "))
        hits = (
            F.length(padded)
            - F.length(F.regexp_replace(padded, rf"\b{wrd}\b", ""))
        ) / len(wrd)
        total = total + hits.cast("int")
    return total


def quality_score(text: str = "text") -> Column:
    """Heuristic document quality in [0,1]: length band + word-length
    band + punctuation sanity. Deterministic arithmetic, SQL-mirrorable."""
    n = char_count(text)
    awl = F.coalesce(avg_word_len(text), F.lit(0.0))
    pr = punct_ratio(text)
    len_ok = F.when((n >= 100) & (n <= 20000), 0.4).when(n >= 30, 0.2).otherwise(0.0)
    word_ok = F.when((awl >= 3.0) & (awl <= 12.0), 0.3).otherwise(0.0)
    punct_ok = F.when(pr <= 0.2, 0.3).otherwise(0.0)
    return len_ok + word_ok + punct_ok


def fingerprint(text: str = "text") -> Column:
    """Document fingerprint: stable 64-bit hash of normalized text
    (lowercased, whitespace-collapsed) — xxhash64 is Spark-native;
    exact-dedup key."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text))), r"\s+", " ")
    return F.xxhash64(normalized)


def md5_fingerprint(text: str = "text") -> Column:
    """MD5 content hash of normalized text — portable across engines
    (DuckDB md5() matches), used for oracle-checked exact dedup."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text))), r"\s+", " ")
    return F.md5(normalized)


#: GPT-2-style pretokenizer approximation: word / number / punctuation
#: runs.  Identical regex runs on the DuckDB side (regexp_extract_all).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def subword_count(text: str = "text") -> Column:
    """BPE-ish token count: number of word/number/punctuation chunks —
    a deterministic stand-in for a real BPE vocab (the tokenizer itself
    is model-specific and out of engine scope)."""
    return F.size(
        F.regexp_extract_all(F.col(text), F.lit(BPE_ISH_PATTERN), F.lit(0))
    )


def rolling_hash(text: str = "text", base: int = 31, mod: int = 2147483647) -> Column:
    """Polynomial rolling-hash document fingerprint:
    h = Σ h*base + ascii(c) (mod m) over the characters.  Engine-portable
    (DuckDB list_reduce computes the identical value); used as a cheap
    content fingerprint next to md5."""
    return F.aggregate(
        F.split(F.col(text), ""),
        F.lit(7).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


def unigram_lm_nll(docs, text: str = "text"):
    """CCNet-style language-model quality scoring: per-document average
    negative log-likelihood under an add-one-smoothed unigram LM fit on
    the corpus itself.  Low NLL = text made of common tokens (natural
    prose); high NLL = rare-token soup (garbled extraction, boilerplate
    explosions) — the standard perplexity-bucket filter for web-scale
    training data, re-expressed without an external LM.

    Determinism contract (the r2 drift class): the corpus token counts,
    T and V are exact integers; each document folds
    ``k_tok * -ln((c_tok + 1) / (T + V))`` over its DISTINCT tokens in
    canonical token-sorted order via ``F.aggregate`` — a fixed-order
    sequential fold, so the float result is bit-identical to the DuckDB
    oracle's ``list_reduce`` over the same sorted list, with no
    parallel-partial aggregation anywhere in the float's lineage.

    Scale: two keyed shuffles (corpus token counts; per-doc regroup),
    both with map-side combine; the Zipf-head token skew in the
    per-token join is AQE skew-join territory; the totals frame is a
    broadcast single row; the vocabulary is never collected to the
    driver.  Returns (doc_id, n_tokens, nll_sum, avg_nll).
    """
    toks = docs.select("doc_id", F.split(F.lower(F.trim(F.col(text))), r"\s+").alias("t"))
    ex = toks.select("doc_id", F.explode("t").alias("tok"))
    # single explode pass: corpus counts roll up from the per-doc
    # aggregate (sum of exact integer k), not a second scan of ex.
    # per is the LM's whole sufficient statistic and feeds three
    # branches (cnt, tot via cnt, and the arr join); the lazy
    # localCheckpoint materializes it once so the corpus is scanned
    # once — AQE stage reuse alone still left 4 scans in the executed
    # plan.
    per = (
        ex.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=False)
    )
    cnt = per.groupBy("tok").agg(F.sum("k").alias("c"))
    tot = cnt.agg(
        F.sum("c").alias("big_t"), F.count(F.lit(1)).alias("v")
    )
    arr = (
        per.join(cnt, "tok")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("tok", "k", "c"))).alias("a"))
    )
    denom = (F.col("big_t") + F.col("v")).cast("double")
    terms = F.transform(
        "a", lambda s: s["k"] * -F.log((s["c"] + F.lit(1).cast("double")) / denom)
    )
    return (
        arr.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.aggregate(
                F.transform("a", lambda s: s["k"]), F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("n_tokens"),
            F.aggregate(terms, F.lit(0.0), lambda a, x: a + x).alias("nll_sum"),
        )
        .withColumn("avg_nll", F.col("nll_sum") / F.col("n_tokens"))
    )


def bigram_lm_nll(docs, text: str = "text"):
    """Bigram-LM quality scoring: per-document average negative
    log-likelihood under an add-one-smoothed corpus BIGRAM model —
    P(w2|w1) = (c(w1 w2) + 1) / (c(w1·) + V), the order-2 extension of
    `unigram_lm_nll` that penalizes improbable word TRANSITIONS
    (shuffled/garbled text can have a perfectly ordinary unigram
    profile and still light up here — the next quality axis after
    token frequency).

    Same determinism contract as the unigram scorer: all counts are
    exact integers; each document folds
    ``k * -ln((c2 + 1) / (c1 + V))`` over its DISTINCT bigrams in
    canonical bigram-sorted order (F.aggregate, sequential), so the
    float is bit-identical to the oracle's list_reduce.  Documents
    with fewer than two words carry no bigrams and are absent (the
    model is undefined for them; gate them with n_words rules).

    Scale shape: one bigram explode + three keyed aggregations (per
    doc-bigram, corpus bigram, context), all map-side combined; the
    context counts derive from the bigram counts (vocabulary-sized,
    no extra corpus scan); V broadcasts as one row.  Returns
    (doc_id, n_bigrams, nll_sum, avg_nll)."""
    from .corpus import word_ngrams

    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col(text))), r"\s+").alias("t")
    )
    bex = toks.select(
        "doc_id", F.explode(word_ngrams(F.col("t"), 2)).alias("bg")
    )
    per = (
        bex.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=False)
    )
    c2 = per.groupBy("bg").agg(F.sum("k").alias("c2"))
    first = F.element_at(F.split(F.col("bg"), " "), 1)
    c1 = c2.select(first.alias("w1"), "c2").groupBy("w1").agg(
        F.sum("c2").alias("c1")
    )
    uv = (
        toks.select(F.explode("t").alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    arr = (
        per.join(c2, "bg")
        .withColumn("w1", first)
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("bg", "k", "c2", "c1"))
            ).alias("a")
        )
    )
    terms = F.transform(
        "a",
        lambda s: s["k"]
        * -F.log(
            (s["c2"] + F.lit(1).cast("double"))
            / (s["c1"] + F.col("v")).cast("double")
        ),
    )
    return (
        arr.crossJoin(F.broadcast(uv))
        .select(
            "doc_id",
            F.aggregate(
                F.transform("a", lambda s: s["k"]),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).alias("n_bigrams"),
            F.aggregate(terms, F.lit(0.0), lambda a, x: a + x).alias(
                "nll_sum"
            ),
        )
        .withColumn("avg_nll", F.col("nll_sum") / F.col("n_bigrams"))
    )


def dsir_logratio(docs, target, n_buckets: int = 1024, text: str = "text"):
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document
    importance log-weight ``log p_target(x) - log p_raw(x)`` under two
    add-one-smoothed HASHED-unigram bag-of-words models — the target
    model fit on ``target`` (a doc_id frame naming the in-domain
    subset), the raw model fit on the whole corpus.  High weight =
    the document looks like the target distribution; resampling by
    these weights is the paper's recipe for picking pretraining data
    that matches a quality domain.  Hashing tokens into ``n_buckets``
    fixed buckets (the paper's trick) caps both models' parameter
    count regardless of vocabulary size — the scale lever at 100 TB.

    Determinism contract (the r2 drift class): all bucket counts are
    exact integers; each document folds
    ``k_b * (ln((ct_b+1)/(tt+B)) - ln((cr_b+1)/(tr+B)))`` over its
    DISTINCT buckets in canonical bucket-sorted order via
    ``F.aggregate`` — a fixed-order sequential fold, bit-identical to
    the DuckDB oracle's ``list_reduce`` over the same sorted list.

    Scale: one explode pass; per-(doc,bucket) counts are the shared
    sufficient statistic (checkpointed — feeds raw counts, target
    counts and the per-doc regroup); both models are ≤``n_buckets``
    rows; totals broadcast as one row.  No driver materialization.
    Returns (doc_id, n_tokens, logratio).
    """
    from .dedup import portable_token_hash

    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col(text))), r"\s+").alias("t")
    )
    ex = toks.select("doc_id", F.explode("t").alias("tok")).select(
        "doc_id", (portable_token_hash(F.col("tok")) % n_buckets).alias("b")
    )
    per = (
        ex.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=False)
    )
    raw = per.groupBy("b").agg(F.sum("k").alias("cr"))
    tgt = (
        per.join(target.select("doc_id"), "doc_id")
        .groupBy("b")
        .agg(F.sum("k").alias("ct"))
    )
    cnt = (
        raw.join(tgt, "b", "left")
        .select("b", "cr", F.coalesce("ct", F.lit(0).cast("long")).alias("ct"))
        .localCheckpoint(eager=False)
    )
    tot = cnt.agg(F.sum("cr").alias("tr"), F.sum("ct").alias("tt"))
    arr = (
        per.join(cnt, "b")
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("b", "k", "ct", "cr"))).alias("a")
        )
    )
    big_b = F.lit(n_buckets).cast("long")
    terms = F.transform(
        "a",
        lambda s: s["k"]
        * (
            F.log(
                (s["ct"] + F.lit(1).cast("double"))
                / (F.col("tt") + big_b).cast("double")
            )
            - F.log(
                (s["cr"] + F.lit(1).cast("double"))
                / (F.col("tr") + big_b).cast("double")
            )
        ),
    )
    return arr.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        F.aggregate(
            F.transform("a", lambda s: s["k"]),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("n_tokens"),
        F.aggregate(terms, F.lit(0.0), lambda a, x: a + x).alias("logratio"),
    )


def gumbel_noise(key: Column, seed: str = "g1") -> Column:
    """Seeded, ENGINE-PORTABLE standard Gumbel(0,1) draw per row:
    u = (first 13 md5 hex digits of '<seed>:<key>' + 0.5) / 2^52 — a
    52-bit uniform strictly inside (0,1), exactly representable as a
    double on both engines (the JL-sign-matrix md5 trick) — then the
    inverse-CDF transform  -ln(-ln(u)).  DuckDB derives the identical
    value via ('0x' || substr(md5(...), 1, 13))::BIGINT, so
    Gumbel-perturbed scores hash-check exactly."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4503599627370496.0)  # 2^52
    return -F.log(-F.log(u))


def dsir_gumbel_topk(
    docs,
    target,
    k: int = 50,
    seed: str = "g1",
    n_buckets: int = 1024,
    text: str = "text",
):
    """DSIR SAMPLED selection — the paper's actual resampling step
    (Xie et al. 2023 resample by importance weight, not rank): via the
    Gumbel-top-k identity, taking the top ``k`` of
    ``logweight_i + Gumbel_i`` draws k documents WITHOUT replacement
    with probability proportional to exp(logweight_i) — one ordered
    selection instead of sequential sampling, which is what makes the
    sampler distributed-friendly.  The Gumbel draws are seeded and
    hash-derived (`gumbel_noise`), so the "random" sample is
    deterministic, engine-portable, and reproducible run-to-run — a
    property the paper's np.random sampler does not have and a 100 TB
    rerun needs.

    The deterministic top-k face (`dsir_select` in plans/llm_q.py)
    keeps the argmax documents; this tier trades peak weight for
    diversity exactly as importance resampling prescribes.  Scale
    shape: per-row noise on the scored frame, then one rank — Catalyst
    compiles the rank-filter to TakeOrderedAndProject, no
    single-partition window (the dsir_select precedent).

    Returns (doc_id, n_tokens, gumbel_key, sel_rank), membership
    decided on the 6dp-rounded perturbed key with doc_id tie-break so
    the cut never hangs on an unrounded ulp."""
    from pyspark.sql import Window

    s = dsir_logratio(docs, target, n_buckets, text)
    keyed = s.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.col("logratio") + gumbel_noise(F.col("doc_id"), seed), 6
        ).alias("gumbel_key"),
    )
    w = Window.orderBy(F.desc("gumbel_key"), "doc_id")
    return (
        keyed.withColumn("sel_rank", F.row_number().over(w))
        .filter(F.col("sel_rank") <= k)
    )


def source_kl_divergence(docs, n_buckets: int = 1024, text: str = "text"):
    """Per-source KL divergence from the corpus token distribution:
    KL(p_source || p_corpus) over hashed unigram buckets (the DSIR
    model family's fixed-parameter trick) — the dataset DRIFT
    diagnostic beside the MinHash overlap matrix: overlap says two
    sources share content, KL says a source's token MIX deviates from
    the corpus (over-represented boilerplate, different language
    register, template floods).  High-KL sources are reweighting /
    inspection candidates in mixture design.

    No smoothing is needed: every bucket a source touches is by
    definition touched by the corpus (c_b >= k_b > 0), so q_b > 0
    wherever p_b > 0 and the KL sum is finite.

    Determinism contract: all bucket counts are exact integers; each
    source folds (k_b/ts) * ln((k_b/ts) / (c_b/T)) over its touched
    buckets in canonical bucket-sorted order via ``F.aggregate`` —
    the lm_quality fixed-order-fold pattern, bit-identical to the
    DuckDB oracle's list_reduce over the same sorted list.

    Scale: one explode pass; per-(source, bucket) counts are the
    sufficient statistic (checkpointed — feeds the corpus rollup and
    the per-source regroup); the fold arrays are <= n_buckets entries
    per source.  Returns (source, n_tokens, kl)."""
    from .dedup import portable_token_hash

    ex = docs.select(
        "source",
        F.explode(
            F.split(F.lower(F.trim(F.col(text))), r"\s+")
        ).alias("tok"),
    ).select("source", (portable_token_hash(F.col("tok")) % n_buckets).alias("b"))
    per = (
        ex.groupBy("source", "b")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=False)
    )
    cnt = per.groupBy("b").agg(F.sum("k").alias("c"))
    tot = cnt.agg(F.sum("c").alias("big_t"))
    arr = (
        per.join(cnt, "b")
        .groupBy("source")
        .agg(
            F.sort_array(F.collect_list(F.struct("b", "k", "c"))).alias("a")
        )
    )
    ts = F.aggregate(
        F.transform("a", lambda s: s["k"]),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    keyed = arr.crossJoin(F.broadcast(tot)).select(
        "source", "a", "big_t", ts.alias("n_tokens")
    )
    terms = F.transform(
        "a",
        lambda s: (s["k"].cast("double") / F.col("n_tokens"))
        * F.log(
            (s["k"].cast("double") / F.col("n_tokens"))
            / (s["c"].cast("double") / F.col("big_t"))
        ),
    )
    return keyed.select(
        "source",
        "n_tokens",
        F.aggregate(terms, F.lit(0.0), lambda a, x: a + x).alias("kl"),
    )

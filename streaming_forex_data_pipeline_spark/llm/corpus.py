"""Corpus-preparation operators for LLM-training-data pipelines.

Beyond per-document text stats (`llm/text.py`) and near-dup removal
(`llm/dedup.py`), a training-data pipeline needs corpus-level hygiene:

- **repetition signals** (Gopher-style): duplicate-word fraction,
  most-frequent-word fraction, most-frequent-bigram fraction — the
  classic "templated / boilerplate document" detectors;
- **deterministic dataset splits**: content-hash bucketing into
  train/validation/test that is stable across runs, engines, and
  cluster sizes (no RNG, no row order dependence);
- **stratified sampling**: a deterministic per-stratum top-k by
  portable hash, for building eval slices per language/source;
- **benchmark decontamination**: word-n-gram overlap of every corpus
  document against a held-out benchmark set, so test data can be
  excised from training corpora.

Everything is pure Column algebra (no Python UDFs): one explode +
shuffled aggregation for the repetition counters, a broadcast-joined
benchmark n-gram set for decontamination, and narrow projections for
the split assignment.  All hash arithmetic uses the engine-portable
md5-hex-prefix trick (`('0x'||substr(md5(x),1,15))::BIGINT` on the
DuckDB side) so every query here is exactly hash-checkable.

Scale notes (100 TB documents table):
- repetition stats shuffle on (doc_id, gram) then (doc_id) — both keys
  are high-cardinality and unskewed by construction;
- the benchmark n-gram set is small by definition (benchmarks are
  thousands of documents, not billions) — broadcast it;
- split assignment is a narrow map stage: zero shuffles, and the
  bucket is a pure function of doc_id so re-runs on different
  partitionings agree row-for-row;
- stratified sampling windows partition by the stratum: strata
  (languages/sources) are the parallel axis; a single giant stratum
  degrades to one task per stratum, the same sanctioned shape as the
  per-symbol indicator kernels (SURVEY §2.13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def words_array(text: str = "text") -> Column:
    """Lowercased whitespace word array (keeps duplicates — repetition
    counters need multiplicity, unlike dedup's `token_set`)."""
    return F.split(F.lower(F.trim(F.col(text))), r"\s+")


def word_ngrams(words: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; empty array when the
    document has fewer than ``n`` words.  Pure `transform(sequence)`
    algebra — the DuckDB mirror is
    ``list_transform(range(1, len(ws)-(n-2)), i -> ws[i]||' '||...)``,
    where DuckDB's ``range()`` already returns an EMPTY list when
    stop <= start, so only the Spark side needs the explicit short-
    document guard below (oracles that iterate a range Spark-side, like
    the contamination check, instead wrap theirs in ``greatest(...)``).

    Why Spark needs it: ``sequence(1, 0)`` yields a DESCENDING
    ``[1, 0]`` (step defaults to -1 when start > stop), and
    ``element_at(_, 0)`` is an ANSI error — so a (n-1)-word document
    would crash, not produce an empty array, without the ``when``."""
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(docs: DataFrame, text: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document.

    Returns (doc_id, n_words, dup_word_frac, top_word_frac,
    top_bigram_frac):

    - ``dup_word_frac``  = 1 − |distinct words| / |words|
    - ``top_word_frac``  = occurrences of the modal word / |words|
    - ``top_bigram_frac``= occurrences of the modal bigram / |bigrams|
      (0.0 for single-word documents)

    High values flag templated/boilerplate documents that near-dup
    passes miss because each instance is unique.

    Plan shape: unigrams and bigrams are tagged and exploded in ONE
    Generate, so the whole operator is a single scan + two shuffled
    aggregations (by (doc_id, gram-kind, gram), then by doc_id) with
    map-side partial counts.  The final per-kind pivot is a plain
    conditional aggregation — no join between separately-built unigram
    and bigram frames, hence no third shuffle.

    Reference scope note: the reference pipeline has no corpus-hygiene
    stage; this extends it with the standard quality signals from
    Rae et al. 2021 (Gopher), §A1.1 repetition filters.
    """
    ws = words_array(text)
    tagged = F.concat(
        F.transform(
            ws, lambda w: F.struct(F.lit(0).alias("g"), w.alias("gram"))
        ),
        F.transform(
            word_ngrams(ws, 2),
            lambda b: F.struct(F.lit(1).alias("g"), b.alias("gram")),
        ),
    )
    ex = docs.select("doc_id", F.explode(tagged).alias("t")).select(
        "doc_id", F.col("t.g").alias("g"), F.col("t.gram").alias("gram")
    )
    per_gram = ex.groupBy("doc_id", "g", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_kind = per_gram.groupBy("doc_id", "g").agg(
        F.max("c").alias("top_c"),
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("n_distinct"),
    )

    def kind(g: int, col: str) -> Column:
        return F.max(F.when(F.col("g") == g, F.col(col)))

    return per_kind.groupBy("doc_id").agg(
        kind(0, "total").alias("n_words"),
        F.round(
            F.lit(1.0) - kind(0, "n_distinct").cast("double") / kind(0, "total"),
            6,
        ).alias("dup_word_frac"),
        F.round(
            kind(0, "top_c").cast("double") / kind(0, "total"), 6
        ).alias("top_word_frac"),
        F.round(
            F.coalesce(
                kind(1, "top_c").cast("double") / kind(1, "total"), F.lit(0.0)
            ),
            6,
        ).alias("top_bigram_frac"),
    )


def portable_bucket(key: Column, salt: str, n_buckets: int) -> Column:
    """Deterministic engine-portable hash bucket in [0, n_buckets):
    the first 60 bits of md5(salt || key) — DuckDB computes the
    identical value via ``('0x'||substr(md5(salt||key),1,15))::BIGINT``.
    Stable across runs, partitionings, and engines; the salt decouples
    independent uses (split vs sample) so they don't correlate."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % n_buckets


def assign_split(
    docs: DataFrame,
    key: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/validation/test assignment by content-hash
    bucket.  A document's split is a pure function of its key: adding
    or removing other rows never reshuffles assignments (critical for
    incremental corpus builds — yesterday's training doc can't silently
    migrate into today's test set).  Narrow map stage, zero shuffles."""
    bucket = portable_bucket(F.col(key), "split:", 100)
    return docs.withColumn("bucket", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "validation")
        .otherwise("test"),
    )


def stratified_sample(
    docs: DataFrame, strata: str = "lang", k: int = 5, key: str = "doc_id"
) -> DataFrame:
    """Deterministic per-stratum sample: the k documents with the
    smallest portable hash inside each stratum.  Equivalent to uniform
    sampling without replacement, but reproducible across engines and
    cluster layouts.  Window partitions by the stratum — strata are the
    parallel axis (documented degenerate case: one giant stratum =
    one task, SURVEY §2.13)."""
    hkey = portable_bucket(F.col(key), "sample:", 1 << 40)
    w = Window.partitionBy(strata).orderBy(hkey.asc(), F.col(key).asc())
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def contamination(
    docs: DataFrame,
    benchmark_filter: Column,
    text: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: word-``n``-gram overlap of every
    corpus document against the benchmark subset.

    Returns (doc_id, n_ngrams, n_matched, contamination) for corpus
    (non-benchmark) documents with at least ``n`` words, where
    ``contamination`` = |doc's distinct n-grams ∩ benchmark n-grams|
    / |doc's distinct n-grams|.  Training pipelines drop or flag docs
    above a threshold before the benchmark leaks into the model.

    Plan shape: per-doc n-gram sets are deduped with `array_distinct`
    BEFORE the explode (no shuffle spent on distinct), the benchmark
    n-gram set is aggregated once and broadcast (benchmarks are small
    by definition), and the per-doc aggregation is the only shuffle on
    the 100 TB side.
    """
    ws = words_array(text)
    grams = docs.select(
        "doc_id",
        benchmark_filter.alias("is_bench"),
        F.explode(F.array_distinct(word_ngrams(ws, n))).alias("gram"),
    )
    bench = (
        grams.filter(F.col("is_bench"))
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = grams.filter(~F.col("is_bench"))
    return (
        corpus.join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("hit").alias("n_matched"),
            F.round(
                F.count("hit").cast("double") / F.count(F.lit(1)), 6
            ).alias("contamination"),
        )
    )


def source_mix(
    docs: DataFrame,
    targets: dict[str, float],
    text: str = "text",
    source: str = "source",
    key: str = "doc_id",
) -> DataFrame:
    """Mixture reweighting (the Pile/Dolma "data mixing" stage): given
    target weights per source, compute each source's token share and a
    deterministic downsampling rate that moves the corpus toward the
    target mixture, then report kept docs/tokens per source.

    Rates scale to the binding source: raw_rate = target_share /
    actual_share, normalized so the largest becomes exactly 1 (no
    upsampling — the over-target source keeps everything, the rest
    shed proportionally).  Selection is a pure function of the doc key
    via the portable md5 bucket, so reruns and cluster layouts keep the
    identical documents — the same no-reshuffle property as
    ``assign_split``.

    Determinism: doc/token counts are exact integers; weights are
    literals; share/rate arithmetic is per-row over a ~|sources|-row
    aggregate (no parallel float partials); the keep threshold is
    floor(rate * 1e6) compared against an integer bucket.

    Scale: one token-count aggregation over the corpus (map-side
    combined), a broadcast join of the tiny per-source rate table back
    onto the docs, one re-aggregation of the kept set.  |sources| is
    hundreds at most; the rate table always broadcasts.
    """
    from .text import token_count

    w_total = float(sum(targets.values()))
    w_map = F.create_map(
        *[x for s, w in sorted(targets.items()) for x in (F.lit(s), F.lit(w / w_total))]
    )
    # corpus totals and the binding-source peak are windows over the
    # tiny per-source frame (|sources| rows; the unpartitioned window's
    # single task is bounded by that), keeping the whole rate
    # derivation one linear chain instead of crossJoined re-aggregates
    # that re-scan the corpus per branch.  The integer window sum is
    # order-exact; max is order-exact.  The lazy checkpoint lets the
    # broadcast-join branch and the final summary join share ONE
    # materialization — two corpus scans total (count pass + filter
    # pass), the minimum for a fit-then-apply operator.
    w_all = Window.partitionBy()
    stats = docs.groupBy(source).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text)).alias("n_tokens"),
    )
    rated = (
        stats.withColumn(
            "share", F.col("n_tokens") / F.sum("n_tokens").over(w_all)
        )
        .withColumn("w", w_map[F.col(source)])
        .withColumn("raw_rate", F.col("w") / F.col("share"))
        .withColumn(
            "rate", F.col("raw_rate") / F.max("raw_rate").over(w_all)
        )
        .withColumn("thr", F.floor(F.col("rate") * F.lit(1_000_000)))
        .localCheckpoint(eager=False)
    )
    kept = (
        docs.join(
            F.broadcast(rated.select(source, "thr")), source
        )
        .filter(portable_bucket(F.col(key), "mix:", 1_000_000) < F.col("thr"))
        .groupBy(source)
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum(token_count(text)).alias("kept_tokens"),
        )
    )
    return (
        rated.join(kept, source, "left")
        .select(
            source,
            "n_docs",
            "n_tokens",
            F.round("share", 6).alias("share"),
            F.round("rate", 6).alias("rate"),
            F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
        )
    )


def quality_gate(docs: DataFrame, text: str = "text") -> DataFrame:
    """Dolma-style per-document filter decision table: evaluate the
    Gopher/C4 rule battery and emit the attributes PLUS the decision
    and machine-readable reason codes, so downstream stages (and
    audits) see WHY a document was dropped, not just that it vanished.

    Rules (thresholds on the 6dp-rounded attributes, so the comparison
    sees bit-identical values on both engines):

    - ``too_short``       n_words  < 20
    - ``too_long``        n_words  > 1000
    - ``dup_words``       dup_word_frac > 0.6
    - ``top_word``        top_word_frac > 0.15
    - ``word_len``        avg_word_len outside [2, 10]

    Returns (doc_id, n_words, dup_word_frac, top_word_frac,
    avg_word_len, reasons, keep) — ``reasons`` is the comma-joined
    failed-rule list in the fixed order above ('' when clean),
    ``keep`` = no rule failed.

    Plan: repetition_stats' single Generate + two keyed aggregations,
    one broadcast-free join back to the per-row attributes on doc_id,
    then pure row arithmetic.  Reference scope: the reference's
    validation (`data_quality.py`) gates candles, not text; the rule
    set here is the Rae et al. 2021 §A1.1 / Raffel et al. 2020 C4
    battery adapted to attribute thresholds.
    """
    from .text import avg_word_len

    # NULL text would vanish from repetition_stats (explode of a NULL
    # array emits nothing) and thus from the inner join below, while
    # the streaming face would emit it with NULL attributes — coalesce
    # to '' so a NULL-text document is gated as too_short identically
    # in both variants.
    docs = docs.withColumn(text, F.coalesce(F.col(text), F.lit("")))
    rep = repetition_stats(docs, text=text)
    base = docs.select(
        "doc_id",
        F.round(F.coalesce(avg_word_len(text), F.lit(0.0)), 6).alias(
            "avg_word_len"
        ),
    )
    j = base.join(rep, "doc_id")
    rules = [
        ("too_short", F.col("n_words") < 20),
        ("too_long", F.col("n_words") > 1000),
        ("dup_words", F.col("dup_word_frac") > 0.6),
        ("top_word", F.col("top_word_frac") > 0.15),
        (
            "word_len",
            (F.col("avg_word_len") < 2.0) | (F.col("avg_word_len") > 10.0),
        ),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(code)) for code, cond in rules]
    )
    return j.select(
        "doc_id",
        "n_words",
        "dup_word_frac",
        "top_word_frac",
        "avg_word_len",
        reasons.alias("reasons"),
        (reasons == "").alias("keep"),
    )


def _ntile_bin(rn, n, k: int):
    """SQL-standard NTILE(k) rank-to-bin algebra on (global rank 1..n,
    total n): the first n%k bins get one extra row.  ONE definition
    shared by the global and grouped exact NTILEs — the bin boundary
    and div-by-zero guards must never drift between them
    (review-found duplication)."""
    q = F.call_function("div", n, F.lit(k))
    r = (n % k).cast("long")
    cut = r * (q + 1)  # ranks 1..cut live in the (q+1)-sized bins
    return F.when(
        rn <= cut,
        F.call_function("div", rn - 1, F.greatest(q + 1, F.lit(1))) + 1,
    ).otherwise(
        r + F.call_function("div", rn - cut - 1, F.greatest(q, F.lit(1))) + 1
    )


def exact_ntile(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    out_col: str = "bin",
    partitions: int = 32,
) -> DataFrame:
    """Distributed EXACT NTILE over a total order — without the
    single-partition global window a naive ``ntile().over(orderBy)``
    costs (which serializes the whole corpus through one task).

    Construction (the `llm/packing.py doc_offsets` two-level pattern,
    applied to ranks instead of token offsets): range-repartition on
    ``order_cols`` (Spark's RangePartitioner gives ordered, disjoint
    partitions), per-partition local row_number (each partition is its
    own window task), per-partition counts -> exclusive prefix offsets
    over the TINY #partitions-row frame, then global_rank = offset +
    local rank.  The SQL-standard NTILE arithmetic (first n%k bins get
    one extra row) is then per-row integer algebra on (rank, N).

    ``order_cols`` must be a TOTAL order (append a unique id as the
    last column) or ranks at partition boundaries would be
    nondeterministic.

    The ranged frame is lazily checkpointed (r14): FOUR consumers
    read it (local ranks, the counts aggregate feeding both tiny
    broadcast frames, and the final rejoin), and because ``__pid`` is
    non-deterministic Catalyst can never prove the subtrees equal —
    without the cut each broadcast build re-evaluated the ENTIRE
    upstream plan, which compounds exponentially when ntile stages
    chain (rfm_segments' three chained quartiles re-scanned events
    108 times; one pass per stage after the cut).  eager=False: the
    first broadcast build materializes it, no separate job."""
    from pyspark.sql import Window

    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(partitions, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_loc = Window.partitionBy("__pid").orderBy(*cols)
    local = ranged.withColumn("__lrn", F.row_number().over(w_loc))
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = counts.select(
        "__pid",
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
    )
    tot = counts.agg(F.sum("__c").alias("__n"))
    rn = (F.col("__off") + F.col("__lrn")).cast("long")
    bin_col = _ntile_bin(rn, F.col("__n"), k)
    return (
        local.join(F.broadcast(offs), "__pid")
        .crossJoin(F.broadcast(tot))
        .withColumn(out_col, bin_col.cast("int"))
        .drop("__pid", "__lrn", "__off", "__n")
    )


def exact_ntile_by(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    k: int,
    out_col: str = "bin",
    partitions: int = 32,
    broadcast_frames: bool = True,
) -> DataFrame:
    """GROUPED distributed exact NTILE: `exact_ntile`'s two-level rank
    construction with the group key threaded through every level —
    SQL's ``NTILE(k) OVER (PARTITION BY group ORDER BY ...)`` without
    either a single-partition global window OR one sort task per
    group holding that group's entire history (the same power-law
    wall sessionize hit: a hot group's quantiles would serialize
    through one task).

    Range-repartition on (group, order) keeps each group's rows
    contiguous across ordered partitions; per-(partition, group)
    local row_numbers are each bounded by a partition slice, and ALL
    cross-partition state is the (#partitions x #groups) count/offset
    frame plus the #groups totals.

    Parameter contract (round-9 ADVICE): ``broadcast_frames=True`` —
    the default, and what `value_deciles` uses for its handful of
    event types — broadcasts both frames, which is only "tiny" while
    #groups stays small (thousands, not millions; the frames are
    #partitions x #groups rows).  For a HIGH-CARDINALITY group key
    pass ``broadcast_frames=False``: the rejoins then run as ordinary
    shuffle hash joins on (partition, group) / (group), which scale
    with the group count instead of growing an unbounded driver-side
    broadcast.  ``order_cols`` must total-order within a group
    (append a unique id last)."""
    from pyspark.sql import Window

    gcols = [F.col(c) for c in group_cols]
    ocols = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(partitions, *gcols, *ocols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_loc = Window.partitionBy("__pid", *group_cols).orderBy(*ocols)
    local = ranged.withColumn("__lrn", F.row_number().over(w_loc))
    counts = local.groupBy("__pid", *group_cols).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the rejoins use NULL-SAFE equality on the group key: SQL's
    # PARTITION BY keeps a NULL partition, and a plain equi-join here
    # would silently drop every NULL-group row instead (review-found)
    offs = counts.select(
        F.col("__pid").alias("__pid_r"),
        *[F.col(c).alias(f"__gr_{c}") for c in group_cols],
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
    )
    tot = counts.groupBy(*group_cols).agg(
        F.sum("__c").alias("__n")
    ).select(
        *[F.col(c).alias(f"__gt_{c}") for c in group_cols], "__n"
    )
    off_cond = F.col("__pid") == F.col("__pid_r")
    tot_cond = F.lit(True)
    for c in group_cols:
        off_cond = off_cond & F.col(c).eqNullSafe(F.col(f"__gr_{c}"))
        tot_cond = tot_cond & F.col(c).eqNullSafe(F.col(f"__gt_{c}"))
    rn = (F.col("__off") + F.col("__lrn")).cast("long")
    bin_col = _ntile_bin(rn, F.col("__n"), k)
    if broadcast_frames:
        offs, tot = F.broadcast(offs), F.broadcast(tot)
    return (
        local.join(offs, off_cond)
        .join(tot, tot_cond)
        .withColumn(out_col, bin_col.cast("int"))
        .drop(
            "__pid", "__pid_r", "__lrn", "__off", "__n",
            *[f"__gr_{c}" for c in group_cols],
            *[f"__gt_{c}" for c in group_cols],
        )
    )


def curriculum_bins(docs: DataFrame, k: int = 4, text: str = "text") -> DataFrame:
    """Perplexity-curriculum binning: quantile buckets of the corpus by
    unigram-LM average NLL (CCNet's head/middle/tail generalized to
    ``k`` bins) with per-bin document and token mass — the statistic a
    curriculum or quality-mixing schedule consumes.

    Exact integer micro-nats order the documents (ties broken by
    doc_id — a total order, so the binning is deterministic), ranked by
    `exact_ntile` (distributed, no single-partition sort).  Returns
    (bin, n_docs, n_tokens, min_nll_micro, max_nll_micro)."""
    from .text import unigram_lm_nll

    s = unigram_lm_nll(docs, text=text)
    scored = s.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("avg_nll") * 1000000).cast("long").alias("nll_micro"),
    )
    binned = exact_ntile(scored, ["nll_micro", "doc_id"], k)
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("nll_micro").alias("min_nll_micro"),
            F.max("nll_micro").alias("max_nll_micro"),
        )
        .orderBy("bin")
    )


def temperature_mixture(
    docs: DataFrame,
    budget: int = 1_000_000,
    text: str = "text",
) -> DataFrame:
    """Temperature-weighted source mixture with EXACT largest-remainder
    token-budget apportionment (the XLM-R / multilingual-sampling
    pattern at alpha = 0.5): per source, weight = sqrt(token mass)
    renormalized, then ``budget`` tokens split as floor shares plus
    one extra token-quantum for the largest fractional remainders so
    the allocations sum exactly to ``budget``.

    Determinism/portability contract: alpha is FIXED at 0.5 because
    IEEE sqrt is correctly rounded on every engine, while pow(x, a)
    for general a differs in the last ulp between libm
    implementations — and the sqrt-of-integer-token-count form avoids
    dividing by the corpus total before weighting (same normalized
    shares, one fewer float op).  The weight normalizer folds the
    per-source sqrt terms in source-sorted order (the lm_quality
    fixed-order-fold pattern), so every double here is bit-identical
    across engines and the floor/remainder apportionment hash-checks
    exactly.

    Scale shape: one per-source aggregation (map-side combined), then
    all arithmetic on the tiny per-source frame; the sorted-fold
    normalizer and remainder ranking cost O(#sources log #sources) in
    one task — #sources is a catalog, not a corpus, dimension."""
    from .text import token_count

    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        # coalesce: a source whose documents ALL have NULL text sums to
        # NULL, and one NULL sqrt term would poison the fixed-order fold
        # below, nulling W (and hence weight/alloc) for EVERY source —
        # coalesce to 0 so a degenerate source just gets weight 0.
        F.coalesce(
            F.sum(token_count(text).cast("long")), F.lit(0).cast("long")
        ).alias("n_tokens"),
    )
    # fixed-order fold of sqrt weights: collect the (source, sqrt) pairs,
    # sort by source, fold left-to-right — aggregation-order-proof
    wsum = per.select(
        F.struct("source", F.sqrt(F.col("n_tokens")).alias("w")).alias("sw")
    ).agg(
        F.aggregate(
            F.array_sort(F.collect_list("sw")),
            F.lit(0.0),
            lambda acc, s: acc + s["w"],
        ).alias("W")
    )
    scored = per.crossJoin(F.broadcast(wsum)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.sqrt(F.col("n_tokens")) / F.col("W")).alias("q"),
    )
    exact = F.lit(float(budget)) * F.col("q")
    based = scored.select(
        "source",
        "n_docs",
        "n_tokens",
        "q",
        F.floor(exact).cast("long").alias("base"),
        (exact - F.floor(exact)).alias("rem"),
    )
    deficit = based.agg(
        (F.lit(budget) - F.sum("base")).cast("long").alias("deficit")
    )
    w = Window.orderBy(F.desc("rem"), F.asc("source"))
    return (
        based.crossJoin(F.broadcast(deficit))
        .withColumn("__rk", F.row_number().over(w))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("q", 6).alias("weight"),
            (
                F.col("base")
                + F.when(F.col("__rk") <= F.col("deficit"), 1).otherwise(0)
            ).cast("long").alias("alloc_tokens"),
        )
        .orderBy("source")
    )


def mixture_apply(
    docs: DataFrame, budget: int = 10_000, text: str = "text"
) -> DataFrame:
    """Materialize the temperature mixture (round 12): the transform a
    pipeline actually feeds downstream of `temperature_mixture`'s
    allocation table — per source, documents are taken in doc_id
    order while the running token total BEFORE the document is under
    the source's allocation (greedy fill: the crossing document is
    included, so every positive allocation is met on its first
    crossing; a zero allocation selects nothing).  Deterministic by
    construction — no RNG, total order per source.

    Returns (doc_id, source, n_tokens, cum_tokens), cum_tokens the
    inclusive running total that crossed (or stayed under) the
    allocation.

    Scale shape: the allocation frame is catalog-sized and
    broadcasts; the cumulative sum is one window per source (the
    parallel axis); one corpus scan end to end."""
    from .text import token_count

    alloc = temperature_mixture(docs, budget=budget, text=text).select(
        "source", "alloc_tokens"
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = docs.select(
        "doc_id", "source", token_count(text).cast("long").alias("n_tokens")
    )
    cum = toks.withColumn(
        "cum_before",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
    )
    return (
        cum.join(F.broadcast(alloc), "source")
        .filter(F.col("cum_before") < F.col("alloc_tokens"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (F.col("cum_before") + F.col("n_tokens"))
            .cast("long")
            .alias("cum_tokens"),
        )
    )


def _ares_keyed(docs, seed: str, weight_col: str | None, id_col: str):
    """Shared A-Res key construction for the global and per-group
    reservoir faces: seeded engine-portable md5 uniform
    u = (first 13 hex digits + 0.5)/2^52, key = ln(u)/w UNROUNDED
    (ranking on a display-rounded key collapses large weights — the
    round-7 finding; one definition here so the two faces can never
    diverge).  Excludes rows with NULL/non-positive weight."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4503599627370496.0)  # 2^52
    w = F.lit(1.0) if weight_col is None else F.col(weight_col).cast("double")
    return docs.filter(w > 0).select(
        "*", (F.log(u) / w).alias("res_key_raw")
    )


def weighted_reservoir_sample(
    docs,
    k: int = 50,
    weight_col: str | None = None,
    seed: str = "res1",
    id_col: str = "doc_id",
    keep_raw: bool = False,
):
    """Distributed weighted reservoir sampling without replacement
    (Efraimidis & Spirakis 2006, A-Res): each row draws a seeded
    uniform u and keeps key = ln(u)/w (the log form of u^(1/w) —
    monotone-identical ranking, no pow drift between libms); the
    sample IS the k largest keys.  With ``weight_col`` None every row
    weighs 1 and this degrades to a uniform reservoir sample.

    This is THE shard-sampling primitive for training pipelines: the
    key is a pure per-row function, so the "reservoir" needs no
    sequential pass — it is a global top-k, which Spark executes as
    per-partition partial top-k + a k-row merge (TakeOrderedAndProject)
    and a streaming ingest maintains by keeping the k best keys seen
    (max-merge across micro-batches, same law as the sketch channels).

    The uniforms are the engine-portable md5 draws (`llm/text.py:
    gumbel_noise`'s construction): u = (first 13 hex digits of
    md5('<seed>:<id>') + 0.5)/2^52, so the sample is deterministic,
    reproducible, and DuckDB derives the identical ranking — a seeded
    rerun of a 100 TB sampling job picks the same rows.

    Rows with NULL or non-positive weight are EXCLUDED (A-Res is
    defined for w > 0).  Returns the sampled rows with (res_key,
    sample_rank) appended.  Membership is decided on the UNROUNDED
    key with id tie-break; the exported ``res_key`` is rounded to 6dp
    for display/oracle parity only.  Ranking on the raw double is
    essential: the key magnitude scales as 1/w, so any fixed decimal
    rounding collapses realistic weights (n_chars ~1e4-1e6) into ties
    and degenerates the sample into an id-ordered pick — the
    round-7 ADVICE finding.  ``keep_raw=True`` additionally returns
    the unrounded key as ``res_key_raw`` (the streaming channel's
    merge state, so cross-batch re-ranking never re-ranks on the
    display-rounded key)."""
    from pyspark.sql import Window

    keyed = _ares_keyed(docs, seed, weight_col, id_col)
    win = Window.orderBy(F.desc("res_key_raw"), F.asc(id_col))
    out = (
        keyed.withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= k)
        .withColumn("res_key", F.round("res_key_raw", 6))
    )
    if keep_raw:
        return out
    return out.drop("res_key_raw")


def weighted_reservoir_sample_by_group(
    docs,
    group_col: str,
    k: int = 5,
    weight_col: str | None = None,
    seed: str = "res1",
    id_col: str = "doc_id",
):
    """Stratified A-Res: an independent weighted reservoir of size k
    PER GROUP (per source, per language, per shard) — the sampling
    face of stratification, where `weighted_reservoir_sample` is the
    global face.  Identical key construction (ln(u)/w on the seeded
    md5 uniform, ranked UNROUNDED — the round-7 lesson), but the
    row_number window partitions by the group, so Spark runs one
    group-keyed exchange and per-group heaps instead of a global
    top-k: no single-partition anything, and adding a group never
    perturbs another group's sample (the uniforms depend only on
    (seed, id)).  Exported res_key is display-rounded like the
    global face."""
    from pyspark.sql import Window

    keyed = _ares_keyed(docs, seed, weight_col, id_col)
    win = Window.partitionBy(group_col).orderBy(
        F.desc("res_key_raw"), F.asc(id_col)
    )
    return (
        keyed.withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= k)
        .withColumn("res_key", F.round("res_key_raw", 6))
        .drop("res_key_raw")
    )


def histogram_sketch(
    docs,
    value_col: str = "n_chars",
    lo: float = 0.0,
    hi: float = 1000.0,
    n_bins: int = 50,
):
    """Fixed-bin histogram sketch of a numeric column: ``n_bins``
    uniform bins over [lo, hi) plus an underflow bin (-1) and an
    overflow bin (n_bins) — the bounded-state RANK sketch completing
    the streaming-sketch triad (CMS = frequency, HLL = cardinality,
    histogram = rank/quantile).  The COMPLETE bin spine is emitted
    (untouched bins read 0), so output is always exactly n_bins+2
    rows; sketches over disjoint streams merge by bin-wise SUM (the
    same delta-log merge the CMS channel uses).

    Exact-integer contract: the bin index is floor arithmetic on the
    value, counts are exact longs — no floats until a consumer
    interpolates.  One keyed count (map-side combined) at any corpus
    size; the spine join is bins-sized."""
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    binned = (
        F.when(v < F.lit(lo), F.lit(-1))
        .when(v >= F.lit(hi), F.lit(n_bins))
        .otherwise(F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"))
    )
    touched = (
        docs.filter(v.isNotNull())
        .select(binned.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    spine = (
        docs.sparkSession.range(-1, n_bins + 1)
        .select(F.col("id").cast("int").alias("bin"))
    )
    return spine.join(touched, "bin", "left").select(
        "bin", F.coalesce("c", F.lit(0).cast("long")).alias("c")
    )


def histogram_quantiles(
    sketch,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    lo: float = 0.0,
    hi: float = 1000.0,
    n_bins: int = 50,
):
    """Estimate quantiles from a `histogram_sketch`: for each q, find
    the first bin whose cumulative count reaches ceil(q*N) and
    linearly interpolate inside it — the classic bounded-state
    quantile estimate (error <= one bin width), the scale-path
    alternative to the EXACT distributed NTILE (`curriculum_bins` /
    `length_quantiles`): exact ranks need a full sort/range-exchange
    per run, the sketch needs n_bins integers and merges across
    streams.

    Determinism contract: target rank uses exact-integer ceil via
    ``floor + sign`` arithmetic... in fact ceil(q*N) is computed as a
    double multiply then ceil — q and N are exactly representable and
    the products here are far from half-ulp boundaries for the fixed
    registered q values; the interpolation is two float ops per OUTPUT
    row (#qs rows) from exact-integer cum counts, no aggregation-order
    freedom.  Under/overflow bins carry no width, so a target landing
    there clamps to lo/hi.

    The cumulative walk is a window over the n_bins+2-row sketch —
    bins-sized, not corpus-sized.  All three running values (cum,
    cum_before, and the total N) come from ONE window pass over the
    same bin ordering (r15: N was a separate aggregate whose crossJoin
    re-evaluated the whole sketch subtree — the n_bins+2-row frame was
    being computed three times, and the 2.6 s measured cost of the
    sf0.1 face was almost entirely stage latency; one pass + one
    broadcast halves the stage count for the identical integers)."""
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bin",
        "c",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ).alias("cum_before"),
        # total N as a full-range window over the SAME sort — exact
        # integer sum, identical to the old separate agg(sum) job
        F.sum("c").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    ).withColumn("cum_before", F.coalesce("cum_before", F.lit(0).cast("long")))
    qf = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    target = F.ceil(F.col("q") * F.col("n")).cast("long")
    hit = (
        qf.crossJoin(F.broadcast(cum.filter(F.col("c") > 0)))
        .filter(
            (F.col("cum") >= target) & (F.col("cum_before") < target)
        )
    )
    bin_lo = F.lit(lo) + F.col("bin").cast("double") * F.lit(width)
    frac = (
        (target - F.col("cum_before")).cast("double")
        / F.col("c").cast("double")
    )
    est = (
        F.when(F.col("bin") < 0, F.lit(lo))
        .when(F.col("bin") >= n_bins, F.lit(hi))
        .otherwise(bin_lo + frac * F.lit(width))
    )
    return hit.select(
        "q",
        F.col("bin").alias("hit_bin"),
        "cum_before",
        F.col("c").alias("bin_count"),
        F.round(est, 6).alias("est_value"),
    ).orderBy("q")


def split_leakage(
    docs,
    n: int = 4,
    text: str = "text",
    train_pct: int = 80,
    val_pct: int = 10,
):
    """Train→validation n-gram leakage audit: per source, how many
    validation documents share at least one word-``n``-gram with ANY
    training document under the deterministic hash split
    (`assign_split`).  Decontamination (`llm/dedup.py:decontaminate`)
    protects an EXTERNAL benchmark; this audits the INTERNAL held-out
    split — near-duplicates straddling the split boundary make
    validation loss lie, which is exactly what the random-by-hash
    split cannot prevent on its own (dedup must run first; this
    measures how much leakage the current corpus state carries).

    Scale shape: both sides' gram frames are corpus-sized, so unlike
    the broadcast decontamination scrub the leak check is a plain
    hash join ON THE GRAM KEY (shuffle both sides, AQE handles the
    Zipf-head skew) followed by a per-doc any-collision distinct —
    the shape of a train/val overlap job at 100 TB.  The distinct
    train-gram frame is checkpointed so it builds once.

    Returns (source, n_val_docs, n_leaked, leak_frac) by source."""
    s = assign_split(docs, train_pct=train_pct, val_pct=val_pct)
    grams = F.array_distinct(word_ngrams(words_array(text), n))
    train_g = (
        s.filter(F.col("split") == "train")
        .select(F.explode(grams).alias("g"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    val = s.filter(F.col("split") == "validation")
    val_ex = val.select("doc_id", F.explode(grams).alias("g"))
    leaked = (
        val_ex.join(train_g, "g", "left_semi").select("doc_id").distinct()
    )
    flagged = val.select("doc_id", "source").join(
        leaked.withColumn("leak", F.lit(1)), "doc_id", "left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_val_docs"),
            F.sum(F.coalesce("leak", F.lit(0))).cast("long").alias("n_leaked"),
        )
        .select(
            "source",
            "n_val_docs",
            "n_leaked",
            (
                F.col("n_leaked").cast("double") / F.col("n_val_docs")
            ).alias("leak_frac"),
        )
        .orderBy("source")
    )

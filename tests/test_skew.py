"""Skew hardening evidence for the user-keyed event analytics
(round-8 verdict Next #5): funnel / cohort / sessionize all exchange
on ``user_id``, and at 100 TB that key is power-law.  Two mechanisms
keep the plans safe, each pinned here on a DELIBERATELY skewed fixture
(one user owns ~70% of all rows):

1. **AQE skew-join split** for the per-stage join the funnel makes
   between the (large, skewed) event side and the per-user stage
   frame: when the frame is too big to broadcast, the sort-merge
   join's skewed partition is split at runtime (``skew=true`` in the
   final adaptive plan) — verified to ENGAGE, and to change nothing
   about the answer.
2. **Partial (map-side) aggregation** for every groupBy on user_id:
   the hot user's rows pre-aggregate inside each input partition
   before the exchange, so the shuffled volume per key is
   O(#partitions), not O(#rows).  Pinned as plan shape (partial
   aggregate below the exchange) — this is why the aggregation-heavy
   analytics need no salting.

A third mechanism was added after the round-9 skew soak caught
sessionize_events at exponent 1.06: its per-user window is now a
SEGMENTED scan (day-chunked windows + a boundary frame carrying
cross-chunk state), so no task ever owns a hot user's full history —
gated below, measured in COVERAGE.md round-9 (exp 0.25, 10x skewed
corpus 4.4x faster).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed_events(spark, tmp_path_factory):
    """Events with a power-law user: user 0 owns ~70% of rows, the
    rest spread over 2000 users.  Written as parquet (8 files) so the
    join reads a real scan with real partition sizes."""
    n = 120_000
    out = str(tmp_path_factory.mktemp("skew") / "events")
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            # user 0 owns ~70% of all rows — far past the skew-join
            # factor on any partition count
            F.when(F.col("id") % 10 < 7, F.lit(0))
            .otherwise((F.xxhash64("id") % 2000 + 2000) % 2000 + 1)
            .alias("user_id"),
            F.timestamp_seconds(
                F.lit(1700000000) + F.col("id") * 7 % 2_000_000
            ).alias("ts"),
            F.element_at(
                F.array(
                    F.lit("signup"), F.lit("view"),
                    F.lit("click"), F.lit("purchase"),
                ),
                (F.xxhash64(F.col("id") + 17) % 4 + 4).cast("int") % 4 + 1,
            ).alias("event_type"),
        )
        .repartition(8)
    )
    df.write.mode("overwrite").parquet(out)
    return out


def _stage_join(spark, src, prev_src):
    """The funnel's per-stage JOIN shape: events of one type joined to
    the MATERIALIZED per-user previous-stage frame (the checkpointed
    form a multi-day production funnel keeps between stages) on
    user_id, time-filtered — funnel_conversion's per-stage join
    without the trailing same-key reduce (see the gate docstrings for
    why the reduce is excluded)."""
    e = spark.read.parquet(src)
    prev = spark.read.parquet(prev_src)
    return (
        e.filter(F.col("event_type") == "view")
        .join(prev, "user_id")
        .filter(F.col("ts") > F.col("__pt"))
        .select("user_id", "ts")
    )


def _skew_confs(conf):
    """Scale AQE's skew thresholds to the fixture (the hot partition
    is ~100s of KB, not the production 256 MB default) and disable
    broadcast — the 100 TB regime where the per-user frame is itself
    too big to broadcast."""
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB",
    )
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")


_SKEW_KEYS = (
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.adaptive.coalescePartitions.enabled",
)


def test_funnel_stage_join_aqe_skew_split_engages(spark, skewed_events):
    """With broadcast off and AQE thresholds scaled to the fixture,
    the skewed sort-merge join must be SPLIT at runtime (skew=true in
    the final adaptive plan) — and the split must not change the
    answer vs the default (broadcastable) plan.

    Note the gate runs the JOIN shape without the funnel's trailing
    same-key reduce: when a same-key aggregate follows, Catalyst
    correctly DECLINES the split to preserve the co-partitioning the
    aggregate reuses — and the aggregate's partial step absorbs the
    skew instead (pinned by the partial-aggregate gate below).  Both
    behaviors are the right call at 100 TB; this test pins that the
    split mechanism engages where it applies."""
    conf = spark.conf
    saved = {k: conf.get(k, None) for k in _SKEW_KEYS}
    prev_src = skewed_events + "_stage_signup"
    e = spark.read.parquet(skewed_events)
    (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("__pt"))
        .write.mode("overwrite")
        .parquet(prev_src)
    )
    want = sorted(
        tuple(r)
        for r in _stage_join(spark, skewed_events, prev_src).collect()
    )
    try:
        _skew_confs(conf)
        df = _stage_join(spark, skewed_events, prev_src)
        got = sorted(tuple(r) for r in df.collect())
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            f"AQE skew-join split did not engage on the hot user:\n{plan}"
        )
        assert got == want
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


@pytest.mark.parametrize(
    "name", ["sessionize_events", "cohort_retention", "funnel_conversion"]
)
def test_user_keyed_aggs_are_partial_before_exchange(spark, sf_dir, name):
    """The no-salting justification: every user-keyed groupBy in the
    event analytics must compile with a PARTIAL aggregate below its
    exchange (map-side combine), so a hot key's shuffled volume is
    bounded by partition count.  A plan that lost partial aggregation
    would ship every raw row of the hot user to one reducer."""
    from streaming_forex_data_pipeline_spark.plans.registry import all_queries

    df = all_queries()[name].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_partial = plan.count("partial_")
    assert n_partial >= 1, (
        f"{name}: no partial aggregate in the plan — "
        f"hot-key rows would all ship to one reducer:\n{plan}"
    )


def test_sessionize_windows_are_chunked_not_per_user(spark, sf_dir):
    """Regression gate for the round-9 segmented sessionize: the BIG
    frame's window operators must partition by (user_id, pid) — the
    day-chunked shape whose task size is bounded by one day of one
    user's activity.  A plan whose only window partitions by user_id
    alone has regressed to the single-task-per-user scan that the
    skew soak measured at exp ~1 (one task owns the hot user's entire
    history)."""
    import re

    from streaming_forex_data_pipeline_spark.plans.registry import all_queries

    df = all_queries()["sessionize_events"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert re.search(r"windowspecdefinition\(user_id#\d+L?, pid#\d+L?,", plan), (
        f"sessionize lost the (user_id, pid) chunked window:\n{plan}"
    )


def test_exact_ntile_by_spreads_hot_group_across_partitions(spark):
    """The docstring's skew claim, measured: a 70%-hot group's rows
    must NOT serialize through one sort task.  The range partitioner
    splits the sort key (group, value, id) by sampled quantiles of
    the WHOLE frame, so the hot group spans many __pid slices and
    each local window is partition-bounded — while bin assignments
    still equal SQL's per-group NTILE exactly."""
    from pyspark.sql import Window, functions as F

    from streaming_forex_data_pipeline_spark.llm.corpus import (
        exact_ntile_by,
    )

    n = 120_000
    base = spark.range(n).select(
        F.when(F.col("id") % 10 < 7, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 10).cast("string")))
        .alias("g"),
        (F.col("id") * 37 % 1000).alias("v"),
        F.col("id"),
    )
    ranged = base.repartitionByRange(32, "g", "v", "id").withColumn(
        "pid", F.spark_partition_id()
    )
    spread = {
        r["g"]: r["n_pids"]
        for r in ranged.groupBy("g")
        .agg(F.countDistinct("pid").alias("n_pids"))
        .collect()
    }
    assert spread["hot"] >= 8, (
        f"hot group confined to {spread['hot']} partitions — the "
        f"grouped NTILE would serialize it through few sort tasks"
    )

    got = exact_ntile_by(
        base, ["g"], ["v", "id"], 10, out_col="bin", partitions=32
    )
    diff = (
        got.withColumn(
            "want",
            F.ntile(10).over(Window.partitionBy("g").orderBy("v", "id")),
        )
        .filter(F.col("bin") != F.col("want"))
        .count()
    )
    assert diff == 0


@pytest.fixture(scope="module")
def hot_band_docs(spark):
    """A template-family corpus: 30% of documents are ONE template
    (identical text, hence one minhash signature and one hot band
    bucket), the rest pairwise-unique.  The banded near-dup joins'
    power-law hot spot (round-9 verdict Next #7)."""
    n = 3000
    template = "the quick brown fox jumps over the lazy dog again"
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 3, F.lit(template))
        .otherwise(
            F.concat(
                F.lit("tok"), F.col("id"),
                F.lit(" mid"), F.col("id") * 7 % 997,
                F.lit(" tail"), F.col("id") * 13 % 991,
            )
        )
        .alias("text"),
    )


def test_minhash_hot_bucket_partial_aggs_and_spreads(spark, hot_band_docs):
    """The minhash bucket pipeline on a 30%-hot-template corpus: (a)
    the (band, band_hash) candidate aggregate runs with a PARTIAL
    (map-side) stage below its exchange, so the hot band's rows
    pre-combine per input partition instead of all shipping to one
    reducer; (b) the in-bucket pair explosion stays ELEMENT-parallel
    (the round-robin repartition between the bucket aggregate and the
    pair Generate), so the hot bucket's O(k^2) emission spreads across
    cores instead of serializing on one task; (c) the answer is the
    exact C(900, 2) template clique."""
    from streaming_forex_data_pipeline_spark.llm import dedup as DD

    pairs = DD.near_duplicate_pairs(
        hot_band_docs, threshold=1.0, n_hashes=32, bands=1
    )
    n = pairs.count()
    assert n == 900 * 899 // 2, n
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "partial_collect_set" in plan or plan.count(
        "ObjectHashAggregate"
    ) >= 2, f"bucket collect_set lost its partial stage:\n{plan}"
    assert "RoundRobinPartitioning" in plan, (
        f"pair explosion lost the element-parallel repartition — a hot "
        f"bucket's k^2 emission would serialize on one task:\n{plan}"
    )


def test_dhash_hot_band_absorbed_at_signature_granularity(spark):
    """The dHash banding engine on a 30%-hot-signature corpus: the
    hot template collapses into ONE signature-group row before any
    band join (candidate state is O(#distinct hashes), the docstring
    claim), the signature groupBy partial-aggregates below its
    exchange, and the expanded answer is exactly the template clique
    plus nothing else (the random tail is pairwise far)."""
    from streaming_forex_data_pipeline_spark.llm import dedup as DD

    n, hot = 3000, 900
    hashes = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 3, F.lit(12345))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1 << 32)))
        .alias("h_lo"),
        F.when(F.col("id") % 10 < 3, F.lit(67890))
        .otherwise(F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1 << 32)))
        .alias("h_hi"),
    )
    # candidate state is signature-granular: the 900 hot docs are ONE
    # row of the groups frame
    n_groups = hashes.groupBy("h_lo", "h_hi").count().count()
    assert n_groups <= n - hot + 1
    pairs = DD.dhash_near_dup_pairs(hashes, max_hamming=0)
    got = pairs.count()
    assert got >= hot * (hot - 1) // 2
    # the tail is random 64-bit; any extra pairs are rare accidental
    # exact collisions, never a flood
    assert got <= hot * (hot - 1) // 2 + 5, got
    # the signature groupBy sits behind dhash_near_dup_pairs' lazy
    # localCheckpoint (its plan is invisible from the pairs frame), so
    # gate the partial stage on the identical construction directly
    groups = hashes.groupBy("h_lo", "h_hi").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    groups.count()
    plan = groups._jdf.queryExecution().executedPlan().toString()
    assert "partial_collect_list" in plan or plan.count(
        "ObjectHashAggregate"
    ) >= 2, f"signature groupBy lost its partial stage:\n{plan}"

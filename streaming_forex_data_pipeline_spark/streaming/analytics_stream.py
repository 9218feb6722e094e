"""Streaming faces of the event-analytics queries (`plans/olap_q.py`).

Same state contract as the sketch channels in `corpus_stream.py`
(CMS = SUM, HLL = MAX, reservoir = top-k): each micro-batch commits a
bounded DELTA through the transactional log (`sources/sinks.py:
commit_append`), the live readout is a lazy view aggregating the log
by the face's merge law, the driver holds O(1) state, and crashed
micro-batch replays dedup idempotently against their (key, batch)
identity.

The cohort face's merge law is **MIN**: a user's first-event timestamp
over a union of batches is the min of per-batch minima — so per-user
firsts stay exact under any batch split, arrival order, or replay,
and the weekly cohort sizes derived from them equal the batch answer
(`cohort_retention`'s `sizes` frame) at every instant.
"""

from __future__ import annotations


def start_cohort_channel(
    spark,
    sf_dir: str,
    sink_table: str = "cohort_sink",
    sink_dir: str | None = None,
    stream=None,
):
    """Continuously maintained weekly signup-cohort sizes over an
    events stream: each micro-batch commits its per-user min event
    timestamp keyed (user_id, batch); the live view folds the log by
    per-user MIN, truncates to ISO week, and counts users per cohort
    — `plans/olap_q.py:cohort_retention`'s cohort dimension, kept
    fresh without rescanning history (parity across real micro-batches
    proven in tests/test_streaming.py).

    Scale shape: delta rows are bounded by users-per-batch, sink state
    by users x batches before `compact_log` folds settled commits, the
    view's aggregation is users-keyed, and the cohort readout is
    calendar-bounded.  The driver never holds per-user state."""
    from pyspark.sql import functions as F

    from ..sources.sinks import commit_append, read_committed
    from .channels import read_table_stream

    if sink_dir is None:
        import tempfile

        sink_dir = tempfile.mkdtemp(prefix="cohort_")
    if stream is None:
        stream = read_table_stream(spark, sf_dir, "events")
    spark.createDataFrame(
        [], "cohort timestamp, n_cohort long"
    ).createOrReplaceTempView(sink_table)

    def run_batch(batch_df, batch_id):
        delta = (
            batch_df.groupBy("user_id")
            .agg(F.min("ts").alias("first_ts"))
            .withColumn("batch", F.lit(int(batch_id)).cast("long"))
        )
        commit_append(delta, sink_dir, version=float(batch_id))
        try:
            committed = read_committed(
                spark, sink_dir, keys=["user_id", "batch"]
            )
        except FileNotFoundError:
            return
        (
            committed.groupBy("user_id")
            .agg(F.min("first_ts").alias("first_ts"))  # the MIN merge law
            .select(
                F.date_trunc("week", F.col("first_ts")).alias("cohort")
            )
            .groupBy("cohort")
            .agg(F.count(F.lit(1)).alias("n_cohort"))
            .createOrReplaceTempView(sink_table)
        )

    return (
        stream.writeStream.foreachBatch(run_batch)
        .trigger(availableNow=True)
        .start()
    )


def start_funnel_channel(
    spark,
    sf_dir: str,
    stages: tuple[str, ...] = ("signup", "view", "click", "purchase"),
    sink_table: str = "funnel_sink",
    sink_dir: str | None = None,
    stream=None,
):
    """Continuously maintained STRICT sequential funnel
    (`plans/olap_q.py:funnel_conversion`) via a per-user state machine
    in ``applyInPandasWithState`` — the ST7 pattern (stateful.py)
    applied to multi-stage progression state instead of a counter.

    Per user the GroupState holds one epoch-micros timestamp per
    stage (the first qualifying hit).  Each micro-batch replays the
    user's new events in event-time order through the machine: stage
    i fires on the first event of its type strictly after stage i-1's
    recorded hit.  Newly reached stages are EMITTED as (user_id,
    stage_ord, reached_ts) rows — monotone inserts (a stage fires at
    most once per user across the whole stream), committed per batch
    through the delta log keyed (user_id, stage_ord, batch) so crashed
    replays dedup; the live view is the per-stage distinct-user count,
    i.e. funnel_conversion's n_users column kept fresh.

    Ordering contract (stated, not hidden): stage decisions are
    final, so per-user events must arrive in event-time order ACROSS
    micro-batches (true for replayed/file sources and for
    watermark-sorted ingest); an out-of-order earlier event cannot
    retract an already-fired stage.  State is #stages longs per user
    — bounded, partitioned across executors by user_id."""
    from typing import Any, Iterator

    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from ..sources.sinks import commit_append, read_committed
    from .channels import read_table_stream

    if sink_dir is None:
        import tempfile

        sink_dir = tempfile.mkdtemp(prefix="funnel_")
    if stream is None:
        stream = read_table_stream(spark, sf_dir, "events")
    spark.createDataFrame(
        [], "stage_ord int, stage string, n_users long"
    ).createOrReplaceTempView(sink_table)

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("stage_ord", IntegerType()),
            StructField("reached_us", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField(f"t{i}", LongType()) for i in range(len(stages))]
    )
    n_stages = len(stages)
    stage_of = {s: i for i, s in enumerate(stages)}

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        reached = list(state.get) if state.exists else [None] * n_stages
        new_rows = []
        # CONCATENATE the group's chunks before sorting: the runtime
        # delivers one group's micro-batch rows as an iterator of
        # Arrow-sized chunks in shuffle order, so sorting per chunk
        # would replay events out of event-time order whenever a user
        # spans chunks (review-found; stage decisions are final, so
        # order errors are permanent)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            merged = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            ).sort_values("ts", kind="mergesort")
            for etype, ts in zip(merged["event_type"], merged["ts"]):
                i = stage_of.get(etype)
                if i is None or reached[i] is not None:
                    continue
                us = int(pd.Timestamp(ts).value // 1000)
                prev = reached[i - 1] if i > 0 else None
                if i == 0 or (prev is not None and us > prev):
                    reached[i] = us
                    new_rows.append((int(key[0]), i, us))
        state.update(tuple(reached))
        if new_rows:
            yield pd.DataFrame(
                new_rows, columns=["user_id", "stage_ord", "reached_us"]
            )

    transitions = stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def run_batch(batch_df, batch_id):
        delta = batch_df.withColumn(
            "batch", F.lit(int(batch_id)).cast("long")
        )
        commit_append(delta, sink_dir, version=float(batch_id))
        try:
            committed = read_committed(
                spark, sink_dir, keys=["user_id", "stage_ord", "batch"]
            )
        except FileNotFoundError:
            return
        stage_names = F.array(*[F.lit(s) for s in stages])
        (
            committed.groupBy("stage_ord")
            .agg(F.countDistinct("user_id").alias("n_users"))
            .select(
                # 1-based to match funnel_conversion's stage_ord
                (F.col("stage_ord") + 1).alias("stage_ord"),
                F.element_at(stage_names, F.col("stage_ord") + 1).alias(
                    "stage"
                ),
                "n_users",
            )
            .createOrReplaceTempView(sink_table)
        )

    import tempfile

    return (
        transitions.writeStream.foreachBatch(run_batch)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="funnel_ckpt_")
        )
        .trigger(availableNow=True)
        .start()
    )


def start_wau_channel(
    spark,
    sf_dir: str,
    sink_table: str = "wau_sink",
    sink_dir: str | None = None,
    stream=None,
):
    """Streaming face of the rolling-WAU sketch (`plans/olap_q.py:
    rolling_wau_hll`): each micro-batch commits its per-(day, bucket)
    HLL register deltas keyed (day, bucket, batch); the live view is
    the register file per day merged by element-wise MAX across
    batches — the same merge law the global HLL channel proves, here
    keyed by the calendar dimension so the 7-day window merge and the
    per-day estimate are deterministic folds any consumer can run on
    the view at any moment (they are pure functions of the registers,
    oracle-proven in the registered batch query).

    State: at most #batches x days x 2^p delta rows before
    compact_log folds settled commits; the driver holds O(1)."""
    from pyspark.sql import functions as F

    from ..llm.vocab import hll_keyed_rhos
    from ..sources.sinks import commit_append, read_committed
    from .channels import read_table_stream

    if sink_dir is None:
        import tempfile

        sink_dir = tempfile.mkdtemp(prefix="wau_")
    if stream is None:
        stream = read_table_stream(spark, sf_dir, "events")
    spark.createDataFrame(
        [], "day timestamp, bucket long, max_rho int"
    ).createOrReplaceTempView(sink_table)

    def run_batch(batch_df, batch_id):
        delta = hll_keyed_rhos(
            batch_df.select(
                F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
            ),
            "user_id",
            ["day"],
        ).withColumn("batch", F.lit(int(batch_id)).cast("long"))
        commit_append(delta, sink_dir, version=float(batch_id))
        try:
            committed = read_committed(
                spark, sink_dir, keys=["day", "bucket", "batch"]
            )
        except FileNotFoundError:
            return
        committed.groupBy("day", "bucket").agg(
            F.max("max_rho").alias("max_rho")
        ).createOrReplaceTempView(sink_table)

    return (
        stream.writeStream.foreachBatch(run_batch)
        .trigger(availableNow=True)
        .start()
    )

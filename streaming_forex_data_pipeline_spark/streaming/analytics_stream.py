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

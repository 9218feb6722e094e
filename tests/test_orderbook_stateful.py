"""ST5 order-book channel and ST7 stateful sequence tests."""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from streaming_forex_data_pipeline_spark.streaming import orderbook as OB
from streaming_forex_data_pipeline_spark.streaming import stateful as ST


def test_book_features_math(spark):
    """Pure-function check of the array algebra on a hand-built book."""
    row = (
        dt.datetime(2024, 1, 1),
        "EURUSD",
        [1.0999, 1.0998, 1.0997],
        [100.0, 200.0, 300.0],
        [1.1001, 1.1002, 1.1003],
        [300.0, 100.0, 200.0],
        42.0,
    )
    df = spark.createDataFrame(
        [row],
        "ts timestamp, symbol string, bid_prices array<double>, "
        "bid_sizes array<double>, ask_prices array<double>, "
        "ask_sizes array<double>, latency_ms double",
    )
    got = OB.book_features(df).collect()[0]
    assert got["best_bid"] == pytest.approx(1.0999)
    assert got["best_ask"] == pytest.approx(1.1001)
    assert got["mid"] == pytest.approx(1.1)
    assert got["spread"] == pytest.approx(0.0002)
    assert got["bid_depth"] == pytest.approx(600.0)
    assert got["ask_depth"] == pytest.approx(600.0)
    assert got["imbalance"] == pytest.approx(0.0)
    # equal depth -> microprice == mid
    assert got["microprice"] == pytest.approx(1.1)


def test_book_features_plan_has_no_python_udf(spark):
    df = spark.createDataFrame(
        [],
        "ts timestamp, symbol string, bid_prices array<double>, "
        "bid_sizes array<double>, ask_prices array<double>, "
        "ask_sizes array<double>, latency_ms double",
    )
    plan = OB.book_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_order_book_channel_end_to_end(spark):
    """rate source -> book -> features -> windowed microstructure."""
    book = OB.simulated_order_book(spark, rows_per_second=50)
    feats = OB.book_features(book)
    micro = OB.microstructure_channel(feats, window="2 seconds", watermark="2 seconds")
    q = (
        micro.writeStream.outputMode("append")
        .format("memory")
        .queryName("micro_sink")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 45
        n = 0
        while time.time() < deadline:
            n = spark.table("micro_sink").count()
            if n >= 3:
                break
            time.sleep(1)
        assert n >= 3, f"only {n} microstructure windows after 45s"
        rows = spark.table("micro_sink").collect()
        for r in rows:
            assert r["avg_spread"] == pytest.approx(0.0002)
            assert -1.0 <= r["avg_imbalance"] <= 1.0
            assert r["n_snapshots"] > 0
            assert 0.5 <= r["data_quality_score"] <= 1.0
    finally:
        q.stop()


def test_sequence_survives_microbatch_boundaries(spark, tmp_path):
    """Two staged files + maxFilesPerTrigger=1 force two micro-batches;
    per-key sequences must be contiguous 1..N across both."""
    staging = tmp_path / "seq_in"
    staging.mkdir()
    t0 = dt.datetime(2024, 1, 1)

    def mk(rows):
        return spark.createDataFrame(
            rows, "stream_type string, emitted_at timestamp, v long"
        )

    mk(
        [("ticks", t0 + dt.timedelta(seconds=i), i) for i in range(5)]
        + [("candles", t0 + dt.timedelta(seconds=i), i) for i in range(3)]
    ).coalesce(1).write.parquet(str(staging / "batch_a"))
    mk(
        [("ticks", t0 + dt.timedelta(seconds=10 + i), 10 + i) for i in range(4)]
    ).coalesce(1).write.parquet(str(staging / "batch_b"))

    stream = (
        spark.readStream.schema("stream_type string, emitted_at timestamp, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(staging / "*"))
    )
    q = (
        ST.assign_sequence(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("seq_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.table("seq_sink").toPandas()
    assert len(out) == 12
    ticks = out[out.stream_type == "ticks"].sort_values("emitted_at")
    # contiguous, monotonic, ordered by emitted_at — across both batches
    assert list(ticks["sequence"]) == list(range(1, 10))
    candles = out[out.stream_type == "candles"].sort_values("emitted_at")
    assert list(candles["sequence"]) == [1, 2, 3]


def test_broadcast_sink_ring_buffer(spark):
    """S13 — envelope -> sequence -> JSON broadcast with a bounded
    per-channel ring buffer; the full serving-edge path."""
    import json

    from streaming_forex_data_pipeline_spark.streaming import channels as CH

    ticks = CH.simulated_ticks(spark, rows_per_second=200)
    messages = ST.assign_sequence(
        CH.wrap_stream_messages(ticks, "raw_ticks"), order_col="emitted_at"
    )
    sink = CH.BroadcastSink(buffer_size=50)
    q = (
        messages.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if len(sink.buffers["raw_ticks"]) >= 50:
                break
            time.sleep(0.5)
        buf = sink.buffers["raw_ticks"]
        assert len(buf) == 50, f"ring buffer at {len(buf)}, want full at 50"
        msgs = [json.loads(m) for m in buf]
        assert all(m["stream_type"] == "raw_ticks" for m in msgs)
        seqs = [m["sequence"] for m in msgs]
        # ring semantics: the buffer holds the TAIL of a longer sequence
        assert seqs == sorted(seqs)
        assert seqs[-1] - seqs[0] == len(seqs) - 1, "sequence gap inside buffer"
        assert seqs[-1] > 50 or seqs[0] == 1
        assert msgs[0]["data"]["ask"] > msgs[0]["data"]["bid"]
    finally:
        q.stop()


def test_broadcast_sink_contract_guard(spark):
    """S13 — the post-aggregation scale contract is ENFORCED, not just
    documented: a batch larger than max_batch_rows (someone pointed the
    sink at a pre-aggregation stream) fails the batch instead of
    silently collecting millions of rows onto the driver — and the
    breach is detected from max_batch_rows+1 rows via limit(), never by
    materializing the offending batch."""
    import pytest

    from streaming_forex_data_pipeline_spark.streaming import channels as CH

    sink = CH.BroadcastSink(buffer_size=10, max_batch_rows=100)
    small = spark.range(5).select(
        F.lit("candles").alias("stream_type"), F.col("id").alias("sequence")
    )
    sink(small, batch_id=0)
    assert len(sink.buffers["candles"]) == 5

    big = spark.range(500).select(
        F.lit("raw").alias("stream_type"), F.col("id").alias("sequence")
    )
    with pytest.raises(ValueError, match="post-aggregation"):
        sink(big, batch_id=1)
    # the failed batch must not partially publish
    assert len(sink.buffers["raw"]) == 0


def test_failover_tick_source(spark, tmp_path):
    """S6 — empty/invalid primary falls back to the simulated source;
    a valid primary dir is selected."""
    from streaming_forex_data_pipeline_spark.streaming import channels as CH

    _, src = CH.failover_tick_source(spark, str(tmp_path / "missing"))
    assert src == "simulated_fallback"

    good = tmp_path / "ticks"
    spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), "EURUSD", 1.0999, 1.1001, 1.1, 1)],
        "ts timestamp, symbol string, bid double, ask double, last double, "
        "seq_hint long",
    ).write.parquet(str(good))
    stream, src = CH.failover_tick_source(spark, str(good))
    assert src == "primary"
    assert stream.isStreaming


def test_economic_events_channel(spark):
    from streaming_forex_data_pipeline_spark.streaming import channels as CH

    ev = CH.wrap_stream_messages(
        CH.economic_events_channel(spark, rows_per_second=20), "economic_events"
    )
    q = (
        ev.writeStream.outputMode("append")
        .format("memory")
        .queryName("econ_sink")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.table("econ_sink").count()
            if n >= 12:
                break
            time.sleep(0.5)
        assert n >= 12
        rows = spark.table("econ_sink").collect()
        names = {r["data"]["event_name"] for r in rows}
        assert names <= {n for n, _ in CH.ECONOMIC_EVENTS}
        assert len(names) >= 3  # rotation visible
        for r in rows[:20]:
            d = r["data"]
            assert d["impact"] in {"high", "medium", "low"}
            assert -1.0 <= d["surprise_score"] <= 1.0
    finally:
        q.stop()

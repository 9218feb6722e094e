"""Order-book / market-depth channel (ST5).

The reference's order_book channel emits a simulated depth-5 book with
an imbalance metric at 500 ms, and the microstructure channel emits A8
aggregates at 5 s (app/services/websocket_manager.py:510-537, frequency
table :199-209).  Here:

- the book source derives deterministically from Spark's `rate` stream
  (same strategy as channels.simulated_ticks), so tests are reproducible
  with no network;
- book-level features are pure array Column algebra (`element_at`,
  `aggregate`, `zip_with`) — JVM-side, codegen-friendly, no UDFs;
- the microstructure aggregation is a tumbling event-time window over
  book snapshots with a watermark bounding state (ST6) — the streaming
  face of the batch A8 query (plans/analysis_q.py:microstructure).

Scale: book snapshots partition by symbol; the windowed aggregation
shuffles once on (symbol, window) with partial aggregation map-side.
Depth arrays are fixed-length (5), so row width is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEPTH = 5
_SYMBOLS = ("EURUSD", "GBPUSD", "USDJPY", "AUDUSD", "USDCAD")


def simulated_order_book(
    spark: SparkSession, rows_per_second: int = 10, depth: int = DEPTH
) -> DataFrame:
    """ST5 source — deterministic depth-`depth` book snapshots on the
    rate stream, mirroring the reference's simulated book
    (websocket_manager.py:510-529): price levels step away from mid by
    0.1 pip per level; sizes are pseudo-random from a hash of
    (tick, level)."""
    symbols = F.array(*[F.lit(s) for s in _SYMBOLS])
    noise = (F.hash(F.col("value")) % 1000).cast("double") / 1000000.0
    mid = F.lit(1.08) + noise
    half = F.lit(0.0001)  # half-spread
    levels = F.sequence(F.lit(1), F.lit(depth))

    def size_at(side_salt: int):
        # deterministic positive size per (tick, side, level)
        return lambda i: (
            F.pmod(F.hash(F.col("value") * 31 + i * 7 + side_salt), F.lit(1000))
            + 100
        ).cast("double") * 1000.0

    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.element_at(symbols, (F.col("value") % 5 + 1).cast("int")).alias(
                "symbol"
            ),
            F.transform(
                levels, lambda i: mid - half - (i - 1).cast("double") * 0.00001
            ).alias("bid_prices"),
            F.transform(levels, size_at(1)).alias("bid_sizes"),
            F.transform(
                levels, lambda i: mid + half + (i - 1).cast("double") * 0.00001
            ).alias("ask_prices"),
            F.transform(levels, size_at(2)).alias("ask_sizes"),
            (F.pmod(F.hash("value"), F.lit(150))).cast("double").alias("latency_ms"),
        )
    )


def book_features(book: DataFrame) -> DataFrame:
    """ST5 transform — best bid/ask, mid, spread, per-side depth,
    order-flow imbalance, and size-weighted microprice, all as array
    aggregates (websocket_manager.py:530-537 computes imbalance as
    (bid_vol − ask_vol)/(bid_vol + ask_vol) over the visible depth)."""
    zero = F.lit(0.0)
    bid_vol = F.aggregate("bid_sizes", zero, lambda a, x: a + x)
    ask_vol = F.aggregate("ask_sizes", zero, lambda a, x: a + x)
    best_bid = F.element_at("bid_prices", 1)
    best_ask = F.element_at("ask_prices", 1)
    arrays = ("bid_prices", "bid_sizes", "ask_prices", "ask_sizes")
    passthrough = [c for c in book.columns if c not in arrays]
    return book.select(
        *passthrough,
        best_bid.alias("best_bid"),
        best_ask.alias("best_ask"),
        ((best_bid + best_ask) / 2).alias("mid"),
        (best_ask - best_bid).alias("spread"),
        bid_vol.alias("bid_depth"),
        ask_vol.alias("ask_depth"),
        ((bid_vol - ask_vol) / (bid_vol + ask_vol)).alias("imbalance"),
        (
            (best_bid * ask_vol + best_ask * bid_vol) / (bid_vol + ask_vol)
        ).alias("microprice"),
    )


def microstructure_channel(
    features: DataFrame,
    window: str = "5 seconds",
    watermark: str = "10 seconds",
) -> DataFrame:
    """ST5 aggregation — the streaming face of batch A8
    (premium_data_provider.py:202-285): tumbling `window` per symbol
    with avg/std spread, snapshot count, depth profile, mean imbalance,
    and the latency-bucket quality score.  Watermark bounds state."""
    return (
        features.withWatermark("ts", watermark)
        .groupBy("symbol", F.window("ts", window).alias("w"))
        .agg(
            F.avg("spread").alias("avg_spread"),
            F.stddev_samp("spread").alias("spread_volatility"),
            F.count(F.lit(1)).alias("n_snapshots"),
            F.avg("bid_depth").alias("avg_bid_depth"),
            F.avg("ask_depth").alias("avg_ask_depth"),
            F.avg("imbalance").alias("avg_imbalance"),
            F.avg("latency_ms").alias("avg_latency_ms"),
            F.avg(
                F.when(F.col("latency_ms") < 50, 1.0)
                .when(F.col("latency_ms") < 100, 0.8)
                .otherwise(0.5)
            ).alias("data_quality_score"),
        )
        .select(
            "symbol", F.col("w.start").alias("window_start"), "avg_spread",
            "spread_volatility", "n_snapshots", "avg_bid_depth",
            "avg_ask_depth", "avg_imbalance", "avg_latency_ms",
            "data_quality_score",
        )
    )

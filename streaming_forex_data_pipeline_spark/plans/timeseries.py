"""Time-series queries: OHLCV resample + window-function indicators.

Covers SURVEY §2 operators A1/A2, W1/W5/W6/W8-W11/W13-W16/W22/W23/W28,
X1-X7 and N1-N4 over the candle series derived from the events table
(see sources.tables.candles_from_events).

Every indicator is per-symbol Column algebra over one window ordering
(symbol, ts) — a single sort per symbol partition serves all frames, and
symbols parallelize across executors at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import indicators as I
from ..operators import market as X
from ..sources.tables import CANDLES_CTE, candles_from_events, load_table
from .registry import register

R = 6


def _r(c, name):  # round+alias helper
    return F.round(c, R).alias(name)


@register(
    "candles_1h",
    oracle=CANDLES_CTE
    + """
SELECT symbol, ts, open, high, low, close, volume, n_events
FROM candles ORDER BY symbol, ts
""",
    doc="A1 — OHLCV time-bucket resample with ordered first/last "
    "(min_by/max_by), the reference's time_bucket aggregate "
    "(repository.py:450-471). One shuffle, map-side partial agg.",
)
def candles_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return candles_from_events(spark, sf_dir).orderBy("symbol", "ts")


@register(
    "resample_daily",
    oracle=CANDLES_CTE
    + """
SELECT symbol,
       date_trunc('day', ts) AS day,
       round(min_by(open, ts), 6)  AS open,
       round(max(high), 6)         AS high,
       round(min(low), 6)          AS low,
       round(max_by(close, ts), 6) AS close,
       round(sum(volume), 6)       AS volume,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM candles
GROUP BY 1, 2
ORDER BY symbol, day
""",
    doc="A1 at coarser granularity — hourly→daily re-resample proving "
    "the operator composes (reference granularity ladder 1min→1d).",
)
def resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return (
        c.groupBy(
            # TIMESTAMP (not DATE) on both sides: date objects normalize
            # differently across engines' pandas bridges.
            "symbol", F.date_trunc("day", "ts").alias("day")
        )
        .agg(
            _r(F.min_by("open", "ts"), "open"),
            _r(F.max("high"), "high"),
            _r(F.min("low"), "low"),
            _r(F.max_by("close", "ts"), "close"),
            _r(F.sum("volume"), "volume"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("symbol", "day")
    )


@register(
    "daily_stats",
    oracle="""
SELECT event_type,
       date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       count(*) AS n,
       round(min("value"), 6) AS min_value,
       round(max("value"), 6) AS max_value,
       round(sum(CAST(round("value" * 100) AS BIGINT)) / 100.0 / count(*), 6) AS avg_value,
       round(sum(CAST(round("value" * 100) AS BIGINT)) / 100.0, 6) AS sum_value,
       CAST(count(*) FILTER (WHERE "value" > 180) AS BIGINT) AS n_high
FROM events
GROUP BY 1, 2
ORDER BY event_type, day
""",
    doc="A2 — daily stats view with FILTER'd count "
    "(02-create-tables.sh:217-232); count_if on Spark side.  avg/sum "
    "run as integer-cents sums (value is on the 2dp grid): a group avg "
    "of doubles is a parallel partial aggregation whose association "
    "order drifts with partitioning/threading, and this query's true "
    "avgs sit exactly ON round(,6) half-boundaries (boundary_audit.py "
    "margin 7e-15) — the f_stat flake class.  Integer sums are exact "
    "in any order.",
)
def daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    from ..operators.indicators import cents as _cents
    cents = _cents("value")
    n = F.count(F.lit(1))
    return (
        e.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r(F.min("value"), "min_value"),
            _r(F.max("value"), "max_value"),
            _r(F.sum(cents) / 100.0 / n, "avg_value"),
            _r(F.sum(cents) / 100.0, "sum_value"),
            F.count_if(F.col("value") > 180).alias("n_high"),
        )
        .orderBy("event_type", "day")
    )


# ---- indicator queries over the candle series ------------------------------

_W_ORD = "PARTITION BY symbol ORDER BY ts"


def _frame(n: int) -> str:
    return f"PARTITION BY symbol ORDER BY ts ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW"


def _guard(n: int, inner: str) -> str:
    """pandas min_periods=N parity in SQL."""
    return f"CASE WHEN row_number() OVER ({_W_ORD}) >= {n} THEN {inner} END"


@register(
    "sma",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts, close,
       round({_guard(5, f'avg(close) OVER ({_frame(5)})')}, 6)  AS sma_5,
       round({_guard(20, f'avg(close) OVER ({_frame(20)})')}, 6) AS sma_20,
       round({_guard(50, f'avg(close) OVER ({_frame(50)})')}, 6) AS sma_50
FROM candles ORDER BY symbol, ts
""",
    doc="W1 — SMA(5/20/50) with pandas min_periods semantics "
    "(feature_engineer.py:95-103).",
)
def sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return c.select(
        "symbol",
        "ts",
        "close",
        _r(I.sma("close", 5), "sma_5"),
        _r(I.sma("close", 20), "sma_20"),
        _r(I.sma("close", 50), "sma_50"),
    ).orderBy("symbol", "ts")


@register(
    "returns",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts, close,
       round(close - lag(close) OVER ({_W_ORD}), 6) AS price_change,
       round(CASE WHEN lag(close) OVER ({_W_ORD}) <> 0
             THEN (close - lag(close) OVER ({_W_ORD})) / lag(close) OVER ({_W_ORD}) * 100
             END, 6) AS pct_change
FROM candles ORDER BY symbol, ts
""",
    doc="W8 — diff + pct_change×100 (feature_engineer.py:225-226).",
)
def returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return c.select(
        "symbol",
        "ts",
        "close",
        _r(I.price_change(), "price_change"),
        _r(I.pct_change() * 100.0, "pct_change"),
    ).orderBy("symbol", "ts")


@register(
    "rolling_volatility",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts,
       round({_guard(11, f'stddev_samp(ret) OVER ({_frame(10)}) * 100')}, 6) AS vol_10
FROM (
  SELECT symbol, ts,
         CASE WHEN lag(close) OVER ({_W_ORD}) <> 0
              THEN (close - lag(close) OVER ({_W_ORD})) / lag(close) OVER ({_W_ORD})
         END AS ret
  FROM candles
) t
ORDER BY symbol, ts
""",
    doc="W9 — rolling std of returns ×100 (feature_engineer.py:234-239). "
    "Guard is 11 rows: first return is null so 10 non-null returns need "
    "11 candles (pandas rolling over a diff'd series).",
)
def rolling_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    c = c.withColumn("ret", I.pct_change())
    w10 = I.w_rows(10)
    rn = F.row_number().over(I.w_ordered())
    return c.select(
        "symbol",
        "ts",
        _r(
            F.when(rn >= 11, F.stddev_samp("ret").over(w10) * 100.0),
            "vol_10",
        ),
    ).orderBy("symbol", "ts")


@register(
    "bollinger",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts, close,
       round(mid, 6) AS bb_middle,
       round(mid + 2 * sd, 6) AS bb_upper,
       round(mid - 2 * sd, 6) AS bb_lower,
       round(CASE WHEN mid <> 0 THEN 4 * sd / mid END, 6) AS bb_width
FROM (
  SELECT symbol, ts, close,
         {_guard(20, f'CAST(sum(CAST(round(close * 100) AS BIGINT)) OVER ({_frame(20)}) AS DOUBLE) / 2000.0')} AS mid,
         {_guard(20, f'''sqrt(CAST(20 * sum(CAST(round(close * 100) AS BIGINT) * CAST(round(close * 100) AS BIGINT)) OVER ({_frame(20)})
                    - sum(CAST(round(close * 100) AS BIGINT)) OVER ({_frame(20)})
                      * sum(CAST(round(close * 100) AS BIGINT)) OVER ({_frame(20)}) AS DOUBLE) / 380.0) / 100.0''')} AS sd
  FROM candles
) t
ORDER BY symbol, ts
""",
    doc="W5 — Bollinger(20, 2σ), sample stddev like pandas default "
    "(feature_engineer.py:163-187).  mid/sd from exact integer-cents "
    "frame sums (operators/indicators.py sma_exact/rolling_std_exact): "
    "band values sat within 5e-11 of round(,6) boundaries "
    "(boundary_audit.py) and integer sums are association-order-proof.",
)
def bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    b = I.bollinger(20, 2.0)
    return c.select(
        "symbol",
        "ts",
        "close",
        _r(b["bb_middle"], "bb_middle"),
        _r(b["bb_upper"], "bb_upper"),
        _r(b["bb_lower"], "bb_lower"),
        _r(b["bb_width"], "bb_width"),
    ).orderBy("symbol", "ts")


@register(
    "momentum",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts,
       round(CASE WHEN lag(close, 5) OVER ({_W_ORD}) <> 0
             THEN (close / lag(close, 5) OVER ({_W_ORD}) - 1) * 100 END, 6) AS momentum_5,
       round(CASE WHEN lag(close, 10) OVER ({_W_ORD}) <> 0
             THEN (close / lag(close, 10) OVER ({_W_ORD}) - 1) * 100 END, 6) AS momentum_10
FROM candles ORDER BY symbol, ts
""",
    doc="W11 — momentum over 5/10 buckets (feature_engineer.py:252-256).",
)
def momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return c.select(
        "symbol",
        "ts",
        _r(I.momentum("close", 5), "momentum_5"),
        _r(I.momentum("close", 10), "momentum_10"),
    ).orderBy("symbol", "ts")


@register(
    "price_position",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts,
       round({_guard(10, f'''CASE WHEN max(high) OVER ({_frame(10)}) <> min(low) OVER ({_frame(10)})
             THEN (close - min(low) OVER ({_frame(10)}))
                  / (max(high) OVER ({_frame(10)}) - min(low) OVER ({_frame(10)})) * 100 END''')}, 6)
         AS price_position_10
FROM candles ORDER BY symbol, ts
""",
    doc="W10 — price position in rolling hi-lo range "
    "(feature_engineer.py:242-250).",
)
def price_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return c.select(
        "symbol", "ts", _r(I.price_position(10), "price_position_10")
    ).orderBy("symbol", "ts")


@register(
    "support_resistance",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts, close,
       round({_guard(20, f'max(high) OVER ({_frame(20)})')}, 6) AS resistance_20,
       round({_guard(20, f'min(low) OVER ({_frame(20)})')}, 6)  AS support_20,
       round(CASE WHEN close <> 0 THEN ({_guard(20, f'max(high) OVER ({_frame(20)})')} - close) / close * 100 END, 6)
         AS dist_resistance_pct
FROM candles ORDER BY symbol, ts
""",
    doc="W13 — rolling support/resistance + distance "
    "(feature_engineer.py:266-272).",
)
def support_resistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    res = I.rolling_max("high", 20)
    sup = I.rolling_min("low", 20)
    return c.select(
        "symbol",
        "ts",
        "close",
        _r(res, "resistance_20"),
        _r(sup, "support_20"),
        _r(F.when(F.col("close") != 0, (res - F.col("close")) / F.col("close") * 100.0), "dist_resistance_pct"),
    ).orderBy("symbol", "ts")


@register(
    "williams_r",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts,
       round({_guard(14, f'''CASE WHEN max(high) OVER ({_frame(14)}) <> min(low) OVER ({_frame(14)})
             THEN -100 * (max(high) OVER ({_frame(14)}) - close)
                  / (max(high) OVER ({_frame(14)}) - min(low) OVER ({_frame(14)})) END''')}, 6) + 0
         AS williams_r_14
FROM candles ORDER BY symbol, ts
""",
    doc="W15 — Williams %R(14) (advanced_feature_engineer.py:81-87).  "
    "The oracle adds `+ 0` after rounding: close == rolling-high gives "
    "-100 * 0 = -0.0, which DuckDB's round preserves but Spark's "
    "BigDecimal round normalizes to 0.0 — the exact value-hash would "
    "diverge on the sign bit (-0.0 + 0 = +0.0 in IEEE 754).",
)
def williams_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return c.select("symbol", "ts", _r(I.williams_r(14), "williams_r_14")).orderBy(
        "symbol", "ts"
    )


@register(
    "stochastic",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts,
       round(stoch_k, 6) AS stoch_k,
       round(CASE WHEN row_number() OVER ({_W_ORD}) >= 16
             THEN avg(stoch_k) OVER ({_frame(3)}) END, 6) AS stoch_d
FROM (
  SELECT symbol, ts,
         {_guard(14, f'''CASE WHEN max(high) OVER ({_frame(14)}) <> min(low) OVER ({_frame(14)})
              THEN 100 * (close - min(low) OVER ({_frame(14)}))
                   / (max(high) OVER ({_frame(14)}) - min(low) OVER ({_frame(14)})) END''')} AS stoch_k
  FROM candles
) t
ORDER BY symbol, ts
""",
    doc="W16 — Stochastic %K(14)/%D(3); %D guard is 16 rows (14 for the "
    "first %K + 2 more for the 3-row mean) "
    "(advanced_feature_engineer.py:89-98).",
)
def stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    c = c.withColumn("stoch_k", I.stochastic(14)["stoch_k"])
    rn = F.row_number().over(I.w_ordered())
    return c.select(
        "symbol",
        "ts",
        _r(F.col("stoch_k"), "stoch_k"),
        _r(F.when(rn >= 16, F.avg("stoch_k").over(I.w_rows(3))), "stoch_d"),
    ).orderBy("symbol", "ts")


@register(
    "donchian",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts,
       round({_guard(20, f'max(high) OVER ({_frame(20)})')}, 6) AS donchian_upper,
       round({_guard(20, f'min(low) OVER ({_frame(20)})')}, 6)  AS donchian_lower,
       round(({_guard(20, f'max(high) OVER ({_frame(20)})')} + {_guard(20, f'min(low) OVER ({_frame(20)})')}) / 2, 6)
         AS donchian_middle
FROM candles ORDER BY symbol, ts
""",
    doc="W22 — Donchian channels(20) (advanced_feature_engineer.py:228-233).",
)
def donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    d = I.donchian(20)
    return c.select(
        "symbol",
        "ts",
        _r(d["donchian_upper"], "donchian_upper"),
        _r(d["donchian_lower"], "donchian_lower"),
        _r(d["donchian_middle"], "donchian_middle"),
    ).orderBy("symbol", "ts")


@register(
    "obv_proxy",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts,
       round(sum(signed_range) OVER ({_W_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS obv
FROM (
  SELECT symbol, ts,
         CASE WHEN close - lag(close) OVER ({_W_ORD}) > 0 THEN high - low
              WHEN close - lag(close) OVER ({_W_ORD}) < 0 THEN -(high - low)
              ELSE 0 END AS signed_range
  FROM candles
) t
ORDER BY symbol, ts
""",
    doc="W23 — OBV volume-proxy as a running signed sum; the reference's "
    "Python loop vectorizes to one cumulative window "
    "(advanced_feature_engineer.py:235-252).",
)
def obv_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return c.select("symbol", "ts", _r(I.obv_proxy(), "obv")).orderBy("symbol", "ts")


@register(
    "atr",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts,
       round(tr, 6) AS true_range,
       round(CASE WHEN row_number() OVER ({_W_ORD}) >= 14
             THEN avg(tr) OVER ({_frame(14)}) END, 6) AS atr_14
FROM (
  SELECT symbol, ts,
         CASE WHEN lag(close) OVER ({_W_ORD}) IS NULL THEN high - low
              ELSE greatest(high - low,
                            abs(high - lag(close) OVER ({_W_ORD})),
                            abs(low - lag(close) OVER ({_W_ORD}))) END AS tr
  FROM candles
) t
ORDER BY symbol, ts
""",
    doc="W6 — true range + SMA-smoothed ATR(14) (Keltner variant, "
    "advanced_feature_engineer.py:216-221).",
)
def atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    c = c.withColumn("tr", I.true_range())
    rn = F.row_number().over(I.w_ordered())
    return c.select(
        "symbol",
        "ts",
        _r(F.col("tr"), "true_range"),
        _r(F.when(rn >= 14, F.avg("tr").over(I.w_rows(14))), "atr_14"),
    ).orderBy("symbol", "ts")


@register(
    "candle_anatomy",
    oracle=CANDLES_CTE
    + """
SELECT symbol, ts,
       round(abs(close - open), 6) AS body_size,
       round(high - greatest(open, close), 6) AS upper_shadow,
       round(least(open, close) - low, 6) AS lower_shadow,
       round(high - low, 6) AS candle_range,
       CAST(abs(close - open) < 0.1 * (high - low) AS INT) AS is_doji
FROM candles ORDER BY symbol, ts
""",
    doc="W14 — candle body/shadow geometry + doji flag "
    "(feature_engineer.py:275-280).",
)
def candle_anatomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    a = I.candle_anatomy()
    return c.select(
        "symbol",
        "ts",
        _r(a["body_size"], "body_size"),
        _r(a["upper_shadow"], "upper_shadow"),
        _r(a["lower_shadow"], "lower_shadow"),
        _r(a["candle_range"], "candle_range"),
        a["is_doji"].alias("is_doji"),
    ).orderBy("symbol", "ts")


@register(
    "open_gaps",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts,
       round(gap_pct, 6) AS gap_pct,
       CASE WHEN gap_pct > 0.1 THEN 'up'
            WHEN gap_pct < -0.1 THEN 'down'
            ELSE 'none' END AS gap_direction
FROM (
  SELECT symbol, ts,
         CASE WHEN lag(close) OVER ({_W_ORD}) <> 0
              THEN (open - lag(close) OVER ({_W_ORD})) / lag(close) OVER ({_W_ORD}) * 100 END AS gap_pct
  FROM candles
) t
WHERE gap_pct IS NOT NULL
ORDER BY symbol, ts
""",
    doc="W28 — open-gap detection vs previous close "
    "(market_filters.py:161-184).",
)
def open_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    g = I.gap_open()
    return (
        c.select(
            "symbol",
            "ts",
            _r(g["gap_pct"], "gap_pct"),
            g["gap_direction"].alias("gap_direction"),
        )
        .filter(F.col("gap_pct").isNotNull())
        .orderBy("symbol", "ts")
    )


@register(
    "session_windows",
    oracle="""
WITH e AS (
  SELECT event_type AS symbol, CAST(ts AS TIMESTAMP) AS ts, "value"
  FROM events
),
brk AS (
  SELECT symbol, ts, "value",
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
ids AS (
  SELECT symbol, ts, "value",
         sum(is_new) OVER (PARTITION BY symbol ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM brk
)
SELECT symbol,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       round(CAST(epoch_us(max(ts) - min(ts)) AS DOUBLE) / 60000000.0, 6)
         AS duration_min,
       count(*) AS n_events,
       round(min("value"), 6) AS min_value,
       round(max("value"), 6) AS max_value
FROM ids
GROUP BY symbol, sid
ORDER BY symbol, session_start
""",
    doc="ST8 — gap-based SESSION windows via Spark's native "
    "session_window (dynamic-gap sessionization the reference's fixed "
    "wall-clock trading sessions, market_filters.py:100-137, cannot "
    "express): events closer than 30 minutes merge into one session; "
    "session_window.end is last-event + gap, matching the oracle's "
    "gaps-and-islands replay (a new island when the gap is >= the "
    "timeout — Spark merges only OVERLAPPING [ts, ts+gap) windows).  "
    "Aggregates are deliberately order-insensitive (count / min / max "
    "/ exact timestamp arithmetic), so the row hash is "
    "engine-portable.  One shuffle on the symbol key; Spark merges "
    "sessions inside the aggregation, the streaming analog (watermark "
    "+ append) is exercised in tests/test_streaming.py.",
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    out = (
        e.groupBy(F.col("event_type").alias("symbol"), sw)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .select(
            "symbol",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            # duration from exact INTEGER micros with one double
            # division — the same operands DuckDB's epoch_us path
            # divides, so both engines round the same double.
            # (epoch(interval)/60.0 vs micros/6e7 differ in the last
            # ulp and flipped a round(,6) digit in the strict sweep.)
            F.round(
                (
                    F.unix_micros(F.col("session_window.end"))
                    - F.unix_micros(F.col("session_window.start"))
                    - F.lit(1_800_000_000).cast("long")
                ).cast("double")
                / 60000000.0,
                6,
            ).alias("duration_min"),
            "n_events",
            "min_value",
            "max_value",
        )
    )
    return out.orderBy("symbol", "session_start")


# ---- market-context features (X-series) ------------------------------------


@register(
    "session_features",
    oracle="""
SELECT event_id,
       CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hour,
       CAST(hour(CAST(ts AS TIMESTAMP)) >= 22 OR hour(CAST(ts AS TIMESTAMP)) <= 7 AS INT) AS is_sydney,
       CAST(hour(CAST(ts AS TIMESTAMP)) <= 9 AS INT)  AS is_tokyo,
       CAST(hour(CAST(ts AS TIMESTAMP)) >= 8 AND hour(CAST(ts AS TIMESTAMP)) <= 17 AS INT) AS is_london,
       CAST(hour(CAST(ts AS TIMESTAMP)) >= 13 AND hour(CAST(ts AS TIMESTAMP)) <= 22 AS INT) AS is_new_york,
       round(sin(2 * pi() * hour(CAST(ts AS TIMESTAMP)) / 24), 6) + 0 AS hour_sin,
       round(cos(2 * pi() * hour(CAST(ts AS TIMESTAMP)) / 24), 6) + 0 AS hour_cos,
       CASE WHEN hour(CAST(ts AS TIMESTAMP)) < 6 THEN 'night'
            WHEN hour(CAST(ts AS TIMESTAMP)) < 12 THEN 'morning'
            WHEN hour(CAST(ts AS TIMESTAMP)) < 18 THEN 'afternoon'
            WHEN hour(CAST(ts AS TIMESTAMP)) < 22 THEN 'evening'
            ELSE 'night' END AS time_of_day
FROM events ORDER BY event_id
""",
    doc="X1/X5/X6 — session flags (incl. midnight-wrapping Sydney; "
    "end-INCLUSIVE bounds like pandas .between), cyclical hour encoding, "
    "time-of-day bucket with 22-23 falling back to night "
    "(market_filters.py:100-137, 218-229, 272-287).",
)
def session_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    flags = X.session_flags("ts")
    cyc = X.cyclical_encodings("ts")
    return e.select(
        "event_id",
        F.hour("ts").cast("int").alias("hour"),
        flags["is_sydney"].alias("is_sydney"),
        flags["is_tokyo"].alias("is_tokyo"),
        flags["is_london"].alias("is_london"),
        flags["is_new_york"].alias("is_new_york"),
        _r(cyc["hour_sin"], "hour_sin"),
        _r(cyc["hour_cos"], "hour_cos"),
        X.time_of_day_bucket("ts").alias("time_of_day"),
    ).orderBy("event_id")


@register(
    "calendar_features",
    oracle="""
SELECT event_id,
       CAST(dayofmonth(CAST(ts AS TIMESTAMP)) AS INT) AS day,
       CAST(month(CAST(ts AS TIMESTAMP)) AS INT) AS month,
       CAST(quarter(CAST(ts AS TIMESTAMP)) AS INT) AS quarter,
       CAST((dayofweek(CAST(ts AS TIMESTAMP)) + 6) % 7 AS INT) AS day_of_week,
       CAST((dayofweek(CAST(ts AS TIMESTAMP)) + 6) % 7 >= 5 AS INT) AS is_weekend,
       round(sin(2 * pi() * month(CAST(ts AS TIMESTAMP)) / 12), 6) + 0 AS month_sin,
       round(cos(2 * pi() * month(CAST(ts AS TIMESTAMP)) / 12), 6) + 0 AS month_cos
FROM events ORDER BY event_id
""",
    doc="X3/X4/X5 — calendar + weekend features; day_of_week pinned to "
    "pandas convention Mon=0..Sun=6 (market_filters.py:186-215). "
    "DuckDB dayofweek is Sun=0..Sat=6 → (d+6)%7.",
)
def calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cal = X.calendar_features("ts")
    cyc = X.cyclical_encodings("ts")
    return e.select(
        "event_id",
        cal["day"].cast("int").alias("day"),
        cal["month"].cast("int").alias("month"),
        cal["quarter"].cast("int").alias("quarter"),
        cal["day_of_week"].cast("int").alias("day_of_week"),
        cal["is_weekend"].alias("is_weekend"),
        _r(cyc["month_sin"], "month_sin"),
        _r(cyc["month_cos"], "month_cos"),
    ).orderBy("event_id")


@register(
    "liquidity",
    oracle="""
SELECT hour, round(score, 6) AS liquidity_score,
       CASE WHEN score >= 0.8 THEN 'very_high'
            WHEN score >= 0.6 THEN 'high'
            WHEN score >= 0.3 THEN 'medium'
            ELSE 'low' END AS liquidity_level
FROM (
  SELECT DISTINCT CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hour,
     (CAST(hour(CAST(ts AS TIMESTAMP)) >= 22 OR hour(CAST(ts AS TIMESTAMP)) <= 7 AS INT) * 0.2
    + CAST(hour(CAST(ts AS TIMESTAMP)) <= 9 AS INT) * 0.4
    + CAST(hour(CAST(ts AS TIMESTAMP)) >= 8 AND hour(CAST(ts AS TIMESTAMP)) <= 17 AS INT) * 0.8
    + CAST(hour(CAST(ts AS TIMESTAMP)) >= 13 AND hour(CAST(ts AS TIMESTAMP)) <= 22 AS INT) * 0.9
    + CAST(hour(CAST(ts AS TIMESTAMP)) >= 13 AND hour(CAST(ts AS TIMESTAMP)) <= 17 AS INT) * 0.5
    + CAST((hour(CAST(ts AS TIMESTAMP)) >= 22 OR hour(CAST(ts AS TIMESTAMP)) <= 7)
           AND hour(CAST(ts AS TIMESTAMP)) <= 9 AS INT) * 0.2
    + CAST(hour(CAST(ts AS TIMESTAMP)) >= 8 AND hour(CAST(ts AS TIMESTAMP)) <= 9 AS INT) * 0.3
     ) / 2.2 AS score
  FROM events
) t
ORDER BY hour
""",
    doc="X7 — liquidity score per UTC hour: weighted session membership "
    "+ overlap bonuses (london_new_york 0.5, sydney_tokyo 0.2, "
    "tokyo_london 0.3), normalized by max attainable (london 0.8 + "
    "new_york 0.9 + overlap 0.5 = 2.2) (market_filters.py:233-270).",
)
def liquidity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    score = X.liquidity_score("ts")
    return (
        e.select(
            F.hour("ts").cast("int").alias("hour"),
            F.round(score, R).alias("liquidity_score"),
            X.liquidity_level(score).alias("liquidity_level"),
        )
        .distinct()
        .orderBy("hour")
    )


# ---- normalization (N-series) ----------------------------------------------


@register(
    "normalize_minmax",
    oracle=CANDLES_CTE
    + """
SELECT c.symbol, c.ts,
       round(CASE WHEN s.mx <> s.mn THEN (c.close - s.mn) / (s.mx - s.mn) ELSE 0.0 END, 6)
         AS close_normalized
FROM candles c
JOIN (SELECT symbol, min(close) AS mn, max(close) AS mx FROM candles GROUP BY symbol) s
  ON c.symbol = s.symbol
ORDER BY c.symbol, c.ts
""",
    doc="N1/N4 — min-max fit+apply per symbol; fit is a tiny aggregate "
    "broadcast back (normalizer.py:138-148, 176-207).",
)
def normalize_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    stats = c.groupBy("symbol").agg(
        F.min("close").alias("mn"), F.max("close").alias("mx")
    )
    return (
        c.join(F.broadcast(stats), "symbol")
        .select(
            "symbol",
            "ts",
            _r(
                F.when(
                    F.col("mx") != F.col("mn"),
                    (F.col("close") - F.col("mn")) / (F.col("mx") - F.col("mn")),
                ).otherwise(0.0),
                "close_normalized",
            ),
        )
        .orderBy("symbol", "ts")
    )


@register(
    "normalize_zscore",
    oracle=CANDLES_CTE
    + """
SELECT c.symbol, c.ts,
       round(CASE WHEN s.sd <> 0 THEN (c.close - s.mu) / s.sd ELSE 0.0 END, 6)
         AS close_normalized
FROM candles c
JOIN (SELECT symbol,
             (CAST(s1 AS DOUBLE) / n) / 100.0 AS mu,
             sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / (100.0 * n) AS sd
      FROM (SELECT symbol, count(*) AS n,
                   sum(CAST(round(close * 100) AS BIGINT)) AS s1,
                   sum(CAST(round(close * 100) AS BIGINT)
                       * CAST(round(close * 100) AS BIGINT)) AS s2
            FROM candles GROUP BY symbol) t) s
  ON c.symbol = s.symbol
ORDER BY c.symbol, c.ts
""",
    doc="N2/N4 — z-score with POPULATION std (ddof=0 like the reference "
    "np.std, normalizer.py:150-160 — not Spark's default sample "
    "stddev).  mu and sd derive from exact integer-cents sums "
    "(sd_pop = sqrt(n·Σc² − (Σc)²)/(100·n)): a whole-symbol avg/std is "
    "a parallel partial aggregation whose double association order "
    "drifts with partitioning, and z-scores land within 4e-11 of "
    "round(,6) boundaries here (boundary_audit.py) — integer sums make "
    "both engines' pre-round doubles bit-identical in any order.  "
    "Spark sums the squares in DECIMAL(38,0) for headroom past the "
    "int64 ~SF100 ceiling (DuckDB auto-promotes to HUGEINT).",
)
def normalize_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    from ..operators.indicators import cents as _cents
    cents = _cents("close")
    sums = c.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s1"),
        F.sum((cents * cents).cast("decimal(38,0)")).alias("s2"),
    )
    stats = sums.select(
        "symbol",
        ((F.col("s1").cast("double") / F.col("n")) / 100.0).alias("mu"),
        (
            F.sqrt(
                (
                    F.col("n").cast("decimal(38,0)") * F.col("s2")
                    - F.col("s1").cast("decimal(38,0)") * F.col("s1")
                ).cast("double")
            )
            / (100.0 * F.col("n"))
        ).alias("sd"),
    )
    return (
        c.join(F.broadcast(stats), "symbol")
        .select(
            "symbol",
            "ts",
            _r(
                F.when(
                    F.col("sd") != 0,
                    (F.col("close") - F.col("mu")) / F.col("sd"),
                ).otherwise(0.0),
                "close_normalized",
            ),
        )
        .orderBy("symbol", "ts")
    )


@register(
    "normalize_robust",
    oracle=CANDLES_CTE
    + """
SELECT c.symbol, c.ts,
       round(CASE WHEN s.q75 <> s.q25 THEN (c.close - s.med) / (s.q75 - s.q25) ELSE 0.0 END, 6)
         AS close_normalized
FROM candles c
JOIN (SELECT symbol,
             quantile_cont(close, 0.25) AS q25,
             quantile_cont(close, 0.5)  AS med,
             quantile_cont(close, 0.75) AS q75
      FROM candles GROUP BY symbol) s
  ON c.symbol = s.symbol
ORDER BY c.symbol, c.ts
""",
    doc="N3/N4 — robust scaling on exact interpolated percentiles "
    "(normalizer.py:162-174); Spark percentile() == DuckDB "
    "quantile_cont. At 100 TB switch to approx_percentile (documented "
    "tolerance) — correctness tier stays exact.",
)
def normalize_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    stats = c.groupBy("symbol").agg(
        F.expr("percentile(close, 0.25)").alias("q25"),
        F.expr("percentile(close, 0.5)").alias("med"),
        F.expr("percentile(close, 0.75)").alias("q75"),
    )
    return (
        c.join(F.broadcast(stats), "symbol")
        .select(
            "symbol",
            "ts",
            _r(
                F.when(
                    F.col("q75") != F.col("q25"),
                    (F.col("close") - F.col("med")) / (F.col("q75") - F.col("q25")),
                ).otherwise(0.0),
                "close_normalized",
            ),
        )
        .orderBy("symbol", "ts")
    )


# ---- round-2 coverage queries (S2, F7-F9, A7, W7, W12) ---------------------


@register(
    "latest_quote",
    oracle="""
SELECT event_type AS symbol,
       CAST(max(CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS ts,
       round(max_by("value", event_id), 6) AS last_value
FROM events
GROUP BY event_type
ORDER BY symbol
""",
    doc="S2 — latest-quote scan: last value per symbol by ingest order "
    "(data_fetcher.py:329-374; event_id is the unique time-ordered "
    "key, so max_by is the deterministic ordered-last).",
)
def latest_quote(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("event_type").alias("symbol"))
        .agg(
            F.max("ts").alias("ts"),
            _r(F.max_by("value", "event_id"), "last_value"),
        )
        .orderBy("symbol")
    )


@register(
    "trading_hours_filter",
    oracle=CANDLES_CTE
    + """
SELECT symbol,
       count(*) AS n_total,
       CAST(count(*) FILTER (WHERE (hour(ts) >= 8 AND hour(ts) <= 17)
                                OR (hour(ts) >= 13 AND hour(ts) <= 22)) AS BIGINT)
         AS n_in_session
FROM candles
GROUP BY symbol
ORDER BY symbol
""",
    doc="F8 — trading-hours filter: rows inside the london or new_york "
    "sessions (end-inclusive bounds, market_filters.py:289-331).",
)
def trading_hours_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    h = F.hour("ts")
    in_sess = X.in_session(h, *X.SESSIONS["london"]) | X.in_session(
        h, *X.SESSIONS["new_york"]
    )
    return (
        c.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(in_sess).alias("n_in_session"),
        )
        .orderBy("symbol")
    )


@register(
    "high_liquidity_filter",
    oracle=CANDLES_CTE
    + """
, scored AS (
  SELECT symbol, ts,
     (CAST(hour(ts) >= 22 OR hour(ts) <= 7 AS INT) * 0.2
    + CAST(hour(ts) <= 9 AS INT) * 0.4
    + CAST(hour(ts) >= 8 AND hour(ts) <= 17 AS INT) * 0.8
    + CAST(hour(ts) >= 13 AND hour(ts) <= 22 AS INT) * 0.9
    + CAST(hour(ts) >= 13 AND hour(ts) <= 17 AS INT) * 0.5
    + CAST((hour(ts) >= 22 OR hour(ts) <= 7) AND hour(ts) <= 9 AS INT) * 0.2
    + CAST(hour(ts) >= 8 AND hour(ts) <= 9 AS INT) * 0.3
     ) / 2.2 AS score
  FROM candles
)
SELECT symbol, count(*) AS n_high_liquidity
FROM scored
WHERE score >= 0.6
GROUP BY symbol
ORDER BY symbol
""",
    doc="F9 — high-liquidity filter: keep rows whose liquidity level is "
    "high or very_high (score >= 0.6, market_filters.py:333-352).",
)
def high_liquidity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    score = X.liquidity_score("ts")
    return (
        c.filter(score >= 0.6)
        .groupBy("symbol")
        .agg(F.count(F.lit(1)).alias("n_high_liquidity"))
        .orderBy("symbol")
    )


@register(
    "quality_level_filter",
    oracle=CANDLES_CTE
    + """
, per AS (
  SELECT symbol,
         count(*) AS n_rows,
         (epoch(max(ts)) - epoch(min(ts))) / 3600 + 1 AS expected
  FROM candles GROUP BY symbol
),
scored AS (
  SELECT symbol, n_rows,
         greatest(1.0
           - (CASE WHEN 100.0 * (expected - n_rows) / expected > 10.0
                   THEN 0.15 ELSE 0.0 END)
           - (CASE WHEN n_rows < 10 THEN 0.2 ELSE 0.0 END), 0.0) AS score
  FROM per
)
SELECT symbol, CAST(n_rows AS BIGINT) AS n_rows, round(score, 6) AS quality_score
FROM scored
WHERE score >= 0.8
ORDER BY symbol
""",
    doc="F7 — quality-level predicate on scan results (repository.py"
    ":205-207; min_quality_score request param): symbols whose "
    "gap/short-series quality score reaches 'good' (>= 0.8).  Adapted: "
    "the testdata events carry no stored per-row quality column, so "
    "the score is the D8 gap/length component computed inline.",
)
def quality_level_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    expected = (F.max("ts").cast("double") - F.min("ts").cast("double")) / 3600.0 + 1.0
    per = c.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_rows"), expected.alias("expected")
    )
    gap_pct = 100.0 * (F.col("expected") - F.col("n_rows")) / F.col("expected")
    score = F.greatest(
        F.lit(1.0)
        - F.when(gap_pct > 10.0, 0.15).otherwise(0.0)
        - F.when(F.col("n_rows") < 10, 0.2).otherwise(0.0),
        F.lit(0.0),
    )
    return (
        per.withColumn("quality_score", F.round(score, R))
        .filter(F.col("quality_score") >= 0.8)
        .select("symbol", "n_rows", "quality_score")
        .orderBy("symbol")
    )


@register(
    "volatility_scalar",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol,
       round(stddev_pop(ret) * 100, 6) AS volatility_pct
FROM (
  SELECT symbol,
         CASE WHEN lag(close) OVER ({_W_ORD}) <> 0
              THEN (close - lag(close) OVER ({_W_ORD})) / lag(close) OVER ({_W_ORD})
         END AS ret
  FROM candles
) t
GROUP BY symbol
ORDER BY symbol
""",
    doc="A7 — scalar volatility: population std of simple returns x100 "
    "(persistence.py:468-483; np.std ddof=0).",
)
def volatility_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    c = c.withColumn("ret", I.pct_change())
    return (
        c.groupBy("symbol")
        .agg(_r(F.stddev_pop("ret") * 100.0, "volatility_pct"))
        .orderBy("symbol")
    )


@register(
    "volume_ratio",
    oracle=CANDLES_CTE
    + f"""
SELECT symbol, ts,
       round(CASE WHEN row_number() OVER ({_W_ORD}) >= 20
             THEN CAST(sum(CAST(round(volume * 100) AS BIGINT)) OVER ({_frame(20)}) AS DOUBLE) / 2000.0 END, 6) AS volume_sma_20,
       round(coalesce(
         volume / (CASE WHEN row_number() OVER ({_W_ORD}) >= 20
                   THEN CAST(sum(CAST(round(volume * 100) AS BIGINT)) OVER ({_frame(20)}) AS DOUBLE) / 2000.0 END), 1.0), 6)
         AS volume_ratio
FROM candles
ORDER BY symbol, ts
""",
    doc="W7 — volume SMA(20) + volume/sma ratio with warm-up "
    "coalesced to 1.0 (feature_engineer.py:206-219 fillna(1.0)).  SMA "
    "from exact integer-cents sums (volume_ratio sat 8e-12 from a "
    "round(,6) boundary — boundary_audit.py).",
)
def volume_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    sma_v = I.sma_exact("volume", 20)
    return c.select(
        "symbol",
        "ts",
        _r(sma_v, "volume_sma_20"),
        _r(F.coalesce(F.col("volume") / sma_v, F.lit(1.0)), "volume_ratio"),
    ).orderBy("symbol", "ts")


@register(
    "normalize_roundtrip",
    oracle=CANDLES_CTE
    + """
SELECT c.symbol, c.ts,
       round(CASE WHEN s.mx <> s.mn THEN (c.close - s.mn) / (s.mx - s.mn) ELSE 0.0 END, 6)
         AS close_normalized,
       round((CASE WHEN s.mx <> s.mn THEN (c.close - s.mn) / (s.mx - s.mn) ELSE 0.0 END)
             * (s.mx - s.mn) + s.mn, 6) AS close_denorm
FROM candles c
CROSS JOIN (SELECT min(close) AS mn, max(close) AS mx FROM candles) s
ORDER BY c.symbol, c.ts
""",
    doc="N4+N5 — minmax normalize then denormalize (inverse transform, "
    "normalizer.py:209-234) through the fit/transform library path: the "
    "1-row params frame is broadcast to both directions, so the whole "
    "round trip is shuffle-free after the fit aggregate.",
)
def normalize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import normalize as N

    c = candles_from_events(spark, sf_dir)
    params = N.fit_params(c, ["close"])
    norm = N.apply_normalization(c, params, ["close"], "minmax")
    denorm = N.denormalize(
        norm.select("symbol", "ts", "close_normalized"), params, ["close"], "minmax"
    )
    return denorm.select(
        "symbol",
        "ts",
        _r(F.col("close_normalized"), "close_normalized"),
        _r(F.col("close_denorm"), "close_denorm"),
    ).orderBy("symbol", "ts")


@register(
    "normalize_validation",
    oracle=CANDLES_CTE
    + """
, norm AS (
  SELECT CASE WHEN s.sd <> 0 THEN (c.close - s.mu) / s.sd ELSE 0.0 END AS n
  FROM candles c
  CROSS JOIN (SELECT avg(close) AS mu, stddev_pop(close) AS sd FROM candles) s
)
SELECT (abs(avg(n)) <= 0.1 AND abs(stddev_pop(n) - 1.0) <= 0.1) AS close_ok,
       (count(*) FILTER (WHERE n IS NULL OR isnan(n)) = 0) AS close_finite
FROM norm
""",
    doc="N7 — normalization self-validation (normalizer.py:399-443): "
    "z-score output must have mean≈0, std≈1 (tol 0.1) and be finite; "
    "one assertion aggregate over the normalized frame.",
)
def normalize_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import normalize as N

    c = candles_from_events(spark, sf_dir)
    params = N.fit_params(c, ["close"])
    norm = N.apply_normalization(c, params, ["close"], "zscore")
    return N.validate_normalization(norm, ["close"], "zscore")


@register(
    "vwap_daily",
    oracle=CANDLES_CTE
    + """
SELECT symbol,
       date_trunc('day', ts) AS day,
       round((CAST(sum(CAST(round(close * 100) AS BIGINT)
                   * CAST(round(volume * 100) AS BIGINT)) AS DOUBLE) / 100.0)
             / sum(CAST(round(volume * 100) AS BIGINT)), 6) AS vwap,
       CAST(sum(n_events) AS BIGINT) AS transactions
FROM candles
GROUP BY 1, 2
ORDER BY symbol, day
""",
    doc="S5 — VWAP + transaction-count columns of the Polygon aggregates "
    "source (polygon_client.py:119-120): vwap = sum(price*vol)/sum(vol) "
    "re-expressed as a per-symbol/day aggregate over candles; one shuffle "
    "with map-side partial agg.  Both factors sit on the 2dp grid, so "
    "the sums run as exact integer 1e-4 units — vwap came within 4e-10 "
    "of a round(,6) boundary at sf0.1 (boundary_audit.py) and a "
    "parallel-partial double sum could drift across it.",
)
def vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    from ..operators.indicators import cents as _cents
    pc = _cents("close")
    vc = _cents("volume")
    return (
        c.groupBy("symbol", F.date_trunc("day", "ts").alias("day"))
        .agg(
            _r(
                (F.sum(pc * vc).cast("double") / 100.0) / F.sum(vc),
                "vwap",
            ),
            F.sum("n_events").alias("transactions"),
        )
        .orderBy("symbol", "day")
    )


@register(
    "symbol_stats",
    oracle=CANDLES_CTE
    + """
SELECT symbol,
       count(*) AS n_candles,
       min(ts) AS first_ts,
       max(ts) AS last_ts,
       round(min(close), 6) AS min_close,
       round(max(close), 6) AS max_close,
       round(sum(CAST(round(close * 100) AS BIGINT)) / 100.0 / count(*), 6) AS avg_close,
       round(sum(CAST(round(volume * 100) AS BIGINT)) / 100.0, 6) AS total_volume
FROM candles
GROUP BY symbol
ORDER BY symbol
""",
    doc="A5 — whole-symbol summary stats: count, first/last timestamp, "
    "close min/max/avg, total volume (repository.py:506-538).  One "
    "aggregation with map-side partial combine; avg/sum as exact "
    "integer-cents (grid inputs, whole-symbol parallel partials — see "
    "daily_stats).",
)
def symbol_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    from ..operators.indicators import cents
    return (
        c.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_candles"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            _r(F.min("close"), "min_close"),
            _r(F.max("close"), "max_close"),
            _r(F.sum(cents("close")) / 100.0 / F.count(F.lit(1)), "avg_close"),
            _r(F.sum(cents("volume")) / 100.0, "total_volume"),
        )
        .orderBy("symbol")
    )


@register(
    "asof_enrich",
    oracle=CANDLES_CTE
    + """
, ticks AS (
  SELECT event_id, event_type AS symbol, CAST(ts AS TIMESTAMP) AS ts,
         round("value", 6) AS value
  FROM events
)
SELECT t.event_id, t.symbol, t.ts, t.value,
       c.close AS last_close
FROM ticks t
ASOF LEFT JOIN candles c
  ON t.symbol = c.symbol AND t.ts >= c.ts
ORDER BY t.event_id
""",
    doc="As-of join — enrich every tick with the latest candle close at "
    "or before its timestamp.  Spark has no ASOF JOIN; the scalable "
    "re-expression is the union-and-carry pattern: tag both streams, "
    "sort once per symbol, and carry the last non-null quote forward "
    "with last(ignorenulls) over (symbol, ts, side) — ONE shuffle total "
    "(the per-symbol sort), versus a theta join's O(ticks x quotes) "
    "explosion.  Quotes order before ticks at equal ts to match ASOF's "
    "inclusive (>=) semantics.  Oracle: DuckDB's native ASOF LEFT JOIN.",
)
def asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    ticks = e.select(
        F.col("event_id"),
        F.col("event_type").alias("symbol"),
        "ts",
        F.round("value", R).alias("value"),
        F.lit(1).alias("side"),  # ticks after quotes at equal ts
        F.lit(None).cast("double").alias("q_close"),
    )
    quotes = c.select(
        F.lit(None).cast("long").alias("event_id"),
        "symbol",
        "ts",
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("side"),
        F.col("close").alias("q_close"),
    )
    merged = quotes.unionByName(ticks)
    w = (
        Window.partitionBy("symbol")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "last_close", F.last("q_close", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("side") == 1)
        .select("event_id", "symbol", "ts", "value", "last_close")
        .orderBy("event_id")
    )


@register(
    "range_join_sessions",
    oracle="""
SELECT e.event_type AS symbol,
       CAST(date_trunc('day', CAST(e.ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
       count(*) AS n_events,
       round(sum(CAST(round(e."value" * 100) AS BIGINT)) / 100.0 / count(*), 6) AS avg_value
FROM events e
WHERE CAST(e.ts AS TIMESTAMP) >= date_trunc('day', CAST(e.ts AS TIMESTAMP)) + INTERVAL 7 HOURS
  AND CAST(e.ts AS TIMESTAMP) <  date_trunc('day', CAST(e.ts AS TIMESTAMP)) + INTERVAL 17 HOURS
GROUP BY 1, 2
ORDER BY symbol, day
""",
    doc="Range join — events against per-day [07:00, 17:00) session "
    "intervals.  The scale-safe Spark shape derives the interval KEY "
    "(the day) on the fact side so the range predicate collapses to a "
    "bucket filter — no theta join, no interval broadcast, single "
    "aggregation with map-side combine.  The same pattern handles "
    "arbitrary interval tables: equi-join on a derived bucket key, then "
    "refine with the residual range predicate.",
)
def range_join_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.indicators import cents as _scan_cents

    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    in_session = (F.col("ts") >= day + F.expr("INTERVAL 7 HOURS")) & (
        F.col("ts") < day + F.expr("INTERVAL 17 HOURS")
    )
    return (
        e.filter(in_session)
        .groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # integer-cents avg: exact under any partial-agg order
            # (see daily_stats — same boundary-sitting avg values)
            _r(
                F.sum(_scan_cents("value"))
                / 100.0
                / F.count(F.lit(1)),
                "avg_value",
            ),
        )
        .orderBy("symbol", "day")
    )


@register(
    "rollup_weekly",
    oracle=CANDLES_CTE
    + """
SELECT symbol,
       CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
       round(min_by(open, ts), 6) AS open,
       round(max(high), 6) AS high,
       round(min(low), 6) AS low,
       round(max_by(close, ts), 6) AS close,
       round(sum(volume), 6) AS volume,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM candles
GROUP BY 1, 2
ORDER BY symbol, week
""",
    doc="Hypertable rollup cascade — weekly candles RE-AGGREGATED from "
    "the hourly silver table rather than raw events (the continuous-"
    "aggregate pattern: each granularity reads the one below, so a "
    "100 TB event table is scanned once, not once per granularity).  "
    "Ordered open/close survive the cascade via min_by/max_by on the "
    "bucket timestamp; all other measures are trivially re-aggregable.",
)
def rollup_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return (
        c.groupBy("symbol", F.date_trunc("week", "ts").alias("week"))
        .agg(
            _r(F.min_by("open", "ts"), "open"),
            _r(F.max("high"), "high"),
            _r(F.min("low"), "low"),
            _r(F.max_by("close", "ts"), "close"),
            _r(F.sum("volume"), "volume"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("symbol", "week")
    )

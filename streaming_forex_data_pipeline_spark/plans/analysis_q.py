"""Analysis workloads (SURVEY §2.11 P-series): candlestick patterns,
trading signals, backtest metrics.

The reference implements these as Python loops over pandas frames
(app/services/analysis/); every per-row decision here is lag-window
Column algebra, and only the position-state event loop (P6) uses the
sanctioned per-symbol ``applyInPandas`` escape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import backtest as B
from ..operators import patterns as P
from ..sources.tables import CANDLES_CTE, candles_from_events
from .registry import register

R = 6
_W = "PARTITION BY symbol ORDER BY ts"

_PATTERNS_BASE = f"""
, lagd AS (
  SELECT symbol, ts, open, high, low, close,
         lag(open)  OVER ({_W}) AS p_o,
         lag(close) OVER ({_W}) AS p_c,
         lag(open, 2)  OVER ({_W}) AS f_o,
         lag(close, 2) OVER ({_W}) AS f_c,
         abs(close - open) AS body,
         high - low AS rng,
         least(open, close) - low AS lower_sh,
         high - greatest(open, close) AS upper_sh
  FROM candles
),
feat AS (
  SELECT *,
         abs(p_c - p_o) AS p_body,
         abs(f_c - f_o) AS f_body,
         body / rng AS body_ratio,
         lower_sh / rng AS lower_ratio,
         upper_sh / rng AS upper_ratio
  FROM lagd
)
"""


@register(
    "patterns",
    oracle=CANDLES_CTE
    + _PATTERNS_BASE
    + """
SELECT * FROM (
  SELECT symbol, ts, 'doji' AS pattern,
         CASE WHEN body_ratio <= 0.05 THEN 'high' ELSE 'medium' END AS confidence,
         round(close, 6) AS price_level,
         round(least(1.0, 1.0 - body_ratio), 6) AS signal_strength
  FROM feat WHERE rng > 0 AND body_ratio <= 0.1
  UNION ALL
  SELECT symbol, ts, 'hammer',
         CASE WHEN lower_ratio >= 0.7 THEN 'high' ELSE 'medium' END,
         round(close, 6),
         round(least(1.0, lower_ratio), 6)
  FROM feat
  WHERE rng > 0 AND body > 0 AND lower_ratio >= 0.6 AND body_ratio <= 0.3
    AND upper_ratio <= 0.1 AND p_c < p_o
  UNION ALL
  SELECT symbol, ts, 'bullish_engulfing',
         'medium',
         round(close, 6),
         round(least(1.0, body / (p_body + 1e-6)), 6)
  FROM feat
  WHERE p_c < p_o AND close > open AND open < p_c AND close > p_o AND body > p_body
  UNION ALL
  SELECT symbol, ts, 'bearish_engulfing',
         'medium',
         round(close, 6),
         round(least(1.0, body / (p_body + 1e-6)), 6)
  FROM feat
  WHERE p_c > p_o AND close < open AND open > p_c AND close < p_o AND body > p_body
  UNION ALL
  SELECT symbol, ts, 'morning_star',
         CASE WHEN least(1.0, body / (f_body + 1e-6)) > 0.8
              THEN 'high' ELSE 'medium' END,
         round(close, 6),
         round(least(1.0, body / (f_body + 1e-6)), 6)
  FROM feat
  WHERE f_c < f_o AND p_body < f_body * 0.3 AND close > open
    AND close > (f_o + f_c) / 2
  UNION ALL
  SELECT symbol, ts, 'evening_star',
         CASE WHEN least(1.0, body / (f_body + 1e-6)) > 0.8
              THEN 'high' ELSE 'medium' END,
         round(close, 6),
         round(least(1.0, body / (f_body + 1e-6)), 6)
  FROM feat
  WHERE f_c > f_o AND p_body < f_body * 0.3 AND close < open
    AND close < (f_o + f_c) / 2
) u
ORDER BY symbol, ts, pattern
""",
    doc="P1 — candlestick patterns (doji/hammer/engulfing/stars) as "
    "lag(1..2) boolean predicates emitting one row per (symbol, ts, "
    "pattern) with confidence + strength "
    "(pattern_detection.py:102-286; reference loops vectorized away).  "
    "Engulfing confidence is always 'medium' because the reference "
    "caps strength at 1.0 before its >1.5 high-confidence test — "
    "quirk preserved.",
)
def patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    out = P.detect_patterns(c)
    return out.select(
        "symbol",
        "ts",
        "pattern",
        "confidence",
        F.round("price_level", R).alias("price_level"),
        F.round("signal_strength", R).alias("signal_strength"),
    ).orderBy("symbol", "ts", "pattern")


_SIG_SMA_CTE = f"""
, ma AS (
  SELECT symbol, ts, close,
         CASE WHEN row_number() OVER ({_W}) >= 10
              THEN avg(close) OVER ({_W} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
         END AS fast,
         CASE WHEN row_number() OVER ({_W}) >= 20
              THEN avg(close) OVER ({_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         END AS slow
  FROM candles
),
crossed AS (
  SELECT symbol, ts, close, fast, slow,
         lag(fast) OVER ({_W}) AS p_fast,
         lag(slow) OVER ({_W}) AS p_slow
  FROM ma
)
"""


@register(
    "signals_sma",
    oracle=CANDLES_CTE
    + _SIG_SMA_CTE
    + """
SELECT symbol, ts,
       CASE WHEN fast > slow AND p_fast <= p_slow THEN 1
            WHEN fast < slow AND p_fast >= p_slow THEN -1
            ELSE 0 END AS signal
FROM crossed
ORDER BY symbol, ts
""",
    doc="P5 — SMA(10/20) cross strategy signals: +1 on upward cross, -1 "
    "on downward, 0 otherwise; warm-up rows compare NULL -> 0 "
    "(backtesting_engine.py:178-203).",
)
def signals_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return (
        B.sma_cross_signals(c)
        .select("symbol", "ts", "signal")
        .orderBy("symbol", "ts")
    )


@register(
    "signals_rsi",
    oracle=CANDLES_CTE
    + f"""
, d AS (
  SELECT symbol, ts, close,
         close - lag(close) OVER ({_W}) AS delta,
         row_number() OVER ({_W}) AS rn
  FROM candles
),
gl AS (
  SELECT symbol, ts, rn,
         CASE WHEN delta > 0 THEN delta ELSE 0.0 END AS gain,
         CASE WHEN delta < 0 THEN -delta ELSE 0.0 END AS loss
  FROM d
),
r AS (
  SELECT symbol, ts,
         CASE WHEN rn >= 14
              THEN avg(gain) OVER ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
         END AS ag,
         CASE WHEN rn >= 14
              THEN avg(loss) OVER ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
         END AS al
  FROM gl
),
rsi AS (
  SELECT symbol, ts,
         CASE WHEN ag + al <> 0 THEN 100.0 * ag / (ag + al) END AS rsi
  FROM r
),
x AS (
  SELECT symbol, ts, rsi, lag(rsi) OVER ({_W}) AS p_rsi FROM rsi
)
SELECT symbol, ts,
       CASE WHEN rsi > 30 AND p_rsi <= 30 THEN 1
            WHEN rsi < 70 AND p_rsi >= 70 THEN -1
            ELSE 0 END AS signal
FROM x
ORDER BY symbol, ts
""",
    doc="P5 — RSI(14) band-exit strategy signals using the "
    "rolling-mean RSI variant (backtesting_engine.py:213-248; the "
    "second in-reference RSI definition, SURVEY §2.14).",
)
def signals_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    return (
        B.rsi_exit_signals(c)
        .select("symbol", "ts", "signal")
        .orderBy("symbol", "ts")
    )


@register(
    "backtest_trades",
    oracle=None,
    doc="P6 — closed-trade ledger from the SMA-cross strategy through "
    "the reference event loop (entry sizing 10%, commission both "
    "sides, opposite-signal/±5%-stop exits, end-of-data force close; "
    "backtesting_engine.py:284-379).  Sequential per symbol -> "
    "applyInPandas; not SQL-expressible (driver rows-only check; "
    "differential-tested in tests/test_backtest.py against an "
    "independent simulation).",
)
def backtest_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    sig = B.sma_cross_signals(c)
    out = B.backtest_trades(sig)
    return out.select(
        "symbol",
        "entry_time",
        "exit_time",
        F.round("entry_price", R).alias("entry_price"),
        F.round("exit_price", R).alias("exit_price"),
        "trade_type",
        F.round("size", R).alias("size"),
        F.round("commission", R).alias("commission"),
        F.round("pnl", R).alias("pnl"),
        F.round("return_pct", R).alias("return_pct"),
    ).orderBy("symbol", "entry_time")


@register(
    "backtest_metrics",
    oracle=None,
    doc="P6+A9 — per-symbol portfolio metrics (win rate, PnL, max "
    "drawdown over the capital curve, Sharpe with 2% risk-free and "
    "population std, profit factor, win/loss streaks; "
    "backtesting_engine.py:79-160, 441-467).  Same applyInPandas "
    "kernel as backtest_trades; metrics derived from the ordered "
    "trade list exactly as BacktestResult does.",
)
def backtest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = candles_from_events(spark, sf_dir)
    sig = B.sma_cross_signals(c)
    out = B.backtest_metrics(sig)
    cols = ["symbol", "total_trades", "winning_trades", "losing_trades"]
    rounded = [
        F.round(c_, R).alias(c_)
        for c_ in [
            "win_rate",
            "total_pnl",
            "final_capital",
            "total_return",
            "max_drawdown",
            "sharpe_ratio",
            "profit_factor",
        ]
    ]
    return out.select(
        *cols, *rounded, "max_consecutive_wins", "max_consecutive_losses"
    ).orderBy("symbol")

"""Candlestick pattern detection (SURVEY §2.11 P1).

The reference loops row-by-row emitting PatternSignal objects
(app/services/analysis/pattern_detection.py:102-286); every pattern is
really a 1-3 candle lookback predicate, so here each is a boolean
Column over lag(1)/lag(2) windows and the detector emits one row per
(symbol, ts, pattern) via inline+filter — fully vectorized, one
per-symbol sort serves all patterns.

Semantics notes (kept faithful, including reference quirks):
- engulfing strength is capped at 1.0 BEFORE the >1.5 confidence test
  (pattern_detection.py:191-193), so engulfing confidence is always
  'medium' — replicated, not "fixed".
- star strength = min(1, third_body/(first_body+1e-6)) with HIGH at
  >0.8; doji HIGH at body_ratio <= threshold/2; hammer HIGH at
  lower_ratio >= 0.7.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DOJI_THRESHOLD = 0.1


def _body(o: Column, c: Column) -> Column:
    return F.abs(c - o)


def detect_patterns(
    df: DataFrame, symbol: str = "symbol", ts: str = "ts"
) -> DataFrame:
    """One row per detected (symbol, ts, pattern) with confidence,
    price_level and signal_strength."""
    w = Window.partitionBy(symbol).orderBy(ts)
    # materialize the lag columns in a separate projection: window exprs
    # are not allowed inside the generator (explode) expression tree
    base = df.select(
        symbol,
        ts,
        "open",
        "high",
        "low",
        "close",
        F.lag("open").over(w).alias("__p_o"),
        F.lag("close").over(w).alias("__p_c"),
        F.lag("open", 2).over(w).alias("__f_o"),
        F.lag("close", 2).over(w).alias("__f_c"),
    )
    o, h, lo, c = F.col("open"), F.col("high"), F.col("low"), F.col("close")
    body = _body(o, c)
    rng = h - lo
    lower_sh = F.least(o, c) - lo
    upper_sh = h - F.greatest(o, c)
    bullish = c > o
    bearish = c < o

    p_o, p_c = F.col("__p_o"), F.col("__p_c")
    p_body = _body(p_o, p_c)
    p_bull, p_bear = p_c > p_o, p_c < p_o

    # two-back candle for star patterns: "first" = lag 2, "star" = lag 1
    f_o, f_c = F.col("__f_o"), F.col("__f_c")
    f_body = _body(f_o, f_c)
    f_bull, f_bear = f_c > f_o, f_c < f_o

    body_ratio = body / rng
    lower_ratio = lower_sh / rng
    upper_ratio = upper_sh / rng

    doji = (rng > 0) & (body_ratio <= DOJI_THRESHOLD)
    doji_conf = F.when(body_ratio <= DOJI_THRESHOLD / 2, "high").otherwise("medium")
    doji_strength = 1.0 - body_ratio

    hammer = (
        (rng > 0)
        & (body > 0)
        & (lower_ratio >= 0.6)
        & (body_ratio <= 0.3)
        & (upper_ratio <= 0.1)
        & p_bear
    )
    hammer_conf = F.when(lower_ratio >= 0.7, "high").otherwise("medium")

    eng_strength = F.least(F.lit(1.0), body / (p_body + 1e-6))
    bull_engulf = p_bear & bullish & (o < p_c) & (c > p_o) & (body > p_body)
    bear_engulf = p_bull & bearish & (o > p_c) & (c < p_o) & (body > p_body)
    # capped strength can never exceed 1.5 -> always medium (ref :191-193)
    eng_conf = F.when(eng_strength > 1.5, "high").otherwise("medium")

    star_strength = F.least(F.lit(1.0), body / (f_body + 1e-6))
    star_small = p_body < f_body * 0.3
    morning = f_bear & star_small & bullish & (c > (f_o + f_c) / 2)
    evening = f_bull & star_small & bearish & (c < (f_o + f_c) / 2)
    star_conf = F.when(star_strength > 0.8, "high").otherwise("medium")

    def sig(cond: Column, name: str, conf: Column, strength: Column) -> Column:
        return F.when(
            cond,
            F.struct(
                F.lit(name).alias("pattern"),
                conf.alias("confidence"),
                c.alias("price_level"),
                F.least(F.lit(1.0), strength).alias("signal_strength"),
            ),
        )

    signals = F.array(
        sig(doji, "doji", doji_conf, doji_strength),
        sig(hammer, "hammer", hammer_conf, lower_ratio),
        sig(bull_engulf, "bullish_engulfing", eng_conf, eng_strength),
        sig(bear_engulf, "bearish_engulfing", eng_conf, eng_strength),
        sig(morning, "morning_star", star_conf, star_strength),
        sig(evening, "evening_star", star_conf, star_strength),
    )
    return (
        base.select(
            symbol,
            ts,
            F.explode(F.filter(signals, lambda s: s.isNotNull())).alias("s"),
        )
        .select(
            symbol,
            ts,
            F.col("s.pattern").alias("pattern"),
            F.col("s.confidence").alias("confidence"),
            F.col("s.price_level").alias("price_level"),
            F.col("s.signal_strength").alias("signal_strength"),
        )
    )

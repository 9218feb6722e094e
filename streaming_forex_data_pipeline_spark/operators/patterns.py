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


def support_resistance_levels(
    df: DataFrame,
    window: int = 20,
    min_touches: int = 2,
    symbol: str = "symbol",
    ts: str = "ts",
) -> DataFrame:
    """P2 — support/resistance levels: centered rolling(window) min/max
    local-extremum detection + touch counting within ±2·window rows at
    0.2% tolerance (pattern_detection.py:288-349).

    pandas center=True with even window w = frame [i-w/2, i+w/2-1].
    Touch counting needs each neighborhood value against the CURRENT
    row's level -> bounded list window (O(4·window) array per row), the
    same pattern as CCI's MAD.  Only interior rows i ∈ [w, n-w) emit.
    """
    w = Window.partitionBy(symbol).orderBy(ts)
    half = window // 2
    centered = w.rowsBetween(-half, half - 1)
    hood = w.rowsBetween(-2 * window, 2 * window - 1)
    rn = F.row_number().over(w)
    n_all = F.count(F.lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )

    base = df.select(
        symbol,
        ts,
        "high",
        "low",
        F.min("low").over(centered).alias("__cmin"),
        F.max("high").over(centered).alias("__cmax"),
        F.collect_list("low").over(hood).alias("__lows"),
        F.collect_list("high").over(hood).alias("__highs"),
        rn.alias("__rn"),
        n_all.alias("__n"),
    )
    interior = (F.col("__rn") >= window + 1) & (F.col("__rn") <= F.col("__n") - window)

    def level_rows(kind: str, price_col: str, arr: str, is_min: bool):
        level = F.col(price_col)
        extremum = level == F.col("__cmin" if is_min else "__cmax")
        # |x - level| / level < tol rewritten as |x - level| < tol * level:
        # identical for level > 0 (prices), and a zero level yields False
        # instead of an ANSI-mode DIVIDE_BY_ZERO (the reference's pandas
        # inf-comparison also yields False there).
        touches = F.size(
            F.filter(
                F.col(arr), lambda x: F.abs(x - level) < level * 0.002
            )
        )
        return (
            base.filter(interior & extremum)
            .withColumn("touches", touches)
            .filter(F.col("touches") >= min_touches)
            .select(
                symbol,
                ts,
                F.lit(kind).alias("pattern"),
                F.when(F.col("touches") >= 4, "high")
                .otherwise("medium")
                .alias("confidence"),
                level.alias("price_level"),
                F.least(F.lit(1.0), F.col("touches") / 5.0).alias(
                    "signal_strength"
                ),
                F.col("touches"),
            )
        )

    sup = level_rows("support", "low", "__lows", True)
    res = level_rows("resistance", "high", "__highs", False)
    return sup.unionByName(res)


def trend_signals(
    df: DataFrame, window: int = 20, symbol: str = "symbol", ts: str = "ts"
) -> DataFrame:
    """P3 — trend-change detection: MA(w/2) vs MA(w) regime flip with
    strength = |Δprice over w| / (σ·w), noise-filtered at 0.3
    (pattern_detection.py:351-400).  Volatility is the sample std of
    the w rows ENDING AT THE PREVIOUS row (iloc[i-w:i])."""
    w = Window.partitionBy(symbol).orderBy(ts)
    rn = F.row_number().over(w)
    ma_s = F.avg("close").over(w.rowsBetween(-(window // 2 - 1), 0))
    ma_l = F.avg("close").over(w.rowsBetween(-(window - 1), 0))
    trend = F.when(ma_s > ma_l, "up").otherwise("down")

    base = df.select(
        symbol,
        ts,
        "close",
        rn.alias("__rn"),
        trend.alias("__trend"),
        F.lag("close", window).over(w).alias("__prev_close"),
        F.stddev_samp("close").over(w.rowsBetween(-window, -1)).alias("__vol"),
    )
    w2 = Window.partitionBy(symbol).orderBy(ts)
    prev_trend = F.lag("__trend").over(w2)
    pc = F.abs(F.col("close") - F.col("__prev_close"))
    strength = F.least(F.lit(1.0), pc / (F.col("__vol") * window))
    return (
        base.withColumn("__prev_trend", prev_trend)
        # reference loop starts at i=window: the first compared pair is
        # (i=window+1 vs i=window), i.e. rn >= window+2 in 1-based terms
        .filter(
            (F.col("__rn") >= window + 2)
            & (F.col("__trend") != F.col("__prev_trend"))
            & (F.col("__vol") > 0)
            & (strength > 0.3)
        )
        .select(
            symbol,
            ts,
            F.when(F.col("__trend") == "up", "uptrend")
            .otherwise("downtrend")
            .alias("pattern"),
            F.when(strength > 0.7, "high").otherwise("medium").alias("confidence"),
            F.col("close").alias("price_level"),
            strength.alias("signal_strength"),
        )
    )


def breakout_signals(
    df: DataFrame,
    window: int = 20,
    min_volume_increase: float = 1.5,
    symbol: str = "symbol",
    ts: str = "ts",
) -> DataFrame:
    """P4 — Bollinger-band breakout with range-proxy volume confirmation
    (pattern_detection.py:402-463): close crosses a band while the
    5-row range mean exceeds 1.5x its own prior-20-row mean."""
    w = Window.partitionBy(symbol).orderBy(ts)
    rn = F.row_number().over(w)
    ma = F.avg("close").over(w.rowsBetween(-(window - 1), 0))
    sd = F.stddev_samp("close").over(w.rowsBetween(-(window - 1), 0))
    upper = ma + 2 * sd
    lower = ma - 2 * sd
    # min_periods parity: pandas' rolling(5) proxy is NaN for rows 1-4,
    # which its prior-20-row mean SKIPS — guard so SQL avg skips too
    vol_proxy = F.when(
        rn >= 5, F.avg(F.col("high") - F.col("low")).over(w.rowsBetween(-4, 0))
    )

    base = df.select(
        symbol,
        ts,
        "close",
        rn.alias("__rn"),
        sd.alias("__sd"),
        upper.alias("__up"),
        lower.alias("__lo"),
        F.lag("close").over(w).alias("__prev_close"),
        F.lag(upper).over(w).alias("__prev_up"),
        F.lag(lower).over(w).alias("__prev_lo"),
        vol_proxy.alias("__vp"),
    )
    w2 = Window.partitionBy(symbol).orderBy(ts)
    avg_vp = F.avg("__vp").over(w2.rowsBetween(-window, -1))
    # materialize the prior-window mean first: window exprs are not
    # allowed inside a WHERE clause
    base = base.withColumn("__avg_vp", avg_vp)
    up_break = (
        (F.col("close") > F.col("__up"))
        & (F.col("__prev_close") <= F.col("__prev_up"))
        & (F.col("__vp") > F.col("__avg_vp") * min_volume_increase)
    )
    down_break = (
        (F.col("close") < F.col("__lo"))
        & (F.col("__prev_close") >= F.col("__prev_lo"))
        & (F.col("__vp") > F.col("__avg_vp") * min_volume_increase)
    )
    # sd == 0 (>= window identical closes) would raise under ANSI; the
    # break predicates force a positive numerator, so pandas' x/0 ->
    # +inf -> min(1.0, inf) path pins strength at 1.0
    up_strength = F.when(
        F.col("__sd") != 0,
        F.least(F.lit(1.0), (F.col("close") - F.col("__up")) / F.col("__sd")),
    ).otherwise(1.0)
    down_strength = F.when(
        F.col("__sd") != 0,
        F.least(F.lit(1.0), (F.col("__lo") - F.col("close")) / F.col("__sd")),
    ).otherwise(1.0)
    strength = F.when(up_break, up_strength).otherwise(down_strength)
    return (
        base.filter((F.col("__rn") >= window + 1) & (up_break | down_break))
        .select(
            symbol,
            ts,
            F.when(up_break, "breakout_up").otherwise("breakout_down").alias(
                "pattern"
            ),
            F.when(strength > 0.5, "high").otherwise("medium").alias("confidence"),
            F.col("close").alias("price_level"),
            strength.alias("signal_strength"),
        )
    )


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

"""ST2/ST3/ST4 channel transforms: ml_features, trading_signals,
technical_analysis.

Reference: app/services/websocket_manager.py:340-448 (ml_features +
trading_signals), :476-508 (technical_analysis).  The reference
recomputes over a trailing 100-tick buffer on every emit; the Spark
shape is per-symbol trailing row windows — pure Column algebra, usable
(a) as batch queries over the candle table (oracle-checked) and
(b) inside a streaming ``foreachBatch`` where each micro-batch's rows
get the same transform (the micro-batch recompute is the analog of the
reference's per-emit recompute loop).

Faithful quirks preserved:
- the channel RSI divides the 14-diff sums by exactly 14 and yields 0
  (not 100) when avg_loss == 0 (rs = 0 branch, :368-370);
- features need a full 20-row buffer (len(ticks) >= 20 gate, :346) —
  earlier rows emit nothing;
- target_signal encodes 0=sell-zone... actually 1 if RSI<30 (buy
  side), 2 if RSI>70, else 0 (:394);
- trading signals require BOTH the RSI band and the SMA20 side
  (:457-468); stops are fixed 10/20-pip offsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SYMBOL, TS = "symbol", "ts"


def _w():
    return Window.partitionBy(SYMBOL).orderBy(TS)


def ml_features(candles: DataFrame) -> DataFrame:
    """ST2 — the 8-feature vector per (symbol, ts) with RSI-band target
    and confidence (websocket_manager.py:340-400)."""
    w = _w()
    rn = F.row_number().over(w)
    price = F.col("close")

    # all window sums run on exact integer cents (close/volume are
    # 2dp-grid): frame sums of integers are association-order-proof,
    # so SMAs/RSI — and every band comparison derived from them — are
    # bit-identical across engines and window implementations
    # (boundary_audit.py caught the float versions within 8e-12 of
    # round(,6) boundaries)
    pc = F.round(price * 100).cast("bigint")
    vc = F.round(F.col("volume") * 100).cast("bigint")

    def tavg_cents(c: Column, n: int) -> Column:
        return F.sum(c).over(w.rowsBetween(-(n - 1), 0)).cast("double") / (
            100.0 * n
        )

    diffc = pc - F.lag(pc).over(w)
    gain = F.when(diffc > 0, diffc).otherwise(F.lit(0))
    loss = F.when(diffc <= 0, F.abs(F.coalesce(diffc, F.lit(0)))).otherwise(
        F.lit(0)
    )
    sg = F.sum(gain).over(w.rowsBetween(-13, 0))
    sl = F.sum(loss).over(w.rowsBetween(-13, 0))
    # == 100·avg_gain/(avg_gain+avg_loss): the /14 normalizers cancel,
    # leaving a pure integer-ratio — exact numerator and denominator
    rsi = F.when(sl != 0, 100.0 * sg / (sg + sl)).otherwise(
        0.0  # rs = 0 branch: no losses -> rsi 0, reference quirk
    )

    sma_5, sma_10, sma_20 = (
        tavg_cents(pc, 5),
        tavg_cents(pc, 10),
        tavg_cents(pc, 20),
    )
    avg_volume = tavg_cents(vc, 20)
    volume_ratio = F.when(avg_volume > 0, F.col("volume") / avg_volume).otherwise(
        1.0
    )
    dev = (price - sma_20) / sma_20
    range_5 = F.max(price).over(w.rowsBetween(-4, 0)) - F.min(price).over(
        w.rowsBetween(-4, 0)
    )

    out = candles.select(
        SYMBOL,
        TS,
        rn.alias("__rn"),
        price.alias("current_price"),
        sma_5.alias("sma_5"),
        sma_10.alias("sma_10"),
        sma_20.alias("sma_20"),
        rsi.alias("rsi_14"),
        volume_ratio.alias("volume_ratio"),
        dev.alias("price_dev_sma20"),
        range_5.alias("range_5"),
    )
    feats = [
        "current_price",
        "sma_5",
        "sma_10",
        "sma_20",
        "rsi_14",
        "volume_ratio",
        "price_dev_sma20",
        "range_5",
    ]
    fmin = F.least(*[F.col(c) for c in feats])
    fmax = F.greatest(*[F.col(c) for c in feats])
    target = (
        F.when(F.col("rsi_14") < 30, 1)
        .when(F.col("rsi_14") > 70, 2)
        .otherwise(0)
    )
    confidence = F.least(F.abs(F.col("rsi_14") - 50.0) / 50.0, F.lit(1.0))
    return (
        out.filter(F.col("__rn") >= 20)  # the len(ticks) >= 20 gate
        .withColumn(
            "norm_price",
            F.when(fmax != fmin, (F.col("current_price") - fmin) / (fmax - fmin)),
        )
        .withColumn(
            "norm_rsi",
            F.when(fmax != fmin, (F.col("rsi_14") - fmin) / (fmax - fmin)),
        )
        .withColumn("target_signal", target)
        .withColumn("confidence", confidence)
        .drop("__rn")
    )


def trading_signals(features: DataFrame) -> DataFrame:
    """ST3 — RSI-band + SMA20-side entry signals with fixed 10/20-pip
    stops (websocket_manager.py:402-448)."""
    price, sma20, rsi = (
        F.col("current_price"),
        F.col("sma_20"),
        F.col("rsi_14"),
    )
    buy = (rsi < 30) & (price < sma20)
    sell = (rsi > 70) & (price > sma20)
    signal = F.when(buy, "buy").when(sell, "sell").otherwise("hold")
    return features.select(
        SYMBOL,
        TS,
        signal.alias("signal"),
        F.when(buy | sell, 0.8).otherwise(0.5).alias("confidence"),
        price.alias("entry_price"),
        F.when(buy, price - 0.001).when(sell, price + 0.001).alias("stop_loss"),
        F.when(buy, price + 0.002).when(sell, price - 0.002).alias("take_profit"),
        F.when(buy | sell, 2.0).alias("risk_reward_ratio"),
        F.when(rsi > 70, "overbought")
        .when(rsi < 30, "oversold")
        .otherwise("neutral")
        .alias("market_condition"),
    )


#: display names for the alert description — the fixed six-pattern
#: vocabulary of operators.patterns.detect_patterns, title-cased the way
#: the reference's ``pattern.replace('_',' ').title()`` renders them
#: (websocket_manager.py:471)
_PATTERN_DISPLAY = {
    "doji": "Doji",
    "hammer": "Hammer",
    "bullish_engulfing": "Bullish Engulfing",
    "bearish_engulfing": "Bearish Engulfing",
    "morning_star": "Morning Star",
    "evening_star": "Evening Star",
}

#: the reference's bullish-direction membership list
#: (websocket_manager.py:468: ["bullish_engulfing", "hammer",
#: "breakout"]) — morning_star is NOT in it, so it reads "bearish";
#: quirk preserved, not fixed.
_BULLISH_PATTERNS = ("bullish_engulfing", "hammer")


def pattern_alerts(candles: DataFrame) -> DataFrame:
    """ST1 pattern_alerts channel transform — the reference's
    2-second alert stream (websocket_manager.py:29 StreamType, :204
    trigger table, :450-473 message shape) made real: instead of the
    reference's random simulator, alerts come from the actual pattern
    detector (pattern_detection.py:102-286 semantics via
    operators.patterns.detect_patterns), wrapped in the reference's
    alert envelope: pattern_detected, confidence label, direction,
    strength tier (strong >0.8 / medium >0.6 / weak), price_level, and
    the human description string.

    The description's percent is rendered from integers —
    floor(strength·1000 + 0.5) split into whole.tenth, i.e.
    round-half-up, matching Python's ``f"{x:.1%}"`` on every
    non-exact-tie double (advice-found: plain floor rendered 0.857 as
    '85.6%' where the reference prints '85.7%') — so the string is
    bit-identical across engines: no float formatting in the output.
    Deliberate deviations from websocket_manager.py:450-473, both
    because the reference's numeric ``confidence`` is a random uniform
    while ours is a categorical label from the real detector: the
    percent AND the strength tiers key off ``signal_strength`` (the
    engine's numeric confidence analogue), and exact decimal ties may
    round up where Python's round-half-even would round down.
    Pure Column algebra over detect_patterns: runs as a batch query
    (oracle-checked as ``pattern_alerts_replay``) and unchanged inside
    the streaming channel's foreachBatch."""
    from ..operators.patterns import detect_patterns

    sig = detect_patterns(candles)
    direction = F.when(
        F.col("pattern").isin(*_BULLISH_PATTERNS), "bullish"
    ).otherwise("bearish")
    ss = F.round("signal_strength", 6)
    strength = (
        F.when(ss > 0.8, "strong").when(ss > 0.6, "medium").otherwise("weak")
    )
    display = F.col("pattern")
    for raw, disp in _PATTERN_DISPLAY.items():
        display = F.when(F.col("pattern") == raw, disp).otherwise(display)
    pm = F.floor(ss * 1000 + F.lit(0.5)).cast("bigint")
    pct = F.concat(
        (pm / 10).cast("bigint").cast("string"),
        F.lit("."),
        F.pmod(pm, 10).cast("bigint").cast("string"),
    )
    description = F.concat(
        display,
        F.lit(" pattern detected with "),
        pct,
        F.lit("% confidence"),
    )
    return sig.select(
        SYMBOL,
        TS,
        F.col("pattern").alias("pattern_detected"),
        F.col("confidence"),
        direction.alias("direction"),
        strength.alias("strength"),
        F.round("price_level", 6).alias("price_level"),
        ss.alias("signal_strength"),
        description.alias("description"),
    )


def technical_analysis(features: DataFrame) -> DataFrame:
    """ST4 — trend from the SMA(5/10/20) ordering, RSI momentum and
    band status, fixed-offset S/R levels, recommendation
    (websocket_manager.py:476-508)."""
    s5, s10, s20 = F.col("sma_5"), F.col("sma_10"), F.col("sma_20")
    rsi, price = F.col("rsi_14"), F.col("current_price")
    trend = (
        F.when((s5 > s10) & (s10 > s20), "bullish")
        .when((s5 < s10) & (s10 < s20), "bearish")
        .otherwise("sideways")
    )
    return features.select(
        SYMBOL,
        TS,
        trend.alias("trend"),
        F.when(F.abs(rsi - 50) > 20, "strong").otherwise("weak").alias("momentum"),
        (price - 0.002).alias("support_1"),
        (price + 0.002).alias("resistance_1"),
        F.when(rsi > 70, "overbought")
        .when(rsi < 30, "oversold")
        .otherwise("neutral")
        .alias("rsi_status"),
        F.when((trend == "bullish") & (rsi < 50), "buy")
        .when((trend == "bearish") & (rsi > 50), "sell")
        .otherwise("hold")
        .alias("recommendation"),
    )

"""Advanced indicators (SURVEY §2.5 W17-W20, W24-W27).

Reference: app/services/features/advanced_feature_engineer.py and
app/services/preprocessing/market_filters.py:139-159.  Everything
except Parabolic SAR is window Column algebra:

- CCI's rolling MAD and the trailing percent-rank use a collect_list
  window (O(window) array per row — bounded, codegen-friendly) because
  their inner statistic depends on the whole frame relative to the
  frame's own mean / the current row's value.
- Rolling skew/kurt are derived from raw power sums with pandas'
  bias-correction formulas (G1/G2), so Spark and the DuckDB oracle
  evaluate the SAME closed form instead of trusting either engine's
  built-in population variants.
- Aroon's "days since rolling argmax" reduces to the 1-based position
  of the first max within the frame: aroon_up = 100·idx/period.
- Parabolic SAR (W20) is a stateful recurrence with trend flips ->
  per-symbol applyInPandas kernel (sanctioned escape, SURVEY §2.13).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

SYMBOL, TS = "symbol", "ts"


def _w():
    return Window.partitionBy(SYMBOL).orderBy(TS)


def _frame(n: int):
    return _w().rowsBetween(-(n - 1), 0)


def _rn() -> Column:
    return F.row_number().over(_w())


def _guard(n: int, expr: Column) -> Column:
    return F.when(_rn() >= n, expr)


def typical_price() -> Column:
    return (F.col("high") + F.col("low") + F.col("close")) / 3.0


def cci(period: int = 20, constant: float = 0.015) -> Column:
    """W17 — (TP - SMA(TP)) / (c · rolling MAD), MAD = mean |x - frame
    mean| (advanced_feature_engineer.py:100-110); warm-up/0-div -> 0
    via the caller's coalesce (reference fillna(0))."""
    tp = typical_price()
    arr = F.collect_list(tp).over(_frame(period))
    n = F.size(arr)
    mu = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / n
    mad = (
        F.aggregate(F.transform(arr, lambda x: F.abs(x - mu)), F.lit(0.0), lambda a, x: a + x)
        / n
    )
    sma_tp = F.avg(tp).over(_frame(period))
    # mad == 0 (>= period identical prices) would raise under ANSI; the
    # reference's 0/0 -> NaN -> fillna(0) path maps to NULL -> caller's
    # coalesce(., 0)
    return _guard(period, F.when(mad != 0, (tp - sma_tp) / (constant * mad)))


def true_range() -> Column:
    prev_c = F.lag("close").over(_w())
    # greatest skips nulls in Spark: first row degrades to high-low
    return F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - prev_c),
        F.abs(F.col("low") - prev_c),
    )


def adx(period: int = 14) -> Column:
    """W18 — ADX: ±DM conditionals -> rolling-mean smoothing -> DI± ->
    DX -> SMA(DX) (advanced_feature_engineer.py:112-146).  The DX
    series starts at row `period`, so ADX needs 2·period-1 rows and a
    null-free DX frame (pandas rolling mean over NaN -> NaN)."""
    w = _w()
    up = F.col("high") - F.lag("high").over(w)
    down = F.lag("low").over(w) - F.col("low")
    dm_plus = F.when((up > down) & (up > 0), up).otherwise(0.0)
    dm_minus = F.when((down > up) & (down > 0), down).otherwise(0.0)

    tr_s = _guard(period, F.avg(true_range()).over(_frame(period)))
    dmp_s = _guard(period, F.avg(dm_plus).over(_frame(period)))
    dmm_s = _guard(period, F.avg(dm_minus).over(_frame(period)))
    # tr_s == 0 (fully flat frame) would raise under ANSI; NULL flows
    # into the dx null-count and lands on the reference's fillna(0)
    di_plus = F.when(tr_s != 0, 100.0 * dmp_s / tr_s)
    di_minus = F.when(tr_s != 0, 100.0 * dmm_s / tr_s)
    dx = F.when(
        di_plus + di_minus != 0,
        100.0 * F.abs(di_plus - di_minus) / (di_plus + di_minus),
    )
    n_null_dx = F.count(F.when(dx.isNull(), 1)).over(_frame(period))
    return F.when(
        (_rn() >= 2 * period - 1) & (n_null_dx == 0),
        F.avg(dx).over(_frame(period)),
    )


def ultimate_oscillator(p1: int = 7, p2: int = 14, p3: int = 28) -> Column:
    """W24 — UO = 100·(4·ΣBP7/ΣTR7 + 2·ΣBP14/ΣTR14 + ΣBP28/ΣTR28)/7
    (advanced_feature_engineer.py:254-287); BP = close - min(low,
    prev_close) with the first row degrading to close-low (pandas
    row-min skips the NaN shifted term)."""
    prev_c = F.lag("close").over(_w())
    bp = F.col("close") - F.least(F.col("low"), prev_c)
    tr = true_range()

    def ratio(p: int) -> Column:
        num = _guard(p, F.sum(bp).over(_frame(p)))
        den = _guard(p, F.sum(tr).over(_frame(p)))
        # den == 0 (flat frame) would raise under ANSI; NULL propagates
        # to the caller's coalesce(., 50) like the reference's NaN
        return F.when(den != 0, num / den)

    return 100.0 * (4.0 * ratio(p1) + 2.0 * ratio(p2) + ratio(p3)) / 7.0


def rolling_moments(window: int = 20) -> dict[str, Column]:
    """W25 — rolling mean/std/skew/kurt of returns + price min/max/range
    + exact quantiles (advanced_feature_engineer.py:289-312).

    skew/kurt use pandas' bias-corrected sample formulas derived from
    power sums:  g1 = m3/m2^1.5, G1 = g1·sqrt(n(n-1))/(n-2);
    g2 = m4/m2²-3, G2 = ((n+1)·g2+6)·(n-1)/((n-2)(n-3)).
    Returns start with a null (first diff), so moment windows need
    window+1 rows.
    """
    w = _w()
    prev = F.lag("close").over(w)
    ret = F.when(prev != 0, (F.col("close") - prev) / prev)
    fr = _frame(window)
    g = window + 1  # returns series has one leading null

    n = F.lit(float(window))
    s1 = F.sum(ret).over(fr)
    s2 = F.sum(ret * ret).over(fr)
    s3 = F.sum(ret * ret * ret).over(fr)
    s4 = F.sum(ret * ret * ret * ret).over(fr)
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * s2 / n + 2 * mu**3
    m4 = s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n - 3 * mu**4
    g1 = m3 / F.pow(m2, 1.5)
    big_g1 = g1 * F.sqrt(n * (n - 1)) / (n - 2)
    g2 = m4 / (m2 * m2) - 3.0
    big_g2 = ((n + 1) * g2 + 6.0) * (n - 1) / ((n - 2) * (n - 3))

    return {
        f"rolling_mean_{window}": _guard(g, mu),
        f"rolling_std_{window}": _guard(g, F.stddev_samp(ret).over(fr)),
        f"rolling_skew_{window}": _guard(g, big_g1),
        f"rolling_kurt_{window}": _guard(g, big_g2),
        f"rolling_max_{window}": _guard(window, F.max("close").over(fr)),
        f"rolling_min_{window}": _guard(window, F.min("close").over(fr)),
        f"rolling_q25_{window}": _guard(
            window, F.expr("percentile(close, 0.25)").over(fr)
        ),
        f"rolling_median_{window}": _guard(
            window, F.expr("percentile(close, 0.5)").over(fr)
        ),
        f"rolling_q75_{window}": _guard(
            window, F.expr("percentile(close, 0.75)").over(fr)
        ),
    }


def rolling_corr(x: Column, y: Column, window: int, guard_extra: int = 0) -> Column:
    """W26 — rolling Pearson correlation from component sums:
    (n·Σxy - Σx·Σy) / sqrt((n·Σx²-(Σx)²)(n·Σy²-(Σy)²)) — the same
    closed form pandas rolling .corr evaluates
    (advanced_feature_engineer.py:314-332)."""
    fr = _frame(window)
    n = F.lit(float(window))
    sx, sy = F.sum(x).over(fr), F.sum(y).over(fr)
    sxx, syy = F.sum(x * x).over(fr), F.sum(y * y).over(fr)
    sxy = F.sum(x * y).over(fr)
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return F.when((_rn() >= window + guard_extra) & (den != 0), num / den)


def rolling_corr_exact(xc: Column, yc: Column, window: int) -> Column:
    """W26 for 2dp-grid column pairs: the same closed form as
    rolling_corr but over INTEGER cent values, so every power sum is
    exact under any frame-evaluation order (Pearson r is
    scale-invariant — cents cancel).  num and the two variance terms
    each fit int64 for fixed frames (≤ ~1e12 at c ≤ 5e4, n = 20) and
    cast to double exactly (< 2^53); the guard compares the integer
    variance terms directly (A>0 AND B>0 ≡ A·B>0 by Cauchy-Schwarz,
    and the int64 product would overflow).  boundary_audit.py caught
    the float version within 9e-12 of a round(,6) boundary."""
    fr = _frame(window)
    n = F.lit(window)
    sx, sy = F.sum(xc).over(fr), F.sum(yc).over(fr)
    sxx, syy = F.sum(xc * xc).over(fr), F.sum(yc * yc).over(fr)
    sxy = F.sum(xc * yc).over(fr)
    a = n * sxx - sx * sx
    b = n * syy - sy * sy
    num = (n * sxy - sx * sy).cast("double")
    den = F.sqrt(a.cast("double") * b.cast("double"))
    return F.when((_rn() >= window) & (a > 0) & (b > 0), num / den)


def aroon(period: int = 25) -> tuple[Column, Column]:
    """W19 — aroon_up/down = 100·idx/period where idx is the 1-based
    position of the first rolling max/min inside the trailing frame
    (equivalent to the reference's days-since-argmax loop,
    advanced_feature_engineer.py:148-169; idxmax takes the FIRST
    occurrence on ties)."""
    fr = _frame(period)
    rn = _rn()
    # max(struct(value, -rn)) -> max value, earliest row on ties
    hi = F.max(F.struct(F.col("high").alias("v"), (-rn).alias("nr"))).over(fr)
    lo = F.min(F.struct(F.col("low").alias("v"), rn.alias("nr"))).over(fr)
    rn_hi = -hi.getField("nr")
    rn_lo = lo.getField("nr")
    up = 100.0 * (rn_hi - rn + period) / period
    down = 100.0 * (rn_lo - rn + period) / period
    g = period + 1  # reference loop starts at i=period (0-based)
    return F.when(rn >= g, up), F.when(rn >= g, down)


def volatility_percent_rank(
    lookback: int = 20, rank_window: int = 50
) -> dict[str, Column]:
    """W27 — volatility regime: rolling mean of (high-low), trailing
    percent-rank of it over `rank_window` rows (pandas rolling
    .rank(pct=True): average rank of the CURRENT value within its
    trailing window), bucketed {low<=20, normal, high>=80, extreme>=95}
    (market_filters.py:139-159).

    Semantic choice (documented deviation): the volatility is quantized
    to 9 decimals before ranking.  Ranking a derived float is
    ulp-unstable — pandas' sliding-sum rolling mean and an engine's
    per-frame sum produce last-bit differences that flip tie counts, so
    the reference's exact float behavior is accumulation-order-dependent
    and not reproducible across ANY two engines.  Quantizing makes tie
    semantics deterministic everywhere.
    """
    vol = _guard(lookback, F.avg(F.col("high") - F.col("low")).over(_frame(lookback)))
    vol = F.round(vol, 9)
    # percent-rank needs the frame's values relative to the current one
    arr = F.collect_list(vol).over(_frame(rank_window))
    cur = vol
    n_less = F.size(F.filter(arr, lambda x: x < cur))
    n_eq = F.size(F.filter(arr, lambda x: x == cur))
    pct = _guard(
        lookback + rank_window - 1,
        100.0 * (n_less + (n_eq + 1) / 2.0) / rank_window,
    )
    regime = (
        F.when(pct <= 20, "low")
        .when(pct >= 95, "extreme")
        .when(pct >= 80, "high")
        .otherwise("normal")
    )
    return {"volatility_percentile": pct, "volatility_regime": regime}


def psar(
    df: DataFrame,
    af_start: float = 0.02,
    af_increment: float = 0.02,
    af_max: float = 0.2,
) -> DataFrame:
    """W20 — Parabolic SAR: stateful trend-flip recurrence with
    accelerating factor (advanced_feature_engineer.py:171-207), exact
    loop per symbol via applyInPandas."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(TS).reset_index(drop=True)
        high, low = pdf["high"].values, pdf["low"].values
        out = [0.0] * len(pdf)
        if len(pdf):
            bull, af = True, af_start
            ep = low[0]
            out[0] = high[0]
            for i in range(1, len(pdf)):
                out[i] = out[i - 1] + af * (ep - out[i - 1])
                if bull:
                    if low[i] <= out[i]:
                        bull, out[i], af, ep = False, ep, af_start, low[i]
                    elif high[i] > ep:
                        ep, af = high[i], min(af + af_increment, af_max)
                else:
                    if high[i] >= out[i]:
                        bull, out[i], af, ep = True, ep, af_start, high[i]
                    elif low[i] < ep:
                        ep, af = low[i], min(af + af_increment, af_max)
        pdf["psar"] = out
        return pdf[[SYMBOL, TS, "psar"]]

    narrow = df.select(SYMBOL, TS, "high", "low")
    schema = StructType(
        [narrow.schema[SYMBOL], narrow.schema[TS], StructField("psar", DoubleType())]
    )
    return narrow.groupBy(SYMBOL).applyInPandas(kernel, schema)

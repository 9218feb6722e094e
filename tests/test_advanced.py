"""W-series advanced indicator verification beyond the oracle gate:
PSAR fixture (hand-traceable recurrence) and pandas-reference parity
for the bias-corrected moments and trailing percent-rank.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from streaming_forex_data_pipeline_spark.operators import advanced as A
from streaming_forex_data_pipeline_spark.sources.tables import candles_from_events


def _psar_reference(high, low, af_start=0.02, af_inc=0.02, af_max=0.2):
    """Independent re-derivation of the reference recurrence
    (advanced_feature_engineer.py:171-207) for differential testing."""
    n = len(high)
    out = np.zeros(n)
    bull, af, ep = True, af_start, low[0]
    out[0] = high[0]
    for i in range(1, n):
        out[i] = out[i - 1] + af * (ep - out[i - 1])
        if bull:
            if low[i] <= out[i]:
                bull, out[i], af, ep = False, ep, af_start, low[i]
            elif high[i] > ep:
                ep, af = high[i], min(af + af_inc, af_max)
        else:
            if high[i] >= out[i]:
                bull, out[i], af, ep = True, ep, af_start, high[i]
            elif low[i] < ep:
                ep, af = low[i], min(af + af_inc, af_max)
    return out


def test_psar_kernel_matches_reference_recurrence(spark, sf_dir):
    c = candles_from_events(spark, sf_dir)
    got = (
        A.psar(c)
        .orderBy("symbol", "ts")
        .toPandas()
    )
    base = c.select("symbol", "ts", "high", "low").orderBy("symbol", "ts").toPandas()
    for sym, grp in base.groupby("symbol"):
        want = _psar_reference(grp["high"].values, grp["low"].values)
        have = got[got["symbol"] == sym]["psar"].values
        assert np.allclose(have, want, rtol=1e-9), f"{sym}: psar mismatch"


def test_psar_fixture_hand_traced(spark):
    # uptrend then a break below SAR forces a flip to bearish
    rows = [
        ("S", dt.datetime(2024, 1, 1, h), 10.0 + h, 10.5 + h, 9.5 + h, 10.2 + h)
        for h in range(4)
    ] + [("S", dt.datetime(2024, 1, 1, 4), 8.0, 8.2, 7.0, 7.1)]
    df = spark.createDataFrame(
        rows, ["symbol", "ts", "open", "high", "low", "close"]
    )
    got = A.psar(df).orderBy("ts").toPandas()["psar"].values
    want = _psar_reference(
        np.array([10.5, 11.5, 12.5, 13.5, 8.2]),
        np.array([9.5, 10.5, 11.5, 12.5, 7.0]),
    )
    assert np.allclose(got, want)
    # the collapse bar must flip: SAR jumps to the prior extreme point
    assert got[4] == pytest.approx(want[4])


def test_rolling_moments_match_pandas(spark, sf_dir):
    c = candles_from_events(spark, sf_dir)
    m = A.rolling_moments(20)
    got = (
        c.select("symbol", "ts", *[v.alias(k) for k, v in m.items()])
        .filter(F.col("symbol") == "click")
        .orderBy("ts")
        .toPandas()
    )
    pdf = (
        c.filter(F.col("symbol") == "click")
        .select("ts", "close")
        .orderBy("ts")
        .toPandas()
    )
    ret = pdf["close"].pct_change()
    checks = {
        "rolling_mean_20": ret.rolling(20).mean(),
        "rolling_std_20": ret.rolling(20).std(),
        "rolling_skew_20": ret.rolling(20).skew(),
        "rolling_kurt_20": ret.rolling(20).kurt(),
        "rolling_q25_20": pdf["close"].rolling(20).quantile(0.25),
        "rolling_median_20": pdf["close"].rolling(20).median(),
    }
    for name, want in checks.items():
        a = got[name].to_numpy(dtype=float)
        b = want.to_numpy(dtype=float)
        mask = ~np.isnan(b)
        assert np.isnan(a[~mask]).all(), f"{name}: expected NaN warm-up"
        assert np.allclose(a[mask], b[mask], rtol=1e-6, atol=1e-9), (
            f"{name}: mismatch, max diff "
            f"{np.nanmax(np.abs(a[mask] - b[mask]))}"
        )


def test_volatility_percent_rank_matches_pandas(spark, sf_dir):
    c = candles_from_events(spark, sf_dir)
    d = A.volatility_percent_rank()
    got = (
        c.select("symbol", "ts", d["volatility_percentile"].alias("pct"))
        .filter(F.col("symbol") == "click")
        .orderBy("ts")
        .toPandas()
    )
    pdf = (
        c.filter(F.col("symbol") == "click")
        .select("ts", "high", "low")
        .orderBy("ts")
        .toPandas()
    )
    # quantize like the engine does: ranking raw floats is ulp-unstable
    # (see operators.advanced.volatility_percent_rank docstring)
    vol = (pdf["high"] - pdf["low"]).rolling(20).mean().round(9)
    want = vol.rolling(50).rank(pct=True) * 100
    a = got["pct"].to_numpy(dtype=float)
    b = want.to_numpy(dtype=float)
    mask = ~np.isnan(b)
    assert np.allclose(a[mask], b[mask], rtol=1e-9), "percent-rank mismatch"


def test_flat_price_windows_ansi_safe(spark):
    """A symbol with a long run of identical prices produces
    zero-variance / zero-MAD / zero-true-range windows; every indicator
    must degrade to its reference fillna value instead of raising
    DIVIDE_BY_ZERO on an ANSI session (same class as the d8307cb
    support/resistance fix)."""
    from streaming_forex_data_pipeline_spark.operators import patterns as P

    rows = [
        ("FLAT", dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
         5.0, 5.0, 5.0, 5.0, 5.0)
        for h in range(40)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, ts timestamp, open double, high double, "
        "low double, close double, volume double"
    )
    out = df.select(
        "symbol",
        "ts",
        F.coalesce(A.cci(), F.lit(0.0)).alias("cci"),
        F.coalesce(A.adx(), F.lit(0.0)).alias("adx"),
        F.coalesce(A.ultimate_oscillator(), F.lit(50.0)).alias("uo"),
    ).toPandas()
    assert (out["cci"] == 0.0).all()
    assert (out["adx"] == 0.0).all()
    assert (out["uo"] == 50.0).all()

    # breakout: flat prefix then a jump so a band cross happens while
    # the rolling stddev window can still be degenerate elsewhere
    rows2 = rows + [
        ("FLAT", dt.datetime(2024, 1, 3) + dt.timedelta(hours=h),
         9.0, 9.5, 8.9, 9.4, 9.2)
        for h in range(3)
    ]
    df2 = spark.createDataFrame(
        rows2, "symbol string, ts timestamp, open double, high double, "
        "low double, close double, volume double"
    )
    brk = P.breakout_signals(df2).toPandas()  # must not raise
    assert (brk["signal_strength"] <= 1.0).all()

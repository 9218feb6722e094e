"""Property-based operator invariants (hypothesis).

The oracle-parity sweep checks one dataset; these properties pin
behavior on adversarial shapes — empty frames, single rows, all-equal
prices, extreme values — where window/aggregate edge cases live.
Examples are capped small: each runs through a real SparkSession.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

price = st.floats(
    min_value=1e-3, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _candles(spark, rows):
    return spark.createDataFrame(
        [
            ("S", float(i), o, max(o, h, lo, c), min(o, h, lo, c), c, v)
            for i, (o, h, lo, c, v) in enumerate(rows)
        ],
        "symbol string, ts double, open double, high double, low double, "
        "close double, volume double",
    )


@given(
    rows=st.lists(
        st.tuples(price, price, price, price, price), min_size=0, max_size=12
    )
)
@settings(**SETTINGS)
def test_fix_ohlc_always_consistent(spark, rows):
    """After D6 correction every row satisfies the D5 invariant,
    regardless of input geometry."""
    from streaming_forex_data_pipeline_spark.operators import quality as Q

    df = spark.createDataFrame(
        [("S", float(i), o, h, lo, c) for i, (o, h, lo, c, _v) in enumerate(rows)],
        "symbol string, ts double, open double, high double, low double, "
        "close double",
    )
    out = Q.fix_ohlc(df).collect()
    for r in out:
        assert r["high"] >= max(r["open"], r["close"])
        assert r["low"] <= min(r["open"], r["close"])
        assert r["high"] >= r["low"]


@given(
    rows=st.lists(
        st.tuples(price, price, price, price, price), min_size=2, max_size=12
    )
)
@settings(**SETTINGS)
def test_normalization_roundtrip_identity(spark, rows):
    """N4 ∘ N5 == identity (within float tolerance) for every method,
    including degenerate all-equal columns (zero range → 0 → constant)."""
    from streaming_forex_data_pipeline_spark.operators import normalize as N

    df = _candles(spark, rows)
    params = N.fit_params(df, ["close"])
    p = params.collect()[0]
    degenerate = {
        "minmax": p["close__max"] == p["close__min"],
        "zscore": p["close__std"] == 0,
        "robust": p["close__q75"] == p["close__q25"],  # zero IQR happens
    }
    for method in ("minmax", "zscore", "robust"):
        if degenerate[method]:
            continue  # scale parameter 0: normalized to 0, denorm gives center
        norm = N.apply_normalization(df, params, ["close"], method)
        denorm = N.denormalize(norm, params, ["close"], method)
        for r in denorm.select("close", "close_denorm").collect():
            assert math.isclose(
                r["close"], r["close_denorm"], rel_tol=1e-9, abs_tol=1e-9
            )


@given(
    vals=st.lists(price, min_size=1, max_size=14),
    n=st.integers(min_value=1, max_value=5),
)
@settings(**SETTINGS)
def test_sma_bounded_by_window_extremes(spark, vals, n):
    """W1: each SMA value lies within [min, max] of its trailing window,
    and is null before min_periods."""
    from streaming_forex_data_pipeline_spark.operators import indicators as I

    df = spark.createDataFrame(
        [("S", float(i), v) for i, v in enumerate(vals)],
        "symbol string, ts double, close double",
    )
    out = (
        df.withColumn("sma", I.sma("close", n)).orderBy("ts").collect()
    )
    for i, r in enumerate(out):
        if i + 1 < n:
            assert r["sma"] is None
        else:
            window = vals[i + 1 - n : i + 1]
            assert min(window) - 1e-9 <= r["sma"] <= max(window) + 1e-9


@given(rows=st.lists(st.tuples(price, price), min_size=0, max_size=10))
@settings(**SETTINGS)
def test_dedup_keep_first_idempotent(spark, rows):
    """D1 applied twice equals D1 applied once, and output keys are
    unique."""
    from streaming_forex_data_pipeline_spark.operators import quality as Q

    data = [("S", float(i % 3), v, i) for i, (v, _x) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "symbol string, ts double, close double, seq long"
    )
    once = Q.dedup_keep_first(df, ["symbol", "ts"], "seq")
    twice = Q.dedup_keep_first(once, ["symbol", "ts"], "seq")
    got = sorted(map(tuple, once.collect()))
    assert got == sorted(map(tuple, twice.collect()))
    keys = [(r[0], r[1]) for r in got]
    assert len(keys) == len(set(keys))
    # keep-FIRST: the surviving seq is the minimum per key
    for _sym, ts, _close, seq in got:
        assert seq == min(s for (_y, t, _c, s) in data if t == ts)

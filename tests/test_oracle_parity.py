"""Differential gate: every registered query's Spark result must match
its DuckDB oracle — row count, column names, and values (order-
insensitive, sorted by all columns). This mirrors the driver's
CORRECTNESS check, so a green run here predicts a green gate.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from streaming_forex_data_pipeline_spark import plans

# slow lane (r15): the full 262-query differential sweep is ~11 min of
# the suite and duplicates the driver's own oracle gate plus the
# in-repo strict_sweep battery; the default pytest lane must fit the
# driver's verification window (r14 verdict Next #1).
pytestmark = pytest.mark.slow

QUERIES = sorted(plans.all_queries().values(), key=lambda q: q.name)
ORACLE_QUERIES = [q for q in QUERIES if q.oracle is not None]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _assert_frames_equal(name: str, got: pd.DataFrame, want: pd.DataFrame):
    assert list(sorted(got.columns)) == list(sorted(want.columns)), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    got, want = _normalize(got), _normalize(want)
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a):
            both_nan = a.isna() & b.isna()
            close = (a - b).abs() <= 1e-9 + 1e-9 * b.abs()
            bad = ~(both_nan | close)
            assert not bad.any(), (
                f"{name}.{c}: {int(bad.sum())} value mismatches, first at idx "
                f"{bad.idxmax()}: {a[bad].head(3).tolist()} vs {b[bad].head(3).tolist()}"
            )
        else:
            mism = ~((a == b) | (a.isna() & b.isna()))
            assert not mism.any(), (
                f"{name}.{c}: {int(mism.sum())} mismatches, e.g. "
                f"{a[mism].head(3).tolist()} vs {b[mism].head(3).tolist()}"
            )


@pytest.mark.parametrize("q", ORACLE_QUERIES, ids=lambda q: q.name)
def test_oracle_parity(q, spark, duck, sf_dir):
    got = q.spark(spark, sf_dir).toPandas()
    want = duck.execute(q.oracle).fetchdf()
    _assert_frames_equal(q.name, got, want)


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: q.name)
def test_runs_and_has_schema(q, spark, sf_dir):
    df = q.spark(spark, sf_dir)
    assert df.columns, f"{q.name}: empty schema"
    assert df.count() >= 0

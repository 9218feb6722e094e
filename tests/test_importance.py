"""P7 random-forest importance invariants (no SQL oracle possible for
model internals) and feature-matrix alignment checks."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaming_forex_data_pipeline_spark.operators import importance as IMP
from streaming_forex_data_pipeline_spark.sources.tables import candles_from_events


def test_feature_matrix_alignment(spark, sf_dir):
    c = candles_from_events(spark, sf_dir)
    m = IMP.feature_matrix(c)
    # inner alignment: no nulls anywhere
    for col in (*IMP.FEATURES, "target"):
        assert m.filter(F.col(col).isNull()).count() == 0
    # target is genuinely the next row's return: spot-check one symbol
    rows = (
        m.filter(F.col("symbol") == "click").orderBy("ts").limit(5).collect()
    )
    base = (
        c.filter(F.col("symbol") == "click").orderBy("ts").toPandas()
    )
    closes = dict(zip(base["ts"], base["close"]))
    ts_sorted = sorted(closes)
    nxt = {a: closes[b] for a, b in zip(ts_sorted, ts_sorted[1:])}
    for r in rows:
        assert r["target"] == pytest.approx(nxt[r["ts"]] / closes[r["ts"]] - 1.0)


def test_rf_importance_invariants(spark, sf_dir):
    c = candles_from_events(spark, sf_dir)
    out = IMP.random_forest_importance(c).collect()
    assert {r["feature"] for r in out} == set(IMP.FEATURES)
    imps = [r["importance"] for r in out]
    assert all(v >= 0 for v in imps)
    assert sum(imps) == pytest.approx(1.0, abs=1e-6)

    # determinism under a fixed seed
    again = IMP.random_forest_importance(c).collect()
    assert {(r["feature"], round(r["importance"], 9)) for r in again} == {
        (r["feature"], round(r["importance"], 9)) for r in out
    }

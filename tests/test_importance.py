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


def test_rf_importance_pinned_ordering(spark, sf_dir):
    """The driver's rf_importance check is rows-only (no SQL oracle for
    model internals), so pin the seed-42 importance RANKING on the
    default fixture: 'reproducible + sane', not just '5 rows came
    back'.  Momentum/returns dominate the next-bar-return target by
    construction of the synthetic walk."""
    if not sf_dir.endswith("sf0.001"):
        pytest.skip("ordering pinned on the sf0.001 fixture only")
    c = candles_from_events(spark, sf_dir)
    out = IMP.random_forest_importance(c).collect()
    ranked = [r["feature"] for r in sorted(out, key=lambda r: -r["importance"])]
    assert ranked == ["mom_5", "ret_1", "body_frac", "range_frac", "activity"]
    top = max(out, key=lambda r: r["importance"])
    assert top["importance"] == pytest.approx(0.4045, abs=0.02)


def test_lasso_importance_deterministic(spark, sf_dir):
    """lasso_importance has no SQL oracle (model output), so the check
    is fixed-regularization reproducibility plus structural sanity:
    5 features, importance = |coefficient| >= 0."""
    c = candles_from_events(spark, sf_dir)
    out = IMP.lasso_importance(c).collect()
    assert {r["feature"] for r in out} == set(IMP.FEATURES)
    for r in out:
        assert r["importance"] == pytest.approx(abs(r["coefficient"]))
        assert r["importance"] >= 0.0
    again = IMP.lasso_importance(c).collect()
    assert {(r["feature"], round(r["importance"], 9)) for r in again} == {
        (r["feature"], round(r["importance"], 9)) for r in out
    }


def test_rfe_importance_contract(spark, sf_dir):
    """rfe_importance has no SQL oracle (model-driven elimination), so
    the checks are the sklearn ranking contract, fixed-seed
    determinism, and — on the default fixture — the pinned elimination
    outcome (the same 'reproducible + sane' bar as rf_importance)."""
    c = candles_from_events(spark, sf_dir)
    out = IMP.rfe_importance(c).collect()
    assert {r["feature"] for r in out} == set(IMP.FEATURES)
    by_rank = sorted(out, key=lambda r: r["rfe_rank"])
    # n_select=2 survivors at rank 1, then 2,3,4 — no gaps, no ties
    assert [r["rfe_rank"] for r in by_rank] == [1, 1, 2, 3, 4]
    for r in out:
        assert r["selected"] == (r["rfe_rank"] == 1)
        assert r["rank_score"] == pytest.approx(1.0 / r["rfe_rank"])
    again = IMP.rfe_importance(c).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    if sf_dir.endswith("sf0.001"):
        # RF importances on the fixture put mom_5/ret_1 on top (see
        # test_rf_importance_pinned_ordering); RFE must keep them
        assert {r["feature"] for r in out if r["selected"]} == {
            "mom_5",
            "ret_1",
        }


def test_importance_goldens_exact(spark, sf_dir):
    """Exact-output golden check for the 3 oracle-less importance
    queries (the driver can only rows-check them; this pins the full
    value surface at round-6 under the fixed seeds and the container's
    spark.ml version).  Regenerate ONLY for an explained change — see
    tests/goldens/regen_importance.py."""
    import json
    import os

    import __spark_entry__ as E

    # goldens are pinned to the regen script's session shape: RF/RFE
    # importances shift with data partitioning (per-partition bagging
    # seeds), so under a SPARK_GRAFT_CPUS override the exact values
    # legitimately differ — skip rather than fail spuriously
    master = spark.sparkContext.master
    if master != "local[4]":
        pytest.skip(
            f"importance goldens are pinned under local[4]; session is "
            f"{master} (unset SPARK_GRAFT_CPUS or set it to 4)"
        )

    sf = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(
        os.path.dirname(__file__), "goldens", f"importance_{sf}.json"
    )
    if not os.path.exists(path):
        pytest.skip(f"no golden for {sf}")
    with open(path) as f:
        golden = json.load(f)
    qs = E.queries()
    for name, want in golden.items():
        got = [list(r) for r in qs[name](spark, sf_dir).collect()]
        assert got == want, f"{name}: golden mismatch\n got={got}\nwant={want}"
        # seed stability: the fixed-seed spark.ml fits are deterministic
        # within a session shape — a second run must reproduce the
        # golden bit-for-bit, not merely rank-equivalently
        again = [list(r) for r in qs[name](spark, sf_dir).collect()]
        assert again == want, f"{name}: run-to-run seed instability"

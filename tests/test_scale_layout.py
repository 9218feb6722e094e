"""Round-9 scale_q family: bucketed silver layout, triangle census,
JSON props extraction."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaming_forex_data_pipeline_spark.llm.similarity import (
    triangle_counts,
)
from streaming_forex_data_pipeline_spark.plans.registry import all_queries
from streaming_forex_data_pipeline_spark.plans.scale_q import (
    _ensure_events_bucketed,
)
from streaming_forex_data_pipeline_spark.sources.tables import load_table


def test_triangle_counts_on_handcrafted_graph(spark):
    """K3 plus a pendant vertex, fed as a DIRECTED list with duplicate
    reverse edges (kNN edges are directed) — the undirected closure
    must dedup them: triangle count 1 for each K3 vertex, 0 for the
    pendant; clustering 1, 1, 1/3, 0."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (3, 4)],
        "src long, dst long",
    )
    rows = {
        r["node"]: r
        for r in triangle_counts(edges).collect()
    }
    assert rows[1]["n_triangles"] == 1 and rows[1]["degree"] == 2
    assert rows[2]["n_triangles"] == 1 and rows[2]["degree"] == 2
    assert rows[3]["n_triangles"] == 1 and rows[3]["degree"] == 3
    assert rows[4]["n_triangles"] == 0 and rows[4]["degree"] == 1
    assert rows[1]["clustering"] == 1.0
    assert abs(rows[3]["clustering"] - 1.0 / 3.0) < 1e-12
    assert rows[4]["clustering"] == 0.0


def test_triangle_counts_empty_graph(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert triangle_counts(edges).count() == 0


def test_bucketed_events_match_raw_and_reattach(spark, sf_dir):
    """The silver table holds exactly the raw events rows, and a later
    session (simulated by dropping the catalog entry) re-attaches to
    the existing files via CREATE TABLE instead of rebuilding."""
    import os

    tbl = _ensure_events_bucketed(spark, sf_dir)
    raw = load_table(spark, sf_dir, "events")
    silver = spark.table(tbl)
    assert silver.count() == raw.count()
    assert silver.exceptAll(raw).count() == 0
    assert raw.exceptAll(silver).count() == 0

    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    path = loc.removeprefix("file:")
    mtime_before = os.stat(path).st_mtime_ns
    spark.sql(f"DROP TABLE {tbl}")
    assert not spark.catalog.tableExists(tbl)
    tbl2 = _ensure_events_bucketed(spark, sf_dir)
    assert tbl2 == tbl and spark.catalog.tableExists(tbl)
    # re-attach must NOT rewrite the data files
    assert os.stat(path).st_mtime_ns == mtime_before
    assert spark.table(tbl).count() == raw.count()


def test_funnel_bucketed_matches_raw_funnel(spark, sf_dir):
    qs = all_queries()
    a = qs["funnel_conversion"].spark(spark, sf_dir).collect()
    b = qs["funnel_bucketed"].spark(spark, sf_dir).collect()
    assert a == b


def test_week_overlap_keeps_disjoint_week_pair(spark):
    """Two adjacent weeks with DISJOINT user sets: the pair's row must
    survive with overlap_exact = 0 (an inner join against the exact
    self-join would drop the week exactly when retention collapses —
    review-found)."""
    import datetime

    from streaming_forex_data_pipeline_spark.plans.scale_q import (
        week_overlap_over_events,
    )

    mon1 = datetime.datetime(2024, 1, 1)  # a Monday
    mon2 = datetime.datetime(2024, 1, 8)
    rows = [(i, mon1, 100 + i) for i in range(5)] + [
        (10 + i, mon2, 200 + i) for i in range(5)
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    out = week_overlap_over_events(spark, e).collect()
    assert len(out) == 1
    r = out[0]
    assert r["overlap_exact"] == 0
    assert r["union_est"] > max(r["prev_est"], r["cur_est"]) * 1.5


@pytest.mark.parametrize(
    "raw_name,bucketed_name",
    [
        ("shipping_priority", "shipping_priority_bucketed"),
        ("large_order_customers", "large_order_customers_bucketed"),
    ],
)
def test_bucketed_fact_probes_match_raw(
    spark, sf_dir, raw_name, bucketed_name
):
    qs = all_queries()
    a = qs[raw_name].spark(spark, sf_dir).collect()
    b = qs[bucketed_name].spark(spark, sf_dir).collect()
    assert a == b


#!/usr/bin/env python
"""Regenerate the golden-parquet oracles for the 3 spark.ml importance
queries (rf/lasso/rfe — model outputs DuckDB cannot replay in closed
form).

Round 13: the fit layout is pinned inside the operators
(operators/importance._pin_fit_layout — one partition, (symbol, ts)
sorted), so the outputs are pure functions of (data, seed): verified
bit-identical across local[4]/4-shuffle and local[32]/32-shuffle
sessions at sf0.01 AND sf0.1.  That makes them golden-parquet
oracle-checkable by the driver (the regen_ml_tiers.py pattern): one
parquet per query holding the exact expected rows per testdata scale,
keyed by the EVENTS-table content fingerprint — computed with DuckDB
via the ONE shared SQL definition (plans/goldens.events_md5_sql) the
oracle WHERE clauses recompute.

Regenerate (only when the fixture data or spark.ml behavior changes —
an unexplained diff is a regression, not a reason to re-pin):

    cd /root/repo && python tests/goldens/regen_importance.py

Review the diff before committing.  The freshness gate
(tests/test_importance.py::test_importance_goldens_exact) fails if a
code change moves the output without a regen.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

OUT_DIR = os.path.dirname(os.path.abspath(__file__))
SF_DIRS = [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]
QUERIES = ("rf_importance", "lasso_importance", "rfe_importance")


def events_md5(sf_dir: str) -> str:
    """The golden key — computed with the ONE shared SQL definition
    the oracle WHERE clauses use (plans/goldens.events_md5_sql)."""
    import duckdb

    from streaming_forex_data_pipeline_spark.plans.goldens import (
        events_md5_sql,
    )

    return duckdb.execute(
        events_md5_sql(f"'{sf_dir}/events.parquet'")
    ).fetchone()[0]


def main() -> None:
    import __spark_entry__ as E
    from streaming_forex_data_pipeline_spark.session import get_spark

    spark = get_spark("golden-regen")
    qs = E.queries()
    for name in QUERIES:
        parts = []
        for sf_dir in SF_DIRS:
            fp = events_md5(sf_dir)
            pdf = qs[name](spark, sf_dir).toPandas()
            pdf.insert(0, "corpus_md5", fp)
            parts.append(pdf)
            print(f"{name} @ {sf_dir}: {len(pdf)} rows (events_md5={fp})")
        golden = pd.concat(parts, ignore_index=True)
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        golden.to_parquet(path, index=False)
        print(f"wrote {path} ({len(golden)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()

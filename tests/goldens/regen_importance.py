"""Regenerate the golden fixtures for the 3 oracle-less importance
queries (rf/lasso/rfe — spark.ml model outputs DuckDB cannot replay).

The goldens pin the EXACT registered-query output (values already
rounded to 6 decimals by the query itself) under the fixed seeds and
the pinned spark.ml behavior of this container, so the driver's
``no_oracle`` rows carry reproducible-exact evidence instead of only
ranking-level invariants.

Regenerate (only when the fixture data or spark.ml version changes —
an unexplained diff is a regression, not a reason to re-pin):

    cd /root/repo && python tests/goldens/regen_importance.py

which rewrites ``tests/goldens/importance_<sf>.json`` for sf0.001,
sf0.01 and sf0.1.  Review the diff before committing.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

QUERIES = ("rf_importance", "lasso_importance", "rfe_importance")
SCALES = ("sf0.001", "sf0.01", "sf0.1")


def main() -> None:
    import __spark_entry__ as E
    from streaming_forex_data_pipeline_spark.session import get_spark

    # the RF/RFE outputs depend on data partitioning (per-partition
    # bagging seeds), so the goldens are only meaningful under a PINNED
    # session shape — local[4], 4 shuffle partitions, regardless of any
    # SPARK_GRAFT_CPUS override in the environment
    spark = get_spark("golden-regen", cpus=4)
    master = spark.sparkContext.master
    assert master == "local[4]", (
        f"golden regen needs a fresh local[4] session, got {master} "
        "(an earlier getOrCreate in this process pinned another master?)"
    )
    qs = E.queries()
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for sf in SCALES:
        sf_dir = f"/root/testdata/{sf}"
        golden = {}
        for name in QUERIES:
            rows = qs[name](spark, sf_dir).collect()
            golden[name] = [list(r) for r in rows]
        path = os.path.join(out_dir, f"importance_{sf}.json")
        with open(path, "w") as f:
            json.dump(golden, f, indent=1, sort_keys=True)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

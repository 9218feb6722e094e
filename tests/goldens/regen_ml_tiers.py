#!/usr/bin/env python
"""Regenerate the spark.ml-tier golden parquets (round-10 verdict
Next #5): `ivf_topk_kmeans` and `minhash_near_dups_ml` are seeded
spark.ml pipelines whose fits are not DuckDB-replayable in closed form
— but their OUTPUTS are deterministic (seeded coefficients; the
kmeans input is a single unsplittable row-group, so aggregation order
is fixed; verified bit-identical across local[6]/local[32] sessions at
all three scales).  So the driver-visible oracle is a pinned golden:
one parquet per query holding the exact expected rows for each
testdata scale, keyed by the corpus checksum sum(documents.n_chars), and the oracle SQL
selects the matching scale's slice.

Run AFTER any intentional change to the seeded pipelines:

    python tests/goldens/regen_ml_tiers.py

and commit the refreshed parquets.  The freshness gate
(tests/test_operators.py::test_ml_tier_goldens_fresh) fails if a code
change moves the output without a regen.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

OUT_DIR = os.path.join(REPO, "tests", "goldens")
SF_DIRS = [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]

GOLDEN_QUERIES = ["ivf_topk_kmeans", "minhash_near_dups_ml"]


def main() -> None:
    from pyspark.sql import SparkSession

    from streaming_forex_data_pipeline_spark.plans.registry import (
        all_queries,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs = all_queries()
    for name in GOLDEN_QUERIES:
        parts = []
        for sf_dir in SF_DIRS:
            # content checksum, not a row count: sf0.001 and sf0.01
            # have identical documents/embeddings row counts but
            # different contents — must match the oracle discriminator
            n_corpus = (
                spark.read.parquet(f"{sf_dir}/documents.parquet")
                .agg({"n_chars": "sum"})
                .collect()[0][0]
            )
            pdf = qs[name].spark(spark, sf_dir).toPandas()
            pdf.insert(0, "n_corpus", n_corpus)
            parts.append(pdf)
            print(f"{name} @ {sf_dir}: {len(pdf)} rows (n_corpus={n_corpus})")
        golden = pd.concat(parts, ignore_index=True)
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        golden.to_parquet(path, index=False)
        print(f"wrote {path} ({len(golden)} rows)")


if __name__ == "__main__":
    main()

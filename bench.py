#!/usr/bin/env python
"""Per-round benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is fully materialized through the noop sink (format="noop")
so column pruning can't skip work; timings include plan+execute but not
session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_forex_data_pipeline_spark import plans
from streaming_forex_data_pipeline_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "top_customers_per_nation",
    "candles_1h",
    "sma",
    "bollinger",
    "stochastic",
    "obv_proxy",
    "quality_score",
    "outlier_zscore_iqr",
    "dedup_keep_first",
    "normalize_robust",
    "doc_stats",
    "exact_dedup_groups",
    "jaccard_vs_doc0",
    "knn_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("sfdp-bench", cpus=cpus)

    qs = plans.spark_queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "headline_query_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Scale soak: run the dedup/ANN family at sf0.1 and at the 10x
sf1-class corpus (tools/make_sf1ish.py) and report wall time, output
rows, and the implied scaling exponent log(t10/t1)/log(10).

The corpus is engineered so the true work scales linearly (cohorts
are similarity-disjoint), so an exponent well above ~1 on wall time
or output rows means the operator's plan is super-linear and needs a
re-audit — the empirical check behind the Sigma-k^2 / O(N^2/K) claims
in the dedup/ANN docstrings.  Results go into COVERAGE.md.

Usage: python tools/scale_soak.py [runs_per_query]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_forex_data_pipeline_spark import plans
from streaming_forex_data_pipeline_spark.session import get_spark

SOAK_QUERIES = [
    "minhash_near_dups",
    "near_dup_clusters",
    "substring_dedup",
    "semdedup",
    "knn_graph",
    "incremental_dedup",
]

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1ish"


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    queries = sys.argv[2:] or SOAK_QUERIES
    spark = get_spark("scale-soak", cpus=32)
    qs = plans.spark_queries()

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        best, rows = math.inf, 0
        for _ in range(runs):
            t0 = time.perf_counter()
            rows = qs[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        return best, rows

    print(f"| query | t(sf0.1) | t(10x) | exponent | rows sf0.1 | rows 10x | rows exp |")
    print(f"|---|---|---|---|---|---|---|")
    for name in queries:
        t1, r1 = run(name, SF01)
        t10, r10 = run(name, SF1)
        texp = math.log(t10 / t1) / math.log(10)
        rexp = (
            math.log(r10 / r1) / math.log(10) if r1 > 0 and r10 > 0 else float("nan")
        )
        print(
            f"| {name} | {t1:.2f}s | {t10:.2f}s | {texp:.2f} "
            f"| {r1} | {r10} | {rexp:.2f} |"
        )


if __name__ == "__main__":
    main()

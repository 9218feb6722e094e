"""Hot-band soak for the banded near-dup joins (round-9 verdict Next
#7): a template family puts a large block of documents into ONE band
value; signature granularity (dhash) and the exact-set band key +
element-parallel explosion (minhash) are supposed to keep that hot
band from coupling the join's cost to corpus size.

Fixture design: the hot band is a FIXED-SIZE template cluster
(HOT = 2000 docs — 30% of the 1x corpus) embedded in 1x and 10x
corpora.  The cluster's pair output is the answer itself (C(2000,2)
rows, identical at both scales — the r9-adjudicated answer-size
class), so the wall-time exponent log(t10/t1)/log(10) isolates how
everything EXCEPT the fixed answer scales: an exponent <= 1 means the
hot band's cost did not couple to the corpus; an exponent near 2
would mean the banded join re-pairs the hot block against the growing
tail.

Run: python tools/hot_band_soak.py [runs] ; results go to COVERAGE.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_forex_data_pipeline_spark.llm import dedup as DD
from streaming_forex_data_pipeline_spark.session import get_spark
from streaming_forex_data_pipeline_spark.sources.scratch import scratch_dir

HOT = 2_000
N1 = 6_666  # hot = 30% of the 1x corpus
N10 = 66_660


def make_docs(spark, n: int, out: str) -> str:
    template = "the quick brown fox jumps over the lazy dog again"
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < HOT, F.lit(template))
        .otherwise(
            F.concat(
                F.lit("tok"), F.col("id"),
                F.lit(" mid"), F.col("id") * 7 % 99991,
                F.lit(" tail"), F.col("id") * 13 % 99989,
            )
        )
        .alias("text"),
    )
    df.repartition(8).write.mode("overwrite").parquet(out)
    return out


def make_hashes(spark, n: int, out: str) -> str:
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < HOT, F.lit(12345))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1 << 32)))
        .alias("h_lo"),
        F.when(F.col("id") < HOT, F.lit(67890))
        .otherwise(F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1 << 32)))
        .alias("h_hi"),
    )
    df.repartition(8).write.mode("overwrite").parquet(out)
    return out


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    # oversubscribing a smaller host would measure the exponents under
    # self-inflicted contention — the host-noise confound bench.py's
    # loadavg warning exists to flag (review-found)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(min(32, os.cpu_count() or 8))))
    spark = get_spark("hot-band-soak", cpus=cpus)
    root = scratch_dir("hot_band_soak_")

    cases = {}
    for scale, n in (("1x", N1), ("10x", N10)):
        cases[("minhash", scale)] = make_docs(
            spark, n, os.path.join(root, f"docs_{scale}")
        )
        cases[("dhash", scale)] = make_hashes(
            spark, n, os.path.join(root, f"hashes_{scale}")
        )

    def run(kind: str, path: str) -> tuple[float, int]:
        best, rows = math.inf, 0
        for _ in range(runs):
            t0 = time.perf_counter()
            if kind == "minhash":
                rows = DD.near_duplicate_pairs(
                    spark.read.parquet(path),
                    threshold=1.0, n_hashes=32, bands=1,
                ).count()
            else:
                rows = DD.dhash_near_dup_pairs(
                    spark.read.parquet(path), max_hamming=1
                ).count()
            best = min(best, time.perf_counter() - t0)
        return best, rows

    try:
        print("| join | t(1x) | t(10x) | exponent | rows 1x | rows 10x |")
        print("|---|---|---|---|---|---|")
        for kind in ("minhash", "dhash"):
            t1, r1 = run(kind, cases[(kind, "1x")])
            t10, r10 = run(kind, cases[(kind, "10x")])
            exp = math.log(t10 / t1) / math.log(10)
            print(
                f"| {kind}_hot_band | {t1:.2f}s | {t10:.2f}s | "
                f"{exp:.2f} | {r1} | {r10} |"
            )
    finally:
        # the scratch root has no vacuum: leaving four fact-sized
        # corpora per run accumulates unbounded (review-found)
        import shutil

        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

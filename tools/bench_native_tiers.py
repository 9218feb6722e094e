"""Measure the W2 native-tier crossover at sf1-ish (r11 verdict #4).

At sf0.1 the JVM-side fold tier (`ema_native` et al.) measured SLOWER
than the exact applyInPandas kernel (0.86 vs 0.57 s): the bounded
collect_list frames cost more than Arrow transfer at 5 symbols x ~20k
candles.  The tier's justification is cluster-scale Python-worker
elimination, which needs a bigger corpus to demonstrate — this tool
builds one and measures both tiers on it.

The soak corpus tiles the driver's sf0.1 events table into N symbol
cohorts (default 16): cohort k shifts event_id by stride*k and
suffixes event_type with ``~k``, so per-symbol series are isomorphic
to the originals while the SYMBOL COUNT scales linearly — the axis
that actually grows at 100 TB (more instruments/streams, not
million-row single series).  Same doctrine as tools/make_sf1ish.py.

Usage: python tools/bench_native_tiers.py [out_dir] [n_cohorts]
Prints one JSON line per tier pair; paste the table into COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"

PAIRS = [
    ("ema", "ema_native"),
    ("macd", "macd_native"),
    ("rsi", "rsi_native"),
    ("atr_ema", "atr_native"),
]


def build_corpus(out_dir: str, n_cohorts: int) -> str:
    events_dir = os.path.join(out_dir, "events.parquet")
    if os.path.exists(os.path.join(events_dir, "_SUCCESS")):
        return out_dir
    os.makedirs(events_dir, exist_ok=True)
    src = pq.read_table(f"{SRC}/events.parquet")
    df = src.to_pandas()
    stride = int(df["event_id"].max()) + 1
    for k in range(n_cohorts):
        c = df.copy()
        c["event_id"] = c["event_id"] + stride * k
        if k:
            c["event_type"] = c["event_type"] + f"~{k}"
        pq.write_table(
            pa.Table.from_pandas(c, preserve_index=False),
            os.path.join(events_dir, f"part-{k:05d}.parquet"),
        )
    open(os.path.join(events_dir, "_SUCCESS"), "w").close()
    return out_dir


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1ish_events"
    n_cohorts = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sf_dir = build_corpus(out_dir, n_cohorts)

    from streaming_forex_data_pipeline_spark import plans
    from streaming_forex_data_pipeline_spark.session import get_spark

    spark = get_spark("native-tier-soak", cpus=32)
    qs = plans.spark_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # warm-up (JIT + the once-per-session candle silver)
    for a, b in PAIRS:
        run(a), run(b)
    for a, b in PAIRS:
        ta = min(run(a), run(a))
        tb = min(run(b), run(b))
        print(
            json.dumps(
                {
                    "pair": f"{a}/{b}",
                    "pandas_sec": round(ta, 3),
                    "native_sec": round(tb, 3),
                    "native_speedup": round(ta / tb, 2),
                    "n_cohorts": n_cohorts,
                }
            )
        )


if __name__ == "__main__":
    main()

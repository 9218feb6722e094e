"""Registry evidence report: one row per registered query with its
oracle status and the latest driver verdict, straight from the
registry + the driver's own CORRECTNESS_r*.json drops — the auditable
ledger behind COVERAGE.md's prose (and a drift check: COVERAGE's
counts must match this output).

Usage: python tools/registry_report.py [--summary]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_forex_data_pipeline_spark.plans import registry  # noqa: E402
from streaming_forex_data_pipeline_spark.plans.registry import (  # noqa: E402
    latest_records,
)


def verdict(rec: dict) -> str:
    if rec.get("err") == "no_oracle":
        return "no_oracle (rows-only)"
    if rec.get("err"):
        return f"ERROR: {rec['err'][:40]}"
    if rec.get("hash_match"):
        return "green"
    return "HASH-MISMATCH"


def main() -> None:
    qs = registry.all_queries()
    latest = latest_records()
    rows = []
    for name, q in qs.items():
        rec = latest.get(name)
        rows.append(
            (
                name,
                "yes" if q.oracle else "no",
                f"r{rec[0]}: {verdict(rec[1])}" if rec else "never sampled",
            )
        )
    n_oracle = sum(1 for _, o, _ in rows if o == "yes")
    n_green = sum(1 for _, _, v in rows if v.endswith("green"))
    n_never = sum(1 for _, _, v in rows if v == "never sampled")
    n_bad = sum(1 for _, _, v in rows if "ERROR" in v or "MISMATCH" in v)
    print(
        f"registry: {len(rows)} queries / {n_oracle} oracles | "
        f"driver record: {n_green} green, {n_never} never sampled, "
        f"{len(rows) - n_green - n_never - n_bad} no_oracle, {n_bad} bad"
    )
    if "--summary" in sys.argv:
        return
    print("\n| query | oracle | latest driver verdict |")
    print("|---|---|---|")
    for name, o, v in rows:
        print(f"| {name} | {o} | {v} |")


if __name__ == "__main__":
    main()

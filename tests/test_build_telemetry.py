"""Build-once silver telemetry (r13 verdict Next #1): cold builds log
themselves with their OWN cost (nested builds subtracted), warm reads
log nothing — the contract bench.py's exec-only attribution rests on.
No Spark needed: _build_once takes any build callable."""

from __future__ import annotations

import os
import time


from streaming_forex_data_pipeline_spark.plans.llm_q import _build_once
from streaming_forex_data_pipeline_spark.sources import scratch as SCR


def _write_success(tmp: str) -> None:
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "_SUCCESS"), "w"):
        pass


def test_cold_build_logs_once_warm_read_logs_nothing(tmp_path):
    out = str(tmp_path / "silver_a")
    mark = len(SCR.SILVER_BUILD_LOG)
    _build_once(out, _write_success)
    assert len(SCR.SILVER_BUILD_LOG) == mark + 1
    row = SCR.SILVER_BUILD_LOG[-1]
    assert row["silver"] == "silver_a"
    assert row["sec"] >= 0.0
    # warm: _SUCCESS exists, no build, no new row
    _build_once(out, _write_success)
    assert len(SCR.SILVER_BUILD_LOG) == mark + 1


def test_nested_build_costs_are_additive(tmp_path):
    """An outer silver whose build() triggers an inner _build_once
    must log its OWN cost only: outer_sec excludes the inner row's
    seconds, so summing any slice of the log never double-counts."""
    inner_dir = str(tmp_path / "inner")
    outer_dir = str(tmp_path / "outer")

    def build_inner(tmp: str) -> None:
        time.sleep(0.05)
        _write_success(tmp)

    def build_outer(tmp: str) -> None:
        _build_once(inner_dir, build_inner)  # nested cold build
        time.sleep(0.02)
        _write_success(tmp)

    mark = len(SCR.SILVER_BUILD_LOG)
    _build_once(outer_dir, build_outer)
    rows = SCR.SILVER_BUILD_LOG[mark:]
    assert [r["silver"] for r in rows] == ["inner", "outer"]
    inner_sec, outer_sec = rows[0]["sec"], rows[1]["sec"]
    assert inner_sec >= 0.05
    # outer's own work is the 0.02 sleep + rename overhead — far less
    # than inner's 0.05: the subtraction happened
    assert outer_sec < inner_sec

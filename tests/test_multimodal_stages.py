"""Multimodal resize / frame-sample kernel tests (byte-level semantics
the oracle queries can't see)."""

from __future__ import annotations

from streaming_forex_data_pipeline_spark.llm import multimodal as MM
from streaming_forex_data_pipeline_spark.sources.tables import load_table


def test_resize_payload_is_prefix_truncation(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(60)
    mm = MM.attach_payload(d)
    orig = {r["doc_id"]: bytes(r["payload"]) for r in mm.collect()}
    out = MM.resize_stub(mm).collect()
    assert out, "no image rows"
    for r in out:
        full = orig[r["doc_id"]]
        got = bytes(r["payload"])
        assert 1 <= len(got) <= len(full)
        assert full.startswith(got), "resized payload is not a prefix"
        assert (r["width"], r["height"]) == (224, 224)


def test_frame_sample_row_expansion(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(60)
    mm = MM.attach_payload(d)
    vids = {
        r["doc_id"]: len(bytes(r["payload"]))
        for r in mm.filter("modality = 'video'").collect()
    }
    frames = MM.frame_sample_stub(mm, every_n=4).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(vids)
    for doc_id, rows in by_doc.items():
        n = vids[doc_id]
        n_frames = (n + MM.FRAME_BYTES - 1) // MM.FRAME_BYTES
        want_idx = list(range(0, n_frames, 4))
        got_idx = sorted(r["frame_idx"] for r in rows)
        assert got_idx == want_idx
        for r in rows:
            expect = min(MM.FRAME_BYTES, n - r["frame_idx"] * MM.FRAME_BYTES)
            assert r["frame_len"] == expect

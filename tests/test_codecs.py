"""Real-codec tests (llm/codecs.py): PNG and WAV round trips, every
filter path, corruption detection, and the distributed encode->decode
stages.  The pure decoder is the arbiter here — the oracle queries
(image_decode/image_resize/audio_decode in plans/llm_q.py) check the
same codecs end-to-end against DuckDB's closed-form pixel math."""

from __future__ import annotations

import numpy as np
import pytest

from streaming_forex_data_pipeline_spark.llm import multimodal as MM
from streaming_forex_data_pipeline_spark.llm.codecs import (
    PNG_SIG,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)
from streaming_forex_data_pipeline_spark.sources.tables import load_table


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_round_trip_each_filter(ftype):
    """Every scanline filter type must round-trip bit-exactly on its
    own (a broken unfilter path can't hide behind the others)."""
    rng = np.random.RandomState(ftype)
    px = rng.randint(0, 256, size=(23, 31)).astype(np.uint8)
    data = encode_png(px, filter_for_row=lambda y: ftype)
    w, h, ch, out = decode_png(data)
    assert (w, h, ch) == (31, 23, 1)
    assert (out == px).all()


def test_png_round_trip_rgb_mixed_filters():
    rng = np.random.RandomState(99)
    px = rng.randint(0, 256, size=(17, 13, 3)).astype(np.uint8)
    data = encode_png(px, filter_for_row=lambda y: y % 5)
    w, h, ch, out = decode_png(data)
    assert (w, h, ch) == (13, 17, 3)
    assert (out == px).all()


def test_png_is_structurally_valid():
    """The output is a REAL PNG: correct signature, parseable chunk
    framing with valid CRCs, IHDR first and IEND last."""
    import struct
    import zlib

    data = encode_png(np.zeros((2, 3), dtype=np.uint8))
    assert data[:8] == PNG_SIG
    pos, tags = 8, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        assert zlib.crc32(tag + body) & 0xFFFFFFFF == crc
        tags.append(tag)
        pos += 12 + length
    assert tags[0] == b"IHDR" and tags[-1] == b"IEND"
    assert pos == len(data), "trailing garbage after IEND"


def test_png_corruption_detected():
    data = bytearray(encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8)))
    data[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(data))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all, way too wrong")


def test_png_known_pixel_fixture():
    """Hand-checkable fixture: a 2x2 gradient under the Paeth filter.
    Pins the decoder against an independently-derivable byte layout
    rather than only against our own encoder."""
    px = np.array([[0, 100], [200, 250]], dtype=np.uint8)
    w, h, ch, out = decode_png(encode_png(px, filter_for_row=lambda y: 4))
    assert (out == px).all()
    assert int(out.astype(np.int64).sum()) == 550


def test_wav_round_trip_and_header():
    s = (np.arange(500, dtype=np.int64) * 77 % 65536 - 32768).astype("<i2")
    data = encode_wav(s, framerate=16000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    ch, sw, rate, n, out = decode_wav(data)
    assert (ch, sw, rate, n) == (1, 2, 16000, 500)
    assert (out == s).all()


def test_encode_decode_images_distributed(spark, sf_dir):
    """The Spark stages agree with a local reference computation: the
    decoded pixel sums equal numpy's over the same deterministic
    content, for every document in a sample."""
    d = load_table(spark, sf_dir, "documents").limit(40)
    out = MM.decode_images(MM.encode_images(d)).collect()
    assert len(out) == 40
    for r in out:
        px = MM._image_pixels(r["doc_id"])
        assert (r["height"], r["width"]) == px.shape
        assert r["channels"] == 1
        assert r["pixel_sum"] == int(px.astype(np.int64).sum())


def test_resize_images_distributed(spark, sf_dir):
    """Nearest-neighbor resize through two codec round-trips matches
    numpy fancy-indexing on the analytic pixels."""
    d = load_table(spark, sf_dir, "documents").limit(25)
    resized = MM.resize_images(MM.encode_images(d), target_w=16, target_h=12)
    out = MM.decode_images(resized).collect()
    assert len(out) == 25
    for r in out:
        px = MM._image_pixels(r["doc_id"])
        h, w = px.shape
        sy = (np.arange(12) * h) // 12
        sx = (np.arange(16) * w) // 16
        want = px[np.ix_(sy, sx)]
        assert (r["width"], r["height"]) == (16, 12)
        assert r["pixel_sum"] == int(want.astype(np.int64).sum())


def test_encode_decode_audio_distributed(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(40)
    out = MM.decode_audio(MM.encode_audio(d)).collect()
    assert len(out) == 40
    for r in out:
        doc_id = r["doc_id"]
        n = doc_id % MM.AUD_N_MOD + MM.AUD_N_OFF
        i = np.arange(n, dtype=np.int64)
        s = (doc_id * 131 + i * 17) % 65536 - 32768
        assert (r["channels"], r["sample_rate"]) == (1, MM.AUD_RATE)
        assert r["n_samples"] == n
        assert r["sample_sum"] == int(s.sum())
        assert r["peak"] == int(np.abs(s).max())


@pytest.mark.slow  # r15: slow lane (see pytest.ini)
def test_decontaminate_edge_semantics(spark):
    """NULL-text and short (gram-less) train docs survive the scrub;
    exact-overlap train docs are dropped; eval rows never appear."""
    from pyspark.sql import functions as F

    from streaming_forex_data_pipeline_spark.llm import dedup as DD

    rows = [
        # doc 0: eval (doc_id % 5 == 0 below)
        (0, "alpha beta gamma delta epsilon", "s", 30),
        # doc 1: contains the eval 4-gram -> contaminated
        (1, "x alpha beta gamma delta y", "s", 26),
        # doc 2: clean long doc
        (2, "one two three four five six", "s", 27),
        # doc 3: too short for any 4-gram
        (3, "tiny doc", "s", 8),
        # doc 4: NULL text
        (4, None, "s", 0),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    pred = F.col("doc_id") % 5 == 0
    rep = {r["doc_id"]: r for r in DD.contamination_overlaps(d, pred, n=4).collect()}
    assert set(rep) == {1}
    # the single shared 4-gram is 'alpha beta gamma delta'
    assert rep[1]["n_shared_grams"] == 1
    assert rep[1]["n_eval_docs"] == 1
    survivors = {r["doc_id"] for r in DD.decontaminate(d, pred, n=4).collect()}
    assert survivors == {2, 3, 4}


def test_exact_ntile_matches_window_ntile(spark):
    """The distributed two-level exact_ntile must equal the SQL-standard
    single-window ntile for every (N, k), including N < k, N % k != 0,
    and heavy ties in the order key."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from streaming_forex_data_pipeline_spark.llm.corpus import exact_ntile

    for n, k in ((1, 4), (3, 4), (4, 4), (17, 4), (100, 7), (64, 8)):
        rows = [(i, (i * 7) % 5) for i in range(n)]  # ties in `v`
        df = spark.createDataFrame(rows, "id long, v long")
        got = {
            r["id"]: r["bin"]
            for r in exact_ntile(df, ["v", "id"], k, partitions=5).collect()
        }
        want = {
            r["id"]: r["bin"]
            for r in df.withColumn(
                "bin", F.ntile(k).over(Window.orderBy("v", "id"))
            ).collect()
        }
        assert got == want, f"n={n} k={k}: {got} != {want}"


def test_chunk_sliding_edges(spark):
    """Blank text yields one ''-chunk (the corpus-wide '' -token
    convention); NULL text yields no chunks; overlap and tail-chunk
    lengths follow the stride arithmetic."""
    from pyspark.sql import functions as F

    from streaming_forex_data_pipeline_spark.llm.packing import chunk_sliding

    d = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),
            (2, ""),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = chunk_sliding(d, chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["start_tok"] for r in c1] == [0, 3, 6, 9]
    assert [r["n_toks"] for r in c1] == [4, 4, 4, 1]
    assert c1[0]["chunk"] == "w0 w1 w2 w3"
    assert c1[1]["chunk"] == "w3 w4 w5 w6"  # stride-3 overlap of 1 token
    assert c1[3]["chunk"] == "w9"
    assert by_doc[2][0]["chunk"] == "" and by_doc[2][0]["n_toks"] == 1


def test_png_round_trip_property():
    """Property test: ANY uint8 image shape/content round-trips under
    ANY per-row filter schedule."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 30),
        seed=st.integers(0, 2**31 - 1),
        fseed=st.integers(0, 4),
        rgb=st.booleans(),
    )
    def run(w, h, seed, fseed, rgb):
        rng = np.random.RandomState(seed)
        shape = (h, w, 3) if rgb else (h, w)
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        data = encode_png(px, filter_for_row=lambda y: (y + fseed) % 5)
        W, H, C, out = decode_png(data)
        assert (W, H) == (w, h) and C == (3 if rgb else 1)
        assert (out == px).all()

    run()


def _fake_pil(monkeypatch, open_impl):
    """Install a minimal fake PIL whose Image.open is ``open_impl`` —
    lets the fast-path guard be tested in containers where real PIL is
    absent.  PIL is probed ONCE at codecs import (a per-call failed
    import re-walked sys.path for every frame — measured ~60% of
    decode time), so the fake patches the probed binding, not
    sys.modules."""
    import types

    from streaming_forex_data_pipeline_spark.llm import codecs

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = open_impl
    monkeypatch.setattr(codecs, "_PIL_IMAGE", image_mod)


def test_pil_fast_path_unsupported_mode_falls_through(monkeypatch):
    """A PIL that reports a mode outside the pure decoder's contract
    (palette, RGBA, 16-bit) must NOT be trusted: decode_png falls
    through to the pure decoder and still returns the contract shape."""

    class _Weird:
        mode = "P"  # palette — outside the L/RGB contract
        width = height = 1

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(9, 7, 3)).astype(np.uint8)
    data = encode_png(px, filter_for_row=lambda y: y % 5)
    _fake_pil(monkeypatch, lambda bio: _Weird())
    w, h, ch, out = decode_png(data)
    assert (w, h, ch) == (7, 9, 3)
    assert np.array_equal(out, px)


def test_pil_fast_path_exception_falls_through_and_corruption_raises(
    monkeypatch,
):
    """A raising PIL must not change error semantics: good input still
    decodes via the pure decoder; corrupt input still surfaces as THIS
    module's ValueError (CRC check), never a PIL internal error."""

    def _boom(bio):
        raise RuntimeError("PIL internal failure")

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = encode_png(px)
    _fake_pil(monkeypatch, _boom)
    w, h, ch, out = decode_png(data)
    assert np.array_equal(out, px)
    bad = bytearray(data)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_pil_fast_path_equivalence_when_available():
    """When REAL PIL is present, the fast path must agree with the
    pure decoder bit-for-bit on contract images (L and RGB, all
    filter types).  Skips where PIL is absent — the fake-PIL tests
    above cover the guard logic there."""
    pytest.importorskip("PIL")

    rng = np.random.RandomState(11)
    for shape in ((17, 13), (17, 13, 3)):
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        data = encode_png(px, filter_for_row=lambda y: y % 5)
        from streaming_forex_data_pipeline_spark.llm import codecs

        fast = decode_png(data)
        saved_probe = codecs._PIL_IMAGE
        codecs._PIL_IMAGE = None  # force the pure-decoder path
        try:
            pure = decode_png(data)
        finally:
            codecs._PIL_IMAGE = saved_probe
        assert fast[:3] == pure[:3]
        assert np.array_equal(fast[3], pure[3])


def test_pil_fast_path_rejects_out_of_contract_ihdr(monkeypatch):
    """PIL maps 16-bit truecolor to mode 'RGB' too, so the guard must
    pin the RAW IHDR (depth 8, color 0/2, no interlace) — a depth-16
    PNG with a fake PIL claiming mode 'RGB' must still fall through
    to the pure decoder's ValueError, keeping behavior identical with
    and without PIL installed."""
    import struct
    import zlib

    class _Fake16:
        mode = "RGB"
        width = height = 7

    px = np.arange(7 * 9 * 3, dtype=np.uint8).reshape(9, 7, 3)
    data = bytearray(encode_png(px))
    # patch IHDR bit depth 8 -> 16 and recompute the chunk CRC so the
    # pure decoder reaches its variant check (not the CRC check)
    data[24] = 16
    ihdr_body = bytes(data[16:29])
    crc = zlib.crc32(b"IHDR" + ihdr_body) & 0xFFFFFFFF
    data[29:33] = struct.pack(">I", crc)
    _fake_pil(monkeypatch, lambda bio: _Fake16())
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png(bytes(data))


def test_mpng_split_walks_chunk_grammar():
    """split_mpng must delimit members by CHUNK STRUCTURE, not by
    scanning for signature bytes: a frame whose pixel data embeds the
    PNG signature pattern still splits at its real IEND.  Round-trip
    over mixed filters, plus single-frame and many-frame streams."""
    import numpy as np

    from streaming_forex_data_pipeline_spark.llm.codecs import (
        PNG_SIG,
        encode_mpng,
        encode_png,
        split_mpng,
    )

    sig = np.frombuffer(PNG_SIG * 6, dtype=np.uint8)  # 48 bytes
    trap = np.tile(sig, 10).reshape(20, 24)  # pixels ARE the signature
    rng = np.random.RandomState(7)
    frames = [
        encode_png(trap),
        encode_png(
            rng.randint(0, 256, size=(6, 9)).astype("uint8"),
            filter_for_row=lambda y: y % 5,
        ),
        encode_png(rng.randint(0, 256, size=(11, 7, 3)).astype("uint8")),
    ]
    stream = encode_mpng(frames)
    assert split_mpng(stream) == frames
    assert split_mpng(frames[0]) == [frames[0]]
    assert split_mpng(encode_mpng(frames * 5)) == frames * 5


def test_mpng_structural_damage_raises():
    import numpy as np
    import pytest

    from streaming_forex_data_pipeline_spark.llm.codecs import (
        encode_mpng,
        encode_png,
        split_mpng,
    )

    f = encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8))
    stream = encode_mpng([f, f])
    with pytest.raises(ValueError):  # truncated mid-chunk
        split_mpng(stream[:-6])
    with pytest.raises(ValueError):  # trailing garbage
        split_mpng(stream + b"\x00" * 4)
    corrupt = bytearray(stream)
    corrupt[40] ^= 0xFF  # inside the first IDAT body -> CRC mismatch
    with pytest.raises(ValueError):
        split_mpng(bytes(corrupt))
    with pytest.raises(ValueError):  # non-PNG member rejected at encode
        encode_mpng([f, b"not a png at all"])


def test_small_stride_unfilter_matches_numpy_path():
    """The whole-image pure-Python unfilter (the small-stride fast
    path added in the r14 optimization round) must be byte-identical
    to the per-row numpy path on every filter type, both color types,
    and adversarial shapes (1-pixel rows, single columns, RGB where
    bpp strides matter)."""
    from streaming_forex_data_pipeline_spark.llm import codecs

    rng = np.random.RandomState(1234)
    shapes = [(1, 1), (1, 17), (23, 1), (9, 7), (40, 61)]
    for h, w in shapes:
        for rgb in (False, True):
            px = rng.randint(
                0, 256, size=(h, w, 3) if rgb else (h, w)
            ).astype(np.uint8)
            ftypes = rng.randint(0, 5, size=h)
            data = encode_png(px, filter_for_row=lambda y: int(ftypes[y]))
            small = decode_png(data)  # stride < _SMALL_STRIDE here
            saved = codecs._SMALL_STRIDE
            codecs._SMALL_STRIDE = 0  # force the per-row numpy path
            try:
                wide = decode_png(data)
            finally:
                codecs._SMALL_STRIDE = saved
            assert small[:3] == wide[:3]
            assert np.array_equal(small[3], wide[3])
            assert np.array_equal(small[3], px)

"""Native C ABI parity: the Callbacks.h-compatible debug API + full scalar
decode must interoperate byte-for-byte with the reference ecosystem
(cffi consumers, compare-debug-out.py, the dump format)."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from util_compare import compare_dumps

LIB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "parseoggvorbis_tpu", "native", "_libpov.so")
BIN = os.path.join(os.path.dirname(LIB), "pov_decode")

pytestmark = pytest.mark.skipif(
    not os.path.exists(LIB), reason="native library not built"
)


def _full_read_to_dump(ogg_path, dump_path, data_filter=None):
    lib = ctypes.CDLL(LIB)
    if data_filter is not None:
        arr = (ctypes.c_char_p * (len(data_filter) + 1))(
            *[s.encode() for s in data_filter], None
        )
        lib.set_data_filter(arr)
    lib.set_data_output_file(dump_path.encode())
    err = ctypes.c_char_p()
    data = open(ogg_path, "rb").read()
    rc = lib.ogg_vorbis_full_read_from_memory(data, len(data), ctypes.byref(err))
    assert rc == 0, err.value


@pytest.mark.parametrize("which", ["mono", "stereo"])
def test_native_full_decode_vs_libvorbis(tmp_path, golden_dumps, which,
                                         mono_ogg, stereo_ogg):
    ogg = {"mono": mono_ogg, "stereo": stereo_ogg}[which]
    dump = str(tmp_path / ("native.%s.dump" % which))
    _full_read_to_dump(ogg, dump)
    n = compare_dumps(dump, golden_dumps[("libvorbis", which)], eps=1e-5)
    assert n == {"mono": 67, "stereo": 94}[which]


def test_native_integer_taps_vs_reference(tmp_path, golden_dumps, stereo_ogg):
    """Integer stages must be EXACT vs the reference decoder's dump."""
    dump = str(tmp_path / "native.stereo.dump")
    _full_read_to_dump(stereo_ogg, dump)
    from parseoggvorbis_tpu.callbacks.reader import DumpReader

    r1, r2 = DumpReader(dump), DumpReader(golden_dumps[("ours", "stereo")])
    int_taps = 0
    while True:
        try:
            n1, c1, d1 = r1.read_entry()
            n2, c2, d2 = r2.read_entry()
        except EOFError:
            break
        assert (n1, c1) == (n2, c2)
        if np.asarray(d1).dtype != np.float32:
            assert np.array_equal(d1, d2), n1
            int_taps += 1
    assert int_taps > 300


def test_native_filtered_features(stereo_ogg, tmp_path):
    """cffi-style use: filtered dump -> feature extraction, vs golden."""
    dump = str(tmp_path / "filtered.dump")
    _full_read_to_dump(
        stereo_ogg, dump,
        data_filter=["floor1_unpack multiplier", "floor1_unpack xs",
                     "finish_setup", "floor_number", "floor1 final_ys",
                     "finish_audio_packet"],
    )
    from parseoggvorbis_tpu.features.extract import CallbacksOutputReader

    reader = CallbacksOutputReader(dump)
    res = reader.read_floor_ys(output_dim=64)
    want = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "golden", "features_golden.npz"))
    np.testing.assert_array_equal(res, want["stereo/floor_ys_d64"])


def test_native_cli_binary(tmp_path, mono_ogg, golden_dumps):
    if not os.path.exists(BIN):
        pytest.skip("pov_decode binary not built")
    dump = str(tmp_path / "cli.dump")
    out = subprocess.run(
        [BIN, "--in", mono_ogg, "--debug_out", dump],
        capture_output=True, text=True, check=True,
    )
    assert "ok" in out.stdout
    n = compare_dumps(dump, golden_dumps[("libvorbis", "mono")], eps=1e-5)
    assert n == 67

    bad = subprocess.run([BIN], capture_output=True, text=True)
    assert bad.returncode == 1


def test_fft_imdct_matches_exact_phase_transform(tmp_path, stereo_ogg,
                                                 monkeypatch):
    """The production O(n log n) IMDCT must agree with the exact-phase
    direct transform (POV_IMDCT_DIRECT=1) to float precision on a real
    decode — same frames, same taps, max abs diff ~1e-6 on unit-scale
    PCM (the differential harness bound is 1e-5)."""
    dumps = {}
    for name, env in [("fft", "0"), ("direct", "1")]:
        dump = str(tmp_path / (name + ".dump"))
        # getenv is read at stream init, so flipping the env between
        # decodes in-process exercises both transforms in one test
        monkeypatch.setenv("POV_IMDCT_DIRECT", env)
        subprocess.run([BIN, "--in", stereo_ogg, "--debug_out", dump],
                       check=True, stdout=subprocess.DEVNULL,
                       env=dict(os.environ))
        dumps[name] = dump
    from parseoggvorbis_tpu.callbacks.reader import DumpReader

    r1, r2 = DumpReader(dumps["fft"]), DumpReader(dumps["direct"])
    worst = 0.0
    pcm_taps = 0
    while True:
        try:
            n1, c1, d1 = r1.read_entry()
            n2, c2, d2 = r2.read_entry()
        except EOFError:
            break
        assert (n1, c1) == (n2, c2)
        a1, a2 = np.asarray(d1), np.asarray(d2)
        if a1.dtype == np.float32 and n1 in ("pcm_after_mdct", "pcm"):
            worst = max(worst, float(np.max(np.abs(a1 - a2))) if a1.size else 0.0)
            pcm_taps += 1
        elif a1.dtype != np.float32:
            assert np.array_equal(a1, a2), n1
    assert pcm_taps > 100
    assert worst < 2e-6, worst


@pytest.mark.parametrize("bs0,bs1", [(64, 64), (64, 128), (128, 256)])
def test_fft_imdct_small_blocksize_level_parities(tmp_path, monkeypatch,
                                                  bs0, bs1):
    """FFT-vs-direct at the smallest legal blocksizes.  The staged FFT
    picks its pass layout from log2(n/4): 8-point base for odd level
    counts >= 5, 4-point base + fused final pair for even, post-twist
    fused into whichever stage is last.  n in {64, 128, 256} (levels 4,
    5, 6) pins every layout no encoder corpus file reaches; real-file
    parities (levels 6/9/11) are covered by
    test_fft_imdct_matches_exact_phase_transform and the corpus tests."""
    monkeypatch.syspath_prepend(os.path.join(os.path.dirname(__file__),
                                             "tools"))
    from make_synth_vorbis import SynthStream

    blob = SynthStream(bs0=bs0, bs1=bs1, seed=3).make(num_frames=12)
    ogg = str(tmp_path / "small.ogg")
    open(ogg, "wb").write(blob)
    dumps = {}
    for name, env in [("fft", "0"), ("direct", "1")]:
        dump = str(tmp_path / (name + ".dump"))
        monkeypatch.setenv("POV_IMDCT_DIRECT", env)
        subprocess.run([BIN, "--in", ogg, "--debug_out", dump],
                       check=True, stdout=subprocess.DEVNULL,
                       env=dict(os.environ))
        dumps[name] = dump
    from parseoggvorbis_tpu.callbacks.reader import DumpReader

    r1, r2 = DumpReader(dumps["fft"]), DumpReader(dumps["direct"])
    worst = 0.0
    pcm_taps = 0
    while True:
        try:
            n1, c1, d1 = r1.read_entry()
            n2, c2, d2 = r2.read_entry()
        except EOFError:
            break
        assert (n1, c1) == (n2, c2)
        a1, a2 = np.asarray(d1), np.asarray(d2)
        if a1.dtype == np.float32 and n1 in ("pcm_after_mdct", "pcm"):
            worst = max(worst,
                        float(np.max(np.abs(a1 - a2))) if a1.size else 0.0)
            pcm_taps += 1
        elif a1.dtype != np.float32:
            assert np.array_equal(a1, a2), n1
    assert pcm_taps >= 12
    assert worst < 2e-6, worst


def test_native_pcm_route_matches_device():
    """decode_corpus(route='native') — the C++ host decode straight to
    PCM — matches the device path within the project eps (both are
    independently ~1e-7 of libvorbis); i16 within 1 LSB (rounding of
    1e-7-different floats can flip at .5 boundaries)."""
    from conftest import DATA_DIR, MONO_OGG, STEREO_OGG
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    blobs = [open(p, "rb").read()
             for p in (STEREO_OGG, MONO_OGG,
                       os.path.join(DATA_DIR, "quad4s.4ch.32k.q5.ogg"))]
    nat = decode_corpus(blobs, route="native")
    dev = decode_corpus(blobs, route="device")
    assert [(o.blob_index, o.stream_index) for o in nat] == \
        [(o.blob_index, o.stream_index) for o in dev]
    for a, b in zip(nat, dev):
        assert a.pcm.shape == b.pcm.shape and a.sample_rate == b.sample_rate
        assert float(np.abs(a.pcm - b.pcm).max()) <= 1e-5
    ni = decode_corpus(blobs[:1], route="native", out_i16=True)[0]
    di = decode_corpus(blobs[:1], route="device", out_i16=True)[0]
    assert ni.pcm.dtype == np.int16
    assert int(np.abs(ni.pcm.astype(np.int32)
                      - di.pcm.astype(np.int32)).max()) <= 1


def test_native_i16_copyout_bit_equals_numpy_contract():
    """pov_pcm_get_i16 converts during the C copy-out (lrintf under the
    default FE_TONEAREST = round-half-to-even, same as np.round); its
    output must be BIT-identical to pcm_f32_to_i16 applied to the f32
    copy-out, including exact .5 boundaries and clamping."""
    from conftest import DATA_DIR, MONO_OGG, STEREO_OGG
    from parseoggvorbis_tpu.native.frontend import _load, decode_pcm_native
    from parseoggvorbis_tpu.runtime.batch import pcm_f32_to_i16

    assert hasattr(_load(), "pov_pcm_get_i16"), "stale native build"
    for path in (MONO_OGG, STEREO_OGG,
                 os.path.join(DATA_DIR, "quad4s.4ch.32k.q5.ogg")):
        blob = open(path, "rb").read()
        f32 = decode_pcm_native(blob)
        i16 = decode_pcm_native(blob, out_i16=True)
        assert len(f32) == len(i16)
        for (p32, r32), (p16, r16) in zip(f32, i16):
            assert r32 == r16 and p16.dtype == np.int16
            np.testing.assert_array_equal(pcm_f32_to_i16(p32), p16)
    # a CHAINED blob takes the general handle path (the decode-into fast
    # path skips multi-BOS blobs), so this leg exercises the
    # pov_pcm_get_i16 copy-out itself, which single-stream blobs above
    # never reach anymore
    chained = (open(MONO_OGG, "rb").read() + open(STEREO_OGG, "rb").read())
    f32 = decode_pcm_native(chained)
    i16 = decode_pcm_native(chained, out_i16=True)
    assert len(f32) == len(i16) == 2
    for (p32, _), (p16, _) in zip(f32, i16):
        assert p16.dtype == np.int16
        np.testing.assert_array_equal(pcm_f32_to_i16(p32), p16)


def test_native_decode_into_fast_path_and_fallbacks():
    """pov_decode_pcm_into writes PCM straight into the caller's buffer
    (sized by the same page scan route=auto uses).  Its results must be
    bit-identical to the general handle API's, and every case it cannot
    serve exactly — chained multi-stream blobs, truncated streams —
    must fall back to the handle path transparently."""
    from conftest import MONO_OGG, STEREO_OGG
    from parseoggvorbis_tpu.native.frontend import _load, decode_pcm_native
    from parseoggvorbis_tpu.utils.errors import ParseError

    assert hasattr(_load(), "pov_decode_pcm_into"), "stale native build"
    m = open(MONO_OGG, "rb").read()
    s = open(STEREO_OGG, "rb").read()
    # chained blob: the fast path refuses (one buffer, one stream) and
    # the wrapper falls back — both streams decode, bit-equal to the
    # single-blob fast-path results
    outs = decode_pcm_native(m + s)
    assert [o[0].shape[0] for o in outs] == [1, 2]
    np.testing.assert_array_equal(outs[0][0], decode_pcm_native(m)[0][0])
    np.testing.assert_array_equal(outs[1][0], decode_pcm_native(s)[0][0])
    # malformed input raises the same ParseError messages as the handle
    # path (strict reference contract), not a fast-path-specific error
    with pytest.raises(ParseError, match="bad capture pattern"):
        decode_pcm_native(b"junk" * 500)
    with pytest.raises(ParseError, match="truncated page payload"):
        decode_pcm_native(s[: len(s) // 2])
    # a lying (absurdly large) final granule must hit the decoder's own
    # strict check, not become a huge fast-path allocation: the
    # 64-samples-per-byte plausibility cap skips the fast path first
    import struct

    from parseoggvorbis_tpu.utils.crc import update_crc

    lying = bytearray(m)
    off, pages = 0, []
    while True:
        off = lying.find(b"OggS", off)
        if off < 0:
            break
        nseg = lying[off + 26]
        span = 27 + nseg + sum(lying[off + 27:off + 27 + nseg])
        pages.append((off, span))
        off += span
    last, span = pages[-1]
    struct.pack_into("<q", lying, last + 6, 1 << 52)
    struct.pack_into("<I", lying, last + 22, 0)
    struct.pack_into("<I", lying, last + 22,
                     update_crc(0, bytes(lying[last:last + span])))
    with pytest.raises(ParseError, match="granule position error"):
        decode_pcm_native(bytes(lying))


def test_native_route_chained_isolation_and_validation():
    from conftest import MONO_OGG, STEREO_OGG
    from parseoggvorbis_tpu.runtime.batch import decode_corpus
    from parseoggvorbis_tpu.utils.errors import ParseError

    m = open(MONO_OGG, "rb").read()
    s = open(STEREO_OGG, "rb").read()
    # chained blob expands to two streams, BOS order
    outs = decode_corpus([m + s], route="native")
    assert [(o.stream_index, o.pcm.shape[0]) for o in outs] == \
        [(0, 1), (1, 2)]
    # per-blob isolation under strict=False; strict raises
    outs = decode_corpus([b"junk" * 99, m], route="native", strict=False)
    assert outs[0].error and outs[1].ok and outs[1].pcm.shape[0] == 1
    with pytest.raises(ParseError):
        decode_corpus([b"junk" * 99], route="native")
    with pytest.raises(ParseError):
        decode_corpus([m], route="native", ranges=[(0, 100)])
    with pytest.raises(ParseError):
        decode_corpus([m], route="nope")


def test_route_auto_picks_native_on_cpu_only_hosts():
    """The test env forces JAX_PLATFORMS=cpu, so auto must resolve to the
    native host route (no accelerator to feed)."""
    from conftest import MONO_OGG
    from parseoggvorbis_tpu.runtime.batch import decode_bytes, decode_corpus

    m = open(MONO_OGG, "rb").read()
    out = decode_corpus([m], route="auto")[0]
    want = decode_bytes(m)
    assert out.pcm.shape == want.pcm.shape
    assert float(np.abs(out.pcm - want.pcm).max()) <= 1e-5


def test_route_env_preference_vs_explicit():
    """POV_ROUTE=native is an ambient preference: range-incompatible
    calls silently use the device path.  An explicit route='native' with
    ranges is a caller error (and never silently changes backend)."""
    from conftest import MONO_OGG
    from parseoggvorbis_tpu.runtime.batch import decode_corpus
    from parseoggvorbis_tpu.utils.errors import ParseError

    m = open(MONO_OGG, "rb").read()
    old = os.environ.get("POV_ROUTE")
    os.environ["POV_ROUTE"] = "native"
    try:
        outs = decode_corpus([m], ranges=[(0, 1000)])
        assert outs[0].pcm.shape[1] == 1000  # fell back to device path
    finally:
        if old is None:
            os.environ.pop("POV_ROUTE", None)
        else:
            os.environ["POV_ROUTE"] = old
    with pytest.raises(ParseError):
        decode_corpus([m], route="native", ranges=[(0, 1000)])


def test_native_route_no_vorbis_stream_is_a_parse_error():
    """Device-route contract: a blob with no decodable Vorbis stream
    raises (strict) / isolates (non-strict) — never a silently missing
    output that misaligns outs[i] with blobs[i]."""
    import struct

    from conftest import MONO_OGG
    from parseoggvorbis_tpu.runtime.batch import decode_corpus
    from parseoggvorbis_tpu.utils.crc import ogg_page_crc
    from parseoggvorbis_tpu.utils.errors import ParseError

    # a single valid non-Vorbis stream (theora-style BOS)
    payload = b"\x80theora" + bytes(20)
    header = struct.pack("<4sBBqIIIB", b"OggS", 0, 0x06, 0, 7, 0, 0, 1)
    seg = bytes([len(payload)])
    crc = ogg_page_crc(header, seg, payload)
    page = header[:22] + struct.pack("<I", crc) + header[26:] + seg + payload
    for blob in (page, b""):
        with pytest.raises(ParseError):
            decode_corpus([blob], route="native")
    m = open(MONO_OGG, "rb").read()
    outs = decode_corpus([page, m], route="native", strict=False)
    assert not outs[0].ok and "vorbis" in outs[0].error
    assert outs[1].ok and outs[1].blob_index == 1


def test_native_crc32_matches_python_reference():
    """pov_crc32's slice-by-8 fold (native/pov_core.h) equals the
    canonical byte-serial utils/crc.py table loop — every length class
    the 8-byte fold can hit (empty, sub-word tails, exact folds, odd
    straddles) and chained inits, plus real page bytes."""
    import numpy as np

    from conftest import STEREO_OGG
    from parseoggvorbis_tpu.native import frontend
    from parseoggvorbis_tpu.utils.crc import update_crc

    if frontend.crc32(b"") is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1234)
    for n in (0, 1, 2, 3, 7, 8, 9, 15, 16, 17, 23, 24, 27, 255, 256, 4095):
        buf = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for init in (0, 1, 0xDEADBEEF, 0xFFFFFFFF):
            assert frontend.crc32(buf, init) == update_crc(init, buf), (n, init)
    page = open(STEREO_OGG, "rb").read()[:8192]
    assert frontend.crc32(page) == update_crc(0, page)
    # chaining property: crc(a+b) == crc(b, chained from crc(a))
    a, b = page[:1003], page[1003:2005]
    assert frontend.crc32(b, frontend.crc32(a)) == frontend.crc32(a + b)

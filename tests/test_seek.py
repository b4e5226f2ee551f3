"""Sample-exact random access (ogg/seek.py + decode_sample_range).

Capability beyond the reference (it always decodes from byte 0; the
ecosystem bar is vorbisfile's ov_pcm_seek): for every range,
``decode_sample_range(data, s, e)`` must equal
``decode_bytes(data).pcm[:, s:e]`` SAMPLE-exactly — same samples, same
shape — because Vorbis packet decode is stateless given setup and
overlap-add only spans adjacent frames (see ogg/seek.py's module
docstring).  Values are bitwise equal when the spliced decode compiles
to the same executable shapes as the full decode (always observed on the
TPU MXU path); when the splice's smaller frame buckets make XLA:CPU
retile a matmul, values can differ by 1-2 ulp — the same reassociation
class as the chunked streaming path's documented 2e-6 bound, which
``assert_range`` enforces while preferring exact equality.
"""

import os
import struct
import sys

import numpy as np
import pytest

from conftest import DATA_DIR, MONO_OGG, REPO_ROOT, STEREO_OGG

sys.path.insert(0, os.path.join(REPO_ROOT, "tests", "tools"))

from repaginate import repaginate

from parseoggvorbis_tpu.ogg.seek import plan_sample_range, walk_pages
from parseoggvorbis_tpu.runtime.batch import (
    decode_bytes,
    decode_sample_range,
    decode_time_range,
)
from parseoggvorbis_tpu.utils.errors import ParseError

BENCH = os.path.join(DATA_DIR, "bench")

_FILES = {
    "mono": MONO_OGG,
    "stereo": STEREO_OGG,
    "music-q8": os.path.join(BENCH, "music8s.stereo.44k.q8.ogg"),
    "surround": os.path.join(BENCH, "surround6s.5_1.44k.q4.ogg"),
    "long64s": os.path.join(BENCH, "long64s.stereo.44k.q3.ogg"),
}


def assert_range(got, want, ctx=None):
    """Same shape; bitwise if the executables matched, else <= 2e-6
    (batch-shape matmul retiling — see the module docstring)."""
    assert got.shape == want.shape, (ctx, got.shape, want.shape)
    if got.size and not np.array_equal(got, want):
        assert got.dtype != np.int16, ctx  # i16 conversion must not drift
        assert float(np.abs(got - want).max()) <= 2e-6, ctx


@pytest.fixture(scope="module", params=list(_FILES))
def decoded(request):
    path = _FILES[request.param]
    if not os.path.exists(path):
        pytest.skip("bench corpus not generated")
    data = open(path, "rb").read()
    return data, decode_bytes(data).pcm


def _ranges(total):
    """Edge-heavy sample ranges: start, interior, block boundaries, end."""
    return [
        (0, min(1000, total)),
        (1, 2),
        (total // 3, total // 3 + 4096 + 7),
        (total // 2, None),
        (max(0, total - 257), total + 10_000),  # clamped past the end
    ]


def test_range_bit_exact(decoded):
    data, full = decoded
    total = full.shape[1]
    for s, e in _ranges(total):
        got = decode_sample_range(data, s, e).pcm
        assert_range(got, full[:, s:e], (s, e))


def test_empty_ranges(decoded):
    data, full = decoded
    total = full.shape[1]
    for s, e in [(5, 5), (100, 40), (total, None), (total + 10**6, None)]:
        got = decode_sample_range(data, s, e)
        assert got.pcm.shape == (full.shape[0], 0)
        assert got.pcm.dtype == np.float32


def test_negative_start_clamps(decoded):
    data, full = decoded
    got = decode_sample_range(data, -50, 100).pcm
    assert_range(got, full[:, :100])


def test_range_i16(decoded):
    data, _ = decoded
    full = decode_bytes(data, out_i16=True).pcm
    s, e = full.shape[1] // 4, full.shape[1] // 4 + 2000
    got = decode_sample_range(data, s, e, out_i16=True)
    assert got.pcm.dtype == np.int16
    assert_range(got.pcm, full[:, s:e])
    empty = decode_sample_range(data, full.shape[1] + 1, None, out_i16=True)
    assert empty.pcm.dtype == np.int16 and empty.pcm.shape[1] == 0


def test_python_frontend_range(decoded):
    data, full = decoded
    s = full.shape[1] // 2
    got = decode_sample_range(data, s, s + 777, prefer_native=False).pcm
    assert_range(got, full[:, s:s + 777])


def test_time_range_seconds():
    data = open(STEREO_OGG, "rb").read()
    full = decode_bytes(data)
    rate = full.sample_rate
    got = decode_time_range(data, 0.25, 0.75)
    assert got.sample_rate == rate
    want = full.pcm[:, int(0.25 * rate):int(0.75 * rate)]
    assert_range(got.pcm, want)
    assert decode_time_range(data, 1e6).pcm.shape[1] == 0


def test_seek_into_spanning_pages():
    """Anchor walk-back over CONTINUED pages: the repaginated stream has
    audio packets spanning page boundaries; ranges must stay bit-exact."""
    path = _FILES["music-q8"]
    if not os.path.exists(path):
        pytest.skip("bench corpus not generated")
    spanned, n_spans = repaginate(open(path, "rb").read())
    assert n_spans >= 5
    full = decode_bytes(spanned).pcm
    total = full.shape[1]
    for s, e in [(total // 2, total // 2 + 3000), (total - 1000, None)]:
        got = decode_sample_range(spanned, s, e).pcm
        assert_range(got, full[:, s:e], (s, e))


def test_multiplexed_serial_selection():
    """Seek in an interleaved two-stream file, both by default and by an
    explicit serial."""
    from parseoggvorbis_tpu.utils.crc import ogg_page_crc
    from parseoggvorbis_tpu.ogg.page import HEADER_SIZE, read_page

    def raw_pages(data):
        pages, off = [], 0
        while off < len(data):
            page, nxt = read_page(data, off)
            if page is None:
                break
            pages.append(data[off:nxt])
            off = nxt
        return pages

    def set_serial(page_bytes, serial):
        buf = bytearray(page_bytes)
        struct.pack_into("<I", buf, 14, serial)
        buf[22:26] = b"\x00\x00\x00\x00"
        nseg = buf[26]
        crc = ogg_page_crc(bytes(buf[:HEADER_SIZE]),
                           bytes(buf[HEADER_SIZE:HEADER_SIZE + nseg]),
                           bytes(buf[HEADER_SIZE + nseg:]))
        struct.pack_into("<I", buf, 22, crc)
        return bytes(buf)

    mono = open(MONO_OGG, "rb").read()
    stereo = open(STEREO_OGG, "rb").read()
    pm = [set_serial(p, 0x1111) for p in raw_pages(mono)]
    ps = [set_serial(p, 0x2222) for p in raw_pages(stereo)]
    rest, a, b = [], pm[1:], ps[1:]
    while a or b:
        if a:
            rest.append(a.pop(0))
        if b:
            rest.append(b.pop(0))
    data = b"".join([pm[0], ps[0]] + rest)

    full_mono = decode_bytes(mono).pcm
    full_stereo = decode_bytes(stereo).pcm
    # default: first Vorbis stream (mono, serial 0x1111)
    got = decode_sample_range(data, 1000, 3000).pcm
    assert_range(got, full_mono[:, 1000:3000])
    # explicit serial: the stereo stream
    got = decode_sample_range(data, 1000, 3000, serial=0x2222).pcm
    assert got.shape[0] == 2
    assert_range(got, full_stereo[:, 1000:3000])


def test_walk_pages_index():
    data = open(STEREO_OGG, "rb").read()
    idx = walk_pages(data)
    full = decode_bytes(data)
    assert idx.total_samples == full.pcm.shape[1]
    # header span: 3 packets complete before the first audio page
    assert sum(p.completions for p in idx.pages[:idx.header_end]) == 3
    assert all(p.granule == 0 for p in idx.pages[:idx.header_end])
    # byte coverage: pages tile the file exactly (single-stream file)
    assert idx.pages[0].offset == 0
    for a, b in zip(idx.pages, idx.pages[1:]):
        assert a.end == b.offset
    assert idx.pages[-1].end == len(data)


def test_walk_pages_rejects_non_vorbis():
    with pytest.raises(ParseError):
        walk_pages(b"not an ogg stream at all")
    with pytest.raises(ParseError):
        walk_pages(open(STEREO_OGG, "rb").read(), serial=0xDEAD)


def test_plan_headers_only():
    """A headers-only truncation plans an empty range (no audio pages)."""
    data = open(STEREO_OGG, "rb").read()
    idx = walk_pages(data)
    head_end = idx.pages[idx.header_end - 1].end
    idx2 = walk_pages(data[:head_end])
    plan = plan_sample_range(idx2, 0, None)
    assert plan.empty
    got = decode_sample_range(data[:head_end], 0, None)
    assert got.pcm.shape == (2, 0)


def test_chunked_range(monkeypatch):
    """A long range decodes through launch_stream_decode's chunked path
    (bounded device memory) with the spliced absolute accounting intact."""
    from parseoggvorbis_tpu.runtime import device_decoder as dd

    path = _FILES["long64s"]
    if not os.path.exists(path):
        pytest.skip("bench corpus not generated")
    data = open(path, "rb").read()
    full = decode_bytes(data).pcm
    total = full.shape[1]
    monkeypatch.setattr(dd, "_CHUNK_T", 24)  # force many chunks
    s, e = total // 4, total // 4 + 200_000
    got = decode_sample_range(data, s, e).pcm
    assert_range(got, full[:, s:e])


def test_decode_file_range_mmap():
    """decode_file_range mmaps the file: O(range) IO, same exact output."""
    from parseoggvorbis_tpu.runtime.batch import decode_file_range

    path = _FILES["long64s"]
    if not os.path.exists(path):
        pytest.skip("bench corpus not generated")
    full = decode_bytes(open(path, "rb").read()).pcm
    s, e = 44100 * 20, 44100 * 20 + 5000
    got = decode_file_range(path, s, e)
    assert_range(got.pcm, full[:, s:e])
    got = decode_file_range(path, s, e, prefer_native=False, out_i16=True)
    assert got.pcm.dtype == np.int16


def test_streaming_seek():
    """StreamingDecode(start_sample=N): O(window) streaming from mid-file,
    bit-identical to the tail of a full decode."""
    from parseoggvorbis_tpu.runtime.batch import decode_bytes_streaming

    path = _FILES["long64s"]
    if not os.path.exists(path):
        pytest.skip("bench corpus not generated")
    data = open(path, "rb").read()
    full = decode_bytes(data).pcm
    s = 44100 * 40 + 123
    sd = decode_bytes_streaming(data, start_sample=s)
    got = sd.read_all()
    assert got.sample_rate == 44100
    assert_range(got.pcm, full[:, s:])
    # chunked iteration from an offset, i16
    sd = decode_bytes_streaming(data, out_i16=True, start_sample=s,
                                chunk_frames=64)
    chunks = list(sd)
    assert len(chunks) > 3
    full16 = decode_bytes(data, out_i16=True).pcm
    assert_range(np.concatenate(chunks, axis=1), full16[:, s:])
    # past the end: empty
    sd = decode_bytes_streaming(data, start_sample=full.shape[1] + 10)
    assert sd.read_all().pcm.shape[1] == 0


def test_walk_pages_error_branches():
    data = open(STEREO_OGG, "rb").read()
    # truncated mid page header
    with pytest.raises(ParseError):
        walk_pages(data[:len(data) // 2 + 3])
    # valid framing but no Vorbis BOS: rewrite the id-header signature
    idx = walk_pages(data)
    from parseoggvorbis_tpu.utils.crc import ogg_page_crc
    from parseoggvorbis_tpu.ogg.page import HEADER_SIZE

    first = bytearray(data[:idx.pages[0].end])
    nseg = first[26]
    payload_off = HEADER_SIZE + nseg
    assert first[payload_off:payload_off + 7] == b"\x01vorbis"
    first[payload_off + 1:payload_off + 7] = b"norbis"
    first[22:26] = b"\x00\x00\x00\x00"
    crc = ogg_page_crc(bytes(first[:HEADER_SIZE]),
                       bytes(first[HEADER_SIZE:payload_off]),
                       bytes(first[payload_off:]))
    struct.pack_into("<I", first, 22, crc)
    with pytest.raises(ParseError, match="no Vorbis BOS"):
        walk_pages(bytes(first) + data[idx.pages[0].end:])


def test_solve_base_requires_granule():
    from parseoggvorbis_tpu.runtime.batch import (
        _solve_emission_base, parse_stream)

    data = open(STEREO_OGG, "rb").read()
    sf = parse_stream(data)
    sf.granules = np.full_like(sf.granules, -1)
    with pytest.raises(ParseError, match="no granule"):
        _solve_emission_base(sf)


def test_short_stream_truncating_first_granule():
    """Seek in a stream whose ONLY audio page carries a truncating EOS
    granule: the base must come from abs_base=0 accounting, not from
    solving against the (truncating) first granule.  Regression for a
    ParseError found by the roundtrip fuzzer's seek probe."""
    import vorbis_oracle
    if not vorbis_oracle.available():
        pytest.skip("system libvorbis not installed")
    from parseoggvorbis_tpu.ogg.seek import walk_pages as wp
    from parseoggvorbis_tpu.runtime.batch import decode_bytes_streaming

    rng = np.random.RandomState(0)
    pcm = (rng.randn(1, 700) * 0.3).astype(np.float32)
    ogg = vorbis_oracle.encode_ogg(pcm, 8000, 0.2, serial=7)
    idx = wp(ogg)
    assert len(idx.audio_pages) == 1  # the regression precondition
    full = decode_bytes(ogg).pcm
    assert full.shape[1] == 700  # EOS granule truncates the lapped sum
    for s, e in [(0, 100), (100, 400), (500, None), (699, None)]:
        got = decode_sample_range(ogg, s, e).pcm
        assert_range(got, full[:, s:e], (s, e))
    got = decode_bytes_streaming(ogg, start_sample=200).read_all()
    assert_range(got.pcm, full[:, 200:])


def test_corpus_ranges_batched():
    """decode_corpus(ranges=...): batched random access — ranged blobs
    splice+batch with unranged blobs on device, each sample-exact."""
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    m = open(MONO_OGG, "rb").read()
    s = open(STEREO_OGG, "rb").read()
    fm = decode_bytes(m).pcm
    fs = decode_bytes(s).pcm
    outs = decode_corpus([m, s, m, s],
                         ranges=[(1000, 5000), None, (60000, None),
                                 (0, 2000)])
    assert [o.ok for o in outs] == [True] * 4
    assert_range(outs[0].pcm, fm[:, 1000:5000])
    assert_range(outs[1].pcm, fs)
    assert_range(outs[2].pcm, fm[:, 60000:])
    assert_range(outs[3].pcm, fs[:, :2000])
    # i16 delivery + empty range past the end
    outs = decode_corpus([s, m], out_i16=True,
                         ranges=[(500, 1500), (10**9, None)])
    f16 = decode_bytes(s, out_i16=True).pcm
    assert_range(outs[0].pcm, f16[:, 500:1500])
    assert outs[1].pcm.shape[1] == 0 and outs[1].ok


def test_corpus_ranges_per_stream_and_mesh(monkeypatch):
    """Ranged corpus decode through the per-stream flow and the mesh flow."""
    from parseoggvorbis_tpu.parallel.mesh import make_mesh
    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    m = open(MONO_OGG, "rb").read()
    fm = decode_bytes(m).pcm
    monkeypatch.setattr(dd, "_GROUP_S", 1)
    outs = decode_corpus([m, m], ranges=[(2000, 9000), None])
    assert_range(outs[0].pcm, fm[:, 2000:9000])
    assert_range(outs[1].pcm, fm)
    monkeypatch.undo()
    mesh = make_mesh(4)
    outs = decode_corpus([m, m], mesh=mesh, ranges=[(2000, 9000), None])
    assert_range(outs[0].pcm, fm[:, 2000:9000])
    assert_range(outs[1].pcm, fm)


def test_corpus_ranges_isolation():
    """A garbage ranged blob fails alone (strict=False); strict raises."""
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    m = open(MONO_OGG, "rb").read()
    fm = decode_bytes(m).pcm
    outs = decode_corpus([b"garbage", m], strict=False,
                         ranges=[(0, 100), (100, 300)])
    assert not outs[0].ok
    assert outs[1].ok
    assert_range(outs[1].pcm, fm[:, 100:300])
    with pytest.raises(Exception):
        decode_corpus([b"garbage"], ranges=[(0, 100)])
    with pytest.raises(Exception):
        decode_corpus([m], ranges=[(0, 10), (0, 10)])  # length mismatch


def test_inflated_anchor_granule_fails_loudly():
    """A stream whose tail granules are consistently inflated (so the
    in-splice granule validation passes) must raise, not silently return
    audio from the wrong position (review finding: decode_sample_range's
    un-clamped lo went negative and sliced from the END of the buffer;
    decode_corpus clamped to 0 and returned the wrong window)."""
    from repaginate import _emit_page, _lacings, demux_packets

    from parseoggvorbis_tpu.runtime.batch import (decode_corpus,
                                                  decode_sample_range)

    data = open(MONO_OGG, "rb").read()
    serial, packets = demux_packets(data)
    granuled = [i for i, (_, g) in enumerate(packets) if g >= 0 and i > 3]
    jump_at = granuled[len(granuled) // 2]
    jump_g = packets[jump_at][1]
    BIG = 10 ** 6
    out = bytearray()
    for i, (pkt, granule) in enumerate(packets):
        bos = 0x02 if i == 0 else 0
        eos = 0x04 if i == len(packets) - 1 else 0
        g = granule if granule >= 0 else (0 if i < 3 else -1)
        if g >= 0 and i >= jump_at:
            g += BIG
        _emit_page(out, serial, i, g, bos | eos,
                   _lacings(len(pkt), terminated=True), pkt)
    poisoned = bytes(out)
    start = max(0, jump_g - 100)
    with pytest.raises(Exception, match="granule|anchor"):
        decode_sample_range(poisoned, start, start + 500)
    res = decode_corpus([poisoned], ranges=[(start, start + 500)],
                        strict=False)
    assert not res[0].ok and (
        "granule" in res[0].error or "anchor" in res[0].error)


def _audio_on_setup_page_blob():
    """Mono golden re-paged with the first audio packet sharing the SETUP
    page — spec-violating framing the parser decodes but the seek planner
    rejects ('audio packet on a header page')."""
    from repaginate import _emit_page, _lacings, demux_packets

    data = open(MONO_OGG, "rb").read()
    serial, packets = demux_packets(data)
    out = bytearray()
    _emit_page(out, serial, 0, 0, 0x02,
               _lacings(len(packets[0][0]), terminated=True), packets[0][0])
    _emit_page(out, serial, 1, 0, 0,
               _lacings(len(packets[1][0]), terminated=True), packets[1][0])
    both = packets[2][0] + packets[3][0]
    lac = (_lacings(len(packets[2][0]), terminated=True)
           + _lacings(len(packets[3][0]), terminated=True))
    g3 = packets[3][1] if packets[3][1] >= 0 else 0
    _emit_page(out, serial, 2, g3, 0, lac, both)
    for seq, (i, (pkt, g)) in enumerate(
            list(enumerate(packets))[4:], start=3):
        eos = 0x04 if i == len(packets) - 1 else 0
        _emit_page(out, serial, seq, g if g >= 0 else -1, eos,
                   _lacings(len(pkt), terminated=True), pkt)
    return bytes(out)


def test_unplannable_blob_still_returns_the_requested_crop():
    """When range planning fails but the full parse succeeds (strict=False),
    the caller must get the REQUESTED crop via decode-everything-and-slice —
    never the full stream mislabeled as a crop (review finding: plans[i]
    was None, so finish() applied no range slice)."""
    from parseoggvorbis_tpu.runtime.batch import decode_bytes, decode_corpus

    blob = _audio_on_setup_page_blob()
    full = decode_bytes(blob).pcm
    outs = decode_corpus([blob], ranges=[(1000, 2000)], strict=False)
    assert outs[0].ok, outs[0].error
    assert outs[0].pcm.shape[1] == 1000
    np.testing.assert_array_equal(outs[0].pcm, full[:, 1000:2000])
    # strict mode still refuses the unplannable framing loudly
    with pytest.raises(Exception):
        decode_corpus([blob], ranges=[(1000, 2000)], strict=True)

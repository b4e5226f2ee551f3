"""Chained and multiplexed Ogg demux in the batch front-ends (native + python).

Reference semantics (OggReader::_read_page, ParseOggVorbis.hpp:1433-1484):
streams are created at BOS, pages dispatch by stream_serial_num, EOS
retires the serial.  Round-1 gap: the batch front-end ignored serials and
errored on any chained/multiplexed file (VERDICT item 6).
"""

import struct

import numpy as np
import pytest

from conftest import MONO_OGG, STEREO_OGG

from parseoggvorbis_tpu.ogg.page import HEADER_SIZE, read_page
from parseoggvorbis_tpu.runtime.batch import (
    decode_all_streams, decode_bytes, decode_corpus, parse_streams,
)
from parseoggvorbis_tpu.utils.crc import ogg_page_crc
from parseoggvorbis_tpu.utils.errors import ParseError


def _raw_pages(data):
    """Split a file into raw page byte strings."""
    pages = []
    offset = 0
    while offset < len(data):
        page, next_offset = read_page(data, offset)
        if page is None:
            break
        pages.append(data[offset:next_offset])
        offset = next_offset
    return pages


def _set_serial(page_bytes, serial):
    """Rewrite a raw page's serial number and fix its CRC."""
    buf = bytearray(page_bytes)
    struct.pack_into("<I", buf, 14, serial)
    buf[22:26] = b"\x00\x00\x00\x00"
    nseg = buf[26]
    crc = ogg_page_crc(bytes(buf[:HEADER_SIZE]),
                       bytes(buf[HEADER_SIZE:HEADER_SIZE + nseg]),
                       bytes(buf[HEADER_SIZE + nseg:]))
    struct.pack_into("<I", buf, 22, crc)
    return bytes(buf)


@pytest.fixture(scope="module")
def mono():
    return open(MONO_OGG, "rb").read()


@pytest.fixture(scope="module")
def stereo():
    return open(STEREO_OGG, "rb").read()


@pytest.mark.parametrize("prefer_native", [True, False],
                         ids=["native", "python"])
def test_chained_parse(mono, stereo, prefer_native):
    sfs = parse_streams(mono + stereo, prefer_native=prefer_native)
    assert [(s.channels, s.num_frames) for s in sfs] == [(1, 67), (2, 94)]


@pytest.mark.parametrize("prefer_native", [True, False],
                         ids=["native", "python"])
def test_multiplexed_parse(mono, stereo, prefer_native):
    """Pages of two streams interleaved (grouped multiplexing)."""
    pm = [_set_serial(p, 0x1111) for p in _raw_pages(mono)]
    ps = [_set_serial(p, 0x2222) for p in _raw_pages(stereo)]
    inter = [pm[0], ps[0]]  # both BOS pages first (spec requirement)
    a, b = pm[1:], ps[1:]
    rest = []
    while a or b:
        if a:
            rest.append(a.pop(0))
        if b:
            rest.append(b.pop(0))
    data = b"".join(inter + rest)
    sfs = parse_streams(data, prefer_native=prefer_native)
    assert [(s.channels, s.num_frames) for s in sfs] == [(1, 67), (2, 94)]


def test_chained_decode_corpus_expands(mono, stereo):
    ref_m = decode_bytes(mono)
    ref_s = decode_bytes(stereo)
    out = decode_corpus([mono + stereo, stereo])
    assert [(o.blob_index, o.stream_index) for o in out] == [
        (0, 0), (0, 1), (1, 0)]
    np.testing.assert_array_equal(out[0].pcm, ref_m.pcm)
    np.testing.assert_array_equal(out[1].pcm, ref_s.pcm)
    np.testing.assert_array_equal(out[2].pcm, ref_s.pcm)


def test_decode_all_streams(mono, stereo):
    out = decode_all_streams(mono + stereo)
    assert len(out) == 2
    assert out[0].num_channels == 1 and out[1].num_channels == 2
    assert out[0].num_samples == 63488 and out[1].num_samples == 91136


@pytest.mark.parametrize("prefer_native", [True, False],
                         ids=["native", "python"])
def test_unknown_serial_rejected(mono, prefer_native):
    pages = _raw_pages(mono)
    # second page rewritten to a serial that never had a BOS
    bad = pages[0] + _set_serial(pages[1], 0xDEAD) + b"".join(pages[2:])
    with pytest.raises(ParseError, match="unknown stream serial"):
        parse_streams(bad, prefer_native=prefer_native)


@pytest.mark.parametrize("prefer_native", [True, False],
                         ids=["native", "python"])
def test_duplicate_bos_rejected(mono, prefer_native):
    pages = _raw_pages(mono)
    dup = pages[0] + pages[0] + b"".join(pages[1:])
    with pytest.raises(ParseError, match="already-active stream serial"):
        parse_streams(dup, prefer_native=prefer_native)


def _fake_video_stream(serial, n_pages=4):
    """A minimal non-Vorbis logical stream (theora-style BOS magic)."""
    pages = []
    for i in range(n_pages):
        if i == 0:
            payload = b"\x80theora" + bytes(20)  # id-like packet
            flags = 0x02
        else:
            payload = b"\x00video-data" + bytes(50 + i)
            flags = 0x04 if i == n_pages - 1 else 0
        header = struct.pack("<4sBBqIIIB", b"OggS", 0, flags,
                             i * 1000, serial, i, 0, 1)
        seg = bytes([len(payload)])
        crc = ogg_page_crc(header, seg, payload)
        header = header[:22] + struct.pack("<I", crc) + header[26:]
        pages.append(header + seg + payload)
    return pages


@pytest.mark.parametrize("prefer_native", [True, False],
                         ids=["native", "python"])
def test_non_vorbis_streams_skipped(mono, prefer_native):
    """Multiplexed non-Vorbis tracks (e.g. .ogv video) are consumed and
    ignored; the Vorbis track decodes.  Beyond parity: the reference
    fails the whole file on the first non-Vorbis id packet."""
    pm = [_set_serial(p, 0x0AAA) for p in _raw_pages(mono)]
    pv = _fake_video_stream(0x0BBB)
    inter = [pm[0], pv[0]]
    a, b = pm[1:], pv[1:]
    rest = []
    while a or b:
        if a:
            rest.append(a.pop(0))
        if b:
            rest.append(b.pop(0))
    data = b"".join(inter + rest)
    sfs = parse_streams(data, prefer_native=prefer_native)
    assert [(s.channels, s.num_frames) for s in sfs] == [(1, 67)]
    out = decode_corpus([data])
    assert len(out) == 1 and out[0].num_samples == 63488


@pytest.mark.parametrize("prefer_native", [True, False],
                         ids=["native", "python"])
def test_only_non_vorbis_streams_rejected(prefer_native):
    data = b"".join(_fake_video_stream(0x0CCC))
    with pytest.raises(ParseError, match="no vorbis stream"):
        parse_streams(data, prefer_native=prefer_native)


def test_native_chain_beyond_handle_buffer(mono):
    """A >64-link chained file parses natively (the handle buffer grows on
    demand instead of erroring, keeping front-end agreement)."""
    from parseoggvorbis_tpu.native import frontend as native

    if not native.available():
        pytest.skip("native front-end not built")
    parsed = native.parse_streams_native(mono * 70)
    assert len(parsed) == 70
    assert all(p.channels == 1 and len(p.mode_idx) == 67 for p in parsed)


def test_non_vorbis_streams_skipped_native_route(mono):
    """The native PCM route matches the skip-non-Vorbis behavior: the
    strict C++ consumer rejects the raw blob, so the route pre-demuxes
    and decodes only the Vorbis tracks (batch._split_vorbis_serials)."""
    pm = [_set_serial(p, 0x0AAA) for p in _raw_pages(mono)]
    pv = _fake_video_stream(0x0BBB)
    inter = [pm[0], pv[0]]
    a, b = pm[1:], pv[1:]
    rest = []
    while a or b:
        if a:
            rest.append(a.pop(0))
        if b:
            rest.append(b.pop(0))
    data = b"".join(inter + rest)
    out = decode_corpus([data], route="native")
    assert len(out) == 1 and out[0].num_samples == 63488
    want = decode_corpus([data])[0]
    assert float(np.abs(out[0].pcm - want.pcm).max()) <= 1e-5


def test_native_route_demux_chained_serial_reuse(mono):
    """A chained file reusing a serial after EOS, multiplexed with a
    non-Vorbis track: the native route's demux keys streams by BOS
    occurrence, not serial, so both links decode."""
    pm1 = [_set_serial(p, 0x0CCC) for p in _raw_pages(mono)]
    pv = _fake_video_stream(0x0DDD)
    pm2 = [_set_serial(p, 0x0CCC) for p in _raw_pages(mono)]  # reuse!
    data = b"".join([pm1[0], pv[0]] + pm1[1:] + pv[1:] + pm2)
    outs = decode_corpus([data], route="native")
    assert [(o.stream_index, o.num_samples) for o in outs] == \
        [(0, 63488), (1, 63488)]

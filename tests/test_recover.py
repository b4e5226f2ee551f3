"""Corruption-tolerant decode (ogg/recover.py + decode_bytes_recover).

The strict paths keep the reference's fail-on-first-bad-CRC contract
(tests/test_robustness.py); recovery is an explicit opt-in matching the
ecosystem bar (libogg/vorbisfile resync).  Contract: intact regions come
back matching the undamaged decode (exact for i16; 2e-6 for f32, the
documented splice-retiling bound), lost regions come back as zero-filled
``holes``, and skipped bytes are reported as ``damage``.
"""

import os

import numpy as np
import pytest

from conftest import DATA_DIR, MONO_OGG, STEREO_OGG

from parseoggvorbis_tpu.ogg.recover import scan_pages_tolerant
from parseoggvorbis_tpu.ogg.seek import walk_pages
from parseoggvorbis_tpu.runtime.batch import (
    decode_bytes,
    decode_bytes_recover,
)
from parseoggvorbis_tpu.utils.errors import ParseError


def _assert_outside_holes(rec, full):
    """Exact-placement regions match the undamaged decode; approximate
    regions (single stream-final-granule anchor) still carry audio."""
    assert rec.pcm.shape[0] == full.shape[0]
    n = min(rec.pcm.shape[1], full.shape[1])
    mask = np.ones(n, bool)
    for a, b in rec.holes + rec.approximate:
        mask[a:min(b, n)] = False
    got, want = rec.pcm[:, :n][:, mask], full[:, :n][:, mask]
    if rec.pcm.dtype == np.int16:
        np.testing.assert_array_equal(got, want)
    elif not np.array_equal(got, want):
        assert float(np.abs(got - want).max()) <= 2e-6
    for a, b in rec.holes:
        assert not rec.pcm[:, a:b].any()
    for a, b in rec.approximate:
        assert rec.pcm[:, a:b].any()


@pytest.fixture(scope="module")
def stereo():
    data = open(STEREO_OGG, "rb").read()
    return data, decode_bytes(data).pcm


def test_clean_stream_is_intact(stereo):
    data, full = stereo
    rec = decode_bytes_recover(data)
    assert rec.intact and rec.spans_decoded == 1 and rec.spans_dropped == 0
    assert rec.holes == [] and rec.damage == []
    assert rec.pcm.shape == full.shape
    np.testing.assert_array_equal(rec.pcm, full)
    assert rec.sample_rate == 44100


@pytest.mark.parametrize("out_i16", [False, True], ids=["f32", "i16"])
def test_single_corrupt_page(stereo, out_i16):
    data, _ = stereo
    full = decode_bytes(data, out_i16=out_i16).pcm
    idx = walk_pages(data)
    victim = idx.audio_pages[len(idx.audio_pages) // 2]
    bad = bytearray(data)
    bad[victim.offset + 200] ^= 0xFF
    rec = decode_bytes_recover(bytes(bad), out_i16=out_i16)
    assert rec.damage == [(victim.offset, victim.end)]
    assert rec.spans_decoded == 2 and rec.spans_dropped == 0
    assert len(rec.holes) == 1
    a, b = rec.holes[0]
    # the hole covers the lost page's samples (ends at its granule;
    # starts no earlier than the previous page's granule) plus at most
    # the anchor frame's warm-up window
    prev = idx.audio_pages[len(idx.audio_pages) // 2 - 1]
    assert a >= prev.granule - 8192 and b >= victim.granule
    assert rec.pcm.shape == full.shape
    _assert_outside_holes(rec, full)


def test_two_corrupt_pages(stereo):
    data, full = stereo
    idx = walk_pages(data)
    v1 = idx.audio_pages[len(idx.audio_pages) // 3]
    v2 = idx.audio_pages[2 * len(idx.audio_pages) // 3]
    bad = bytearray(data)
    bad[v1.offset + 100] ^= 0x01
    bad[v2.offset + 100] ^= 0x01
    rec = decode_bytes_recover(bytes(bad))
    assert rec.damage == [(v1.offset, v1.end), (v2.offset, v2.end)]
    assert rec.spans_decoded == 3 and len(rec.holes) == 2
    # the final span's only granule anchor is the stream-final
    # (truncating) one: end-aligned best-effort placement, reported
    assert len(rec.approximate) == 1
    _assert_outside_holes(rec, full)


def test_inserted_garbage_costs_no_samples(stereo):
    """Garbage between pages: bytes skipped, but no page lost — the page
    seqs stay contiguous, so the whole stream decodes as one span."""
    data, full = stereo
    idx = walk_pages(data)
    cut = idx.audio_pages[2].offset
    junk = b"\xde\xad\xbe\xef" * 137 + b"OggS\x00\x99"  # incl. a decoy
    bad = data[:cut] + junk + data[cut:]
    rec = decode_bytes_recover(bad)
    assert rec.damage == [(cut, cut + len(junk))]
    assert rec.holes == [] and rec.spans_decoded == 1
    np.testing.assert_array_equal(rec.pcm, full)


def test_truncated_tail(stereo):
    """A file cut mid-page: the prefix decodes; the timeline ends at the
    last intact granule."""
    data, full = stereo
    idx = walk_pages(data)
    last = idx.audio_pages[-1]
    cut = last.offset + (last.end - last.offset) // 2
    rec = decode_bytes_recover(data[:cut])
    assert rec.damage == [(last.offset, cut)]
    prev_granule = idx.audio_pages[-2].granule
    assert rec.pcm.shape[1] == prev_granule
    _assert_outside_holes(rec, full)
    assert rec.holes == []


def test_first_audio_pages_lost(stereo):
    """Damage at the very start of the audio: the first span anchors
    mid-stream (base solved from granules), the lead-in is a hole."""
    data, full = stereo
    idx = walk_pages(data)
    bad = bytearray(data)
    for v in idx.audio_pages[:2]:
        bad[v.offset + 50] ^= 0xFF
    rec = decode_bytes_recover(bytes(bad))
    assert rec.spans_decoded == 1 and len(rec.holes) == 1
    assert rec.holes[0][0] == 0
    _assert_outside_holes(rec, full)


def test_headers_damaged_is_unrecoverable(stereo):
    data, _ = stereo
    idx = walk_pages(data)
    setup_page = idx.pages[idx.header_end - 1]
    bad = bytearray(data)
    bad[setup_page.offset + 60] ^= 0xFF
    with pytest.raises(ParseError):
        decode_bytes_recover(bytes(bad))
    with pytest.raises(ParseError):
        decode_bytes_recover(b"not ogg at all" * 1000)


def test_scan_reports_seq_and_damage(stereo):
    data, _ = stereo
    scan = scan_pages_tolerant(data)
    strict = walk_pages(data)
    assert [p.offset for p in scan.index.pages] == \
        [p.offset for p in strict.pages]
    assert [p.seq for p in scan.index.pages] == \
        list(range(len(strict.pages)))
    assert scan.damage == [] and scan.bytes_skipped == 0


def test_mono_roundtrip_with_damage():
    data = open(MONO_OGG, "rb").read()
    full = decode_bytes(data).pcm
    idx = walk_pages(data)
    v = idx.audio_pages[1]
    bad = bytearray(data)
    bad[v.offset + 40] ^= 0x10
    rec = decode_bytes_recover(bytes(bad))
    assert rec.pcm.shape[0] == 1 and rec.spans_decoded >= 1
    _assert_outside_holes(rec, full)


def test_multiplexed_damage_isolated_per_stream(stereo):
    """Two multiplexed streams; one byte flipped in a stereo-stream page:
    recovering the mono serial is hole-free (damage recorded), recovering
    the stereo serial has the hole."""
    import struct

    from parseoggvorbis_tpu.ogg.page import HEADER_SIZE, read_page
    from parseoggvorbis_tpu.utils.crc import ogg_page_crc

    def pages_of(data):
        out, off = [], 0
        while off < len(data):
            page, nxt = read_page(data, off)
            if page is None:
                break
            out.append(data[off:nxt])
            off = nxt
        return out

    def set_serial(pb, serial):
        buf = bytearray(pb)
        struct.pack_into("<I", buf, 14, serial)
        buf[22:26] = b"\x00\x00\x00\x00"
        nseg = buf[26]
        crc = ogg_page_crc(bytes(buf[:HEADER_SIZE]),
                           bytes(buf[HEADER_SIZE:HEADER_SIZE + nseg]),
                           bytes(buf[HEADER_SIZE + nseg:]))
        struct.pack_into("<I", buf, 22, crc)
        return bytes(buf)

    data_s, full_s = stereo
    data_m = open(MONO_OGG, "rb").read()
    full_m = decode_bytes(data_m).pcm
    pm = pages_of(data_m)
    ps = [set_serial(p, 0x5EEE) for p in pages_of(data_s)]
    # grouped BOS pages first (RFC 3533), then interleave
    mux = [pm[0], ps[0]]
    a, b = pm[1:], ps[1:]
    while a or b:
        if a:
            mux.append(a.pop(0))
        if b:
            mux.append(b.pop(0))
    blob = b"".join(mux)
    # flip a byte inside a stereo AUDIO page (headers must stay intact)
    victim = walk_pages(blob, serial=0x5EEE).audio_pages[1]
    bad = bytearray(blob)
    bad[victim.offset + 123] ^= 0x08
    bad = bytes(bad)

    rec_m = decode_bytes_recover(bad)  # default: first Vorbis BOS = mono
    assert rec_m.holes == [] and rec_m.damage == [(victim.offset,
                                                   victim.end)]
    np.testing.assert_array_equal(rec_m.pcm, full_m)
    rec_s = decode_bytes_recover(bad, serial=0x5EEE)
    assert len(rec_s.holes) == 1
    _assert_outside_holes(rec_s, full_s)


def test_decode_file_recover(tmp_path, stereo):
    from parseoggvorbis_tpu.runtime.batch import decode_file_recover

    data, full = stereo
    idx = walk_pages(data)
    v = idx.audio_pages[3]
    bad = bytearray(data)
    bad[v.offset + 77] ^= 0x20
    p = tmp_path / "damaged.ogg"
    p.write_bytes(bytes(bad))
    rec = decode_file_recover(str(p))
    assert rec.damage == [(v.offset, v.end)] and len(rec.holes) == 1
    _assert_outside_holes(rec, full)


def test_huge_junk_region_resyncs_in_bounded_hops(stereo):
    """>64 KiB of OggS-free garbage between pages: the scanner hops one
    max-page window at a time (O(n) total) and loses no samples."""
    data, full = stereo
    idx = walk_pages(data)
    cut = idx.audio_pages[3].offset
    junk = b"\xaa" * (3 * 65536 + 12345)
    rec = decode_bytes_recover(data[:cut] + junk + data[cut:])
    assert rec.damage == [(cut, cut + len(junk))]
    assert rec.holes == [] and rec.spans_decoded == 1
    np.testing.assert_array_equal(rec.pcm, full)


def test_truncated_mid_header(stereo):
    """A file cut 10 bytes into a page header: clean tail damage."""
    data, full = stereo
    idx = walk_pages(data)
    last = idx.audio_pages[-1]
    cut = last.offset + 10
    rec = decode_bytes_recover(data[:cut])
    assert rec.damage == [(last.offset, cut)]
    _assert_outside_holes(rec, full)


def test_windowed_recovery(stereo):
    """start/end window the recovery: only overlapping spans decode,
    trimmed to their covering pages (O(range)); pcm covers the window
    with holes/approximate in absolute coordinates."""
    data, full = stereo
    idx = walk_pages(data)
    v = idx.audio_pages[2]
    bad = bytearray(data)
    bad[v.offset + 200] ^= 0xFF
    bad = bytes(bad)
    whole = decode_bytes_recover(bad)

    # window inside the intact tail: one trimmed span, no holes
    w = decode_bytes_recover(bad, start=70000, end=80000)
    assert w.start_sample == 70000 and w.pcm.shape == (2, 10000)
    assert w.holes == [] and w.spans_decoded == 1
    got, want = w.pcm, full[:, 70000:80000]
    assert np.array_equal(got, want) or \
        float(np.abs(got - want).max()) <= 2e-6

    # window straddling the hole: hole reported absolute, clipped
    a, b = whole.holes[0]
    w2 = decode_bytes_recover(bad, start=a - 2000, end=b + 2000)
    assert w2.holes == [(a, b)]
    assert not w2.pcm[:, a - w2.start_sample:b - w2.start_sample].any()
    mask = np.ones(w2.pcm.shape[1], bool)
    mask[a - w2.start_sample:b - w2.start_sample] = False
    got = w2.pcm[:, mask]
    want = full[:, a - 2000:b + 2000][:, mask]
    assert np.array_equal(got, want) or \
        float(np.abs(got - want).max()) <= 2e-6

    # window entirely inside the hole: all zeros, one hole
    w3 = decode_bytes_recover(bad, start=a + 100, end=b - 100)
    assert not w3.pcm.any() and w3.holes == [(a + 100, b - 100)]

    # clean file: windowed recovery == seek slice, past-end clamps
    w4 = decode_bytes_recover(data, start=20000, end=30000)
    assert w4.intact and w4.start_sample == 20000
    got, want = w4.pcm, full[:, 20000:30000]
    assert np.array_equal(got, want) or \
        float(np.abs(got - want).max()) <= 2e-6
    w5 = decode_bytes_recover(data, start=full.shape[1] + 5)
    assert w5.pcm.shape[1] == 0

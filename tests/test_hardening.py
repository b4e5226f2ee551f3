"""Hostile-input hardening of the decode cores (both languages).

The C ABI / route='native' / serving paths are fed untrusted bytes, so
crafted setups and packets must reject cleanly (ParseError / error code)
— never index out of range, write past a partition, or fabricate frames
from an over-end bit reader.  These cases mirror libvorbis's setup-time
validation; spec sections cited inline.
"""

import struct

import numpy as np
import pytest

from conftest import MONO_OGG, STEREO_OGG

from parseoggvorbis_tpu.ogg.page import HEADER_SIZE, read_page
from parseoggvorbis_tpu.runtime.batch import decode_bytes, decode_corpus
from parseoggvorbis_tpu.utils.bitreader import BitReader
from parseoggvorbis_tpu.utils.crc import ogg_page_crc
from parseoggvorbis_tpu.utils.errors import ParseError


def _make_page(serial, seq, granule, packets, flags=0):
    """One page holding whole packets (each < 255*255 bytes)."""
    segs = b""
    payload = b""
    for p in packets:
        n = len(p)
        while n >= 255:
            segs += bytes([255])
            n -= 255
        segs += bytes([n])
        payload += p
    header = struct.pack("<4sBBqIIIB", b"OggS", 0, flags, granule,
                         serial, seq, 0, len(segs))
    crc = ogg_page_crc(header, segs, payload)
    header = header[:22] + struct.pack("<I", crc) + header[26:]
    return header + segs + payload


def _insert_empty_packet_page(data):
    """Insert, mid-stream, a page carrying one zero-length packet."""
    pages = []
    off = 0
    while off < len(data):
        page, nxt = read_page(data, off)
        if page is None:
            break
        pages.append((data[off:nxt], page))
        off = nxt
    k = len(pages) // 2
    prev = pages[k - 1][1]
    extra = _make_page(prev.stream_serial_num, 999,
                       prev.absolute_granule_pos, [b""])
    return b"".join([raw for raw, _ in pages[:k]] + [extra]
                    + [raw for raw, _ in pages[k:]])


@pytest.mark.parametrize("path", [MONO_OGG, STEREO_OGG])
def test_zero_length_audio_packet_skipped_all_paths(path):
    """A zero-length packet is legal framing but undecodable audio
    (spec 4.3.1 EOP): every decode path skips it — identical PCM to the
    unmodified stream, like libvorbis's OV_ENOTAUDIO — instead of
    fabricating a frame from the over-end bit reader's zero bits."""
    data = open(path, "rb").read()
    want = decode_bytes(data).pcm
    bad = _insert_empty_packet_page(data)
    for kw in ({"prefer_native": True}, {"prefer_native": False},
               {"route": "native"}):
        got = decode_corpus([bad], **kw)[0].pcm
        assert got.shape == want.shape, kw
        assert float(np.abs(got - want).max()) <= 1e-5, kw


def test_residue_type2_all_unused_skips_decode():
    """Spec 8.6.4: when no vector is used, residue decode is skipped —
    zero output AND zero bits consumed (a desync otherwise)."""
    setup = _parse_setup(open(STEREO_OGG, "rb").read())
    res = next(r for r in setup.residues if r.residue_type == 2)
    br = BitReader(b"\xa5" * 64)
    out = res.decode(br, setup.codebooks, [False, False], 128)
    assert not out.any()
    assert br.read_bits(8) == 0xA5  # nothing was consumed


def _parse_setup(data):
    from parseoggvorbis_tpu.ogg.page import PacketAssembler
    from parseoggvorbis_tpu.vorbis.header import parse_id_header
    from parseoggvorbis_tpu.vorbis.setup import Setup

    asm = PacketAssembler()
    pkts, off = [], 0
    while len(pkts) < 3:
        page, off = read_page(data, off)
        pkts += [p for p, _ in asm.feed(page)]
    return Setup.parse_packet(pkts[2], parse_id_header(pkts[0]))


def test_crafted_setup_book_indices_reject_cleanly():
    """Out-of-range codebook references in floor1/residue setup fields
    reject as ParseError in BOTH languages (never an index error /
    native OOB read).  Built by patching the golden stereo setup packet
    and resealing the page CRC."""
    from parseoggvorbis_tpu.runtime.batch import (
        parse_stream,
        parse_stream_python,
    )

    from parseoggvorbis_tpu.ogg.seek import walk_pages

    data = open(MONO_OGG, "rb").read()
    # rather than compute individual field bit offsets, corrupt random
    # bytes of the SETUP page payload (CRC resealed so the bytes reach
    # the setup decoder) and require (a) clean ParseError rejection and
    # (b) python/native accept-reject agreement on every mutation
    idx = walk_pages(data)
    spage = idx.pages[idx.header_end - 1]  # the page ending the headers
    soff, send = spage.offset, spage.end
    seen_py = seen_nat = 0
    rng = np.random.RandomState(7)
    for _ in range(40):
        pos = int(rng.randint(soff + HEADER_SIZE + 20, send - 1))
        bad = bytearray(data)
        bad[pos] ^= 0xFF
        # reseal the CRC so the parse reaches the setup decoder
        hdr = bytearray(bad[soff:soff + HEADER_SIZE])
        hdr[22:26] = b"\x00\x00\x00\x00"
        nseg = bad[soff + 26]
        seg = bytes(bad[soff + HEADER_SIZE:soff + HEADER_SIZE + nseg])
        pay = bytes(bad[soff + HEADER_SIZE + nseg:send])
        crc = ogg_page_crc(bytes(hdr), seg, pay)
        bad[soff + 22:soff + 26] = struct.pack("<I", crc)
        blob = bytes(bad)
        try:
            parse_stream_python(blob)
            ok_py = True
        except (ParseError, Exception) as exc:
            ok_py = False
            assert isinstance(exc, ParseError), \
                "python must reject via ParseError, got %r" % (exc,)
            seen_py += 1
        try:
            parse_stream(blob, prefer_native=True)
            ok_nat = True
        except ParseError:
            ok_nat = False
            seen_nat += 1
        # accept/reject agreement between the front-ends.  Exception:
        # the python batch path renders floors with the device's
        # bracket-clamping integer renderer, so a defect that only
        # surfaces in scalar floor synthesis (e.g. a negative
        # prediction) can clamp-decode there while the native scalar
        # rejects — for those, require the python decode to either
        # reject cleanly or produce FINITE output (never crash/UB)
        if ok_py and not ok_nat:
            try:
                out = decode_bytes(blob, prefer_native=False)
                assert np.isfinite(out.pcm).all()
            except ParseError:
                pass
        else:
            assert ok_py == ok_nat
    assert seen_py and seen_nat  # mutations did exercise rejection paths

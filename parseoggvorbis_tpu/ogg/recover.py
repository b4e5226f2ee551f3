"""Corruption-tolerant page scan (resync) — the recovery decode's front half.

Capability beyond the reference, which hard-fails the whole file on the
first bad CRC (ParseOggVorbis.hpp reader loop; our strict paths keep that
contract).  The ecosystem bar is libogg/vorbisfile's ``ogg_sync_pageseek``:
on garbage, scan forward to the next plausible ``OggS`` capture pattern
and continue, reporting how many bytes were skipped.

:func:`scan_pages_tolerant` walks a byte buffer like ``seek.walk_pages``
but verifies every page CRC (the strict walk defers CRC to the decode; a
recovery scan must not admit corrupt payloads) and, instead of raising on
malformed bytes, resyncs to the next capture pattern, recording the
skipped byte range.  The surviving pages carry their sequence numbers, so
the decoder can split the stream into seq-contiguous *spans* and decode
each span independently via the seek splice (ogg/seek.py: Vorbis packet
decode is stateless given the headers; each span's absolute position is
solved from its first granule).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..utils.crc import ogg_page_crc
from ..utils.errors import ParseError, check
from .page import HEADER_SIZE, _HEADER_STRUCT
from .seek import PageIndexEntry, StreamPageIndex

__all__ = ["TolerantScan", "scan_pages_tolerant"]


@dataclass
class TolerantScan:
    """Result of a resyncing page walk."""

    index: StreamPageIndex  # surviving pages of the selected stream
    damage: List[Tuple[int, int]]  # byte ranges skipped while resyncing

    @property
    def bytes_skipped(self) -> int:
        return sum(b - a for a, b in self.damage)


def _crc_page(header_zero_crc: bytes, segment_table: bytes,
              payload: bytes) -> int:
    """Page CRC via the native table loop when built (the scan verifies
    EVERY page, so this is recovery's hot spot on long files); the pure-
    Python utils/crc.py stays the canonical reference implementation."""
    from ..native import frontend as native

    c = native.crc32(header_zero_crc, 0)
    if c is None:
        return ogg_page_crc(header_zero_crc, segment_table, payload)
    return native.crc32(payload, native.crc32(segment_table, c))


def _try_page(data, off: int):
    """Parse+verify one page at ``off``; None if not a valid page here."""
    n = len(data)
    if off + HEADER_SIZE > n:
        return None
    (capture, version, flags, granule, pserial, seq, crc,
     nseg) = _HEADER_STRUCT.unpack_from(data, off)
    if capture != b"OggS" or version != 0:
        return None
    seg_off = off + HEADER_SIZE
    if seg_off + nseg > n:
        return None
    segment_table = bytes(data[seg_off:seg_off + nseg])
    data_off = seg_off + nseg
    data_len = sum(segment_table)
    if data_off + data_len > n:
        return None
    header_zero_crc = bytearray(data[off:off + HEADER_SIZE])
    header_zero_crc[22:26] = b"\x00\x00\x00\x00"
    payload = bytes(data[data_off:data_off + data_len])
    calc = _crc_page(bytes(header_zero_crc), segment_table, payload)
    if calc != crc:
        return None
    completions = sum(1 for lace in segment_table if lace < 255)
    return PageIndexEntry(offset=off, end=data_off + data_len,
                          granule=granule, serial=pserial, flags=flags,
                          completions=completions, seq=seq)


def scan_pages_tolerant(data, serial: Optional[int] = None) -> TolerantScan:
    """Resyncing page walk over possibly-corrupt bytes.

    Every admitted page has a verified CRC.  Bytes that do not parse as a
    valid page (flipped bits, inserted garbage, truncated tails) are
    skipped to the next ``OggS`` occurrence and reported in ``damage``.
    ``serial`` selects the logical stream as in ``walk_pages`` (default:
    first stream whose valid BOS payload starts with the Vorbis id
    signature).  Raises :class:`ParseError` only when no Vorbis stream is
    identifiable at all.
    """
    pages: List[PageIndexEntry] = []
    damage: List[Tuple[int, int]] = []
    target = serial
    off = 0
    n = len(data)
    bad_from: Optional[int] = None
    while off < n:
        p = _try_page(data, off)
        if p is None:
            if bad_from is None:
                bad_from = off
            nxt = bytes(data[off + 1:off + 1 + 65536 + HEADER_SIZE]).find(
                b"OggS")
            # bound each scan hop to one max-page of lookahead so a huge
            # corrupt region costs O(n) total, then keep hopping
            if nxt < 0:
                off = off + 1 + 65536
                continue
            off = off + 1 + nxt
            continue
        if bad_from is not None:
            damage.append((bad_from, off))
            bad_from = None
        if target is None and (p.flags & 0x2):  # BOS: sniff the id header
            nseg = data[p.offset + 26]
            payload = p.offset + HEADER_SIZE + nseg
            if bytes(data[payload:payload + 7]) == b"\x01vorbis":
                target = p.serial
        if target is not None and p.serial == target:
            pages.append(p)
        off = p.end
    if bad_from is not None:
        damage.append((bad_from, n))
    if target is None:
        raise ParseError("no intact Vorbis BOS page found")
    check(bool(pages), "no intact pages for serial %d" % target)

    # Header span: same rule as the strict walk — audio begins after the
    # 3rd packet completion.  Damaged header pages are unrecoverable (the
    # setup header is required to decode anything at all).
    done = 0
    header_end = None
    for i, p in enumerate(pages):
        done += p.completions
        if done >= 3:
            check(done == 3, "stream headers damaged beyond recovery")
            header_end = i + 1
            break
    if header_end is None:
        header_end = len(pages)  # headers-only / truncated-in-headers
    # a seq gap inside the header pages means a header page was lost —
    # nothing downstream can decode without the full setup header
    check(all(pages[i].seq == pages[0].seq + i for i in range(header_end)),
          "stream headers damaged beyond recovery")
    index = StreamPageIndex(serial=target, pages=pages,
                            header_end=header_end)
    return TolerantScan(index=index, damage=damage)

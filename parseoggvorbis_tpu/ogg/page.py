"""Ogg container page layer: framing, lacing, CRC verification.

Behavior parity with the reference page layer (/root/reference/src/
ParseOggVorbis.hpp:45-102): capture-pattern check, version-0 check, CRC
verification over (header-with-zeroed-crc, segment table, payload), and the
same deliberate limitation that packets spanning pages are unsupported (the
last lacing value of a page must be < 255), capping packets at 64 KiB.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..utils.crc import ogg_page_crc
from ..utils.errors import ParseError, check

HEADER_FLAG_CONTINUED = 0x1
HEADER_FLAG_FIRST = 0x2  # BOS
HEADER_FLAG_LAST = 0x4  # EOS

_HEADER_STRUCT = struct.Struct("<4sBBqIIIB")  # 27 bytes
HEADER_SIZE = _HEADER_STRUCT.size
assert HEADER_SIZE == 27


@dataclass
class Page:
    header_type_flag: int
    absolute_granule_pos: int
    stream_serial_num: int
    page_sequence_num: int
    segment_table: bytes
    data: bytes

    @property
    def is_bos(self) -> bool:
        return bool(self.header_type_flag & HEADER_FLAG_FIRST)

    @property
    def is_eos(self) -> bool:
        return bool(self.header_type_flag & HEADER_FLAG_LAST)

    @property
    def is_continued(self) -> bool:
        return bool(self.header_type_flag & HEADER_FLAG_CONTINUED)

    def packets(self) -> List[Tuple[bytes, bool]]:
        """Reassemble packets from lacing values (strict: no spanning).

        Returns a list of (packet_bytes, is_last_packet_of_page).  A packet
        boundary is a lacing value < 255 (ParseOggVorbis.hpp:1444-1475).
        Rejects pages whose final packet continues on the next page — use
        :func:`packet_runs` + :class:`PacketAssembler` for spanning support.
        """
        out: List[Tuple[bytes, bool]] = []
        offset = 0
        length = 0
        nseg = len(self.segment_table)
        for i, lace in enumerate(self.segment_table):
            length += lace
            if lace < 255:
                out.append((self.data[offset : offset + length], i == nseg - 1))
                offset += length
                length = 0
        check(length == 0 and offset == len(self.data),
              "trailing partial packet (page-spanning packets unsupported)")
        return out

    def packet_runs(self) -> List[Tuple[bytes, bool]]:
        """Split the payload at packet boundaries, spanning-aware.

        Returns (chunk, completes) runs: every run with ``completes=True``
        ends a packet on this page; a final ``completes=False`` run (the
        page's last lacing value is 255) continues on the next page.  The
        first run continues the previous page's tail iff ``is_continued``.
        """
        runs: List[Tuple[bytes, bool]] = []
        offset = 0
        length = 0
        for lace in self.segment_table:
            length += lace
            if lace < 255:
                runs.append((self.data[offset : offset + length], True))
                offset += length
                length = 0
        if length:
            runs.append((self.data[offset : offset + length], False))
        return runs


class PacketAssembler:
    """Per-stream packet reassembly across pages.

    Lifts the reference's no-page-spanning limitation (its 64 KiB packet
    cap, ParseOggVorbis.hpp:66,89 — the reference CHECK-fails on any
    spanning packet): a page ending with lacing 255 leaves a pending tail
    that the next page of the same stream must continue (header CONTINUED
    flag).  Granule positions attach to the *last packet completed* on a
    page (RFC 3533).  A generous cap bounds memory against fuzzed input.
    """

    MAX_PACKET = 1 << 24  # 16 MiB; the reference capped at 64 KiB

    def __init__(self) -> None:
        self.pending: Optional[bytes] = None

    def feed(self, page: Page) -> List[Tuple[bytes, int]]:
        """Consume one page; returns completed (packet, granule) pairs,
        granule = page's position for the last completed packet, else -1."""
        runs = page.packet_runs()
        out: List[Tuple[bytes, int]] = []
        for idx, (chunk, completes) in enumerate(runs):
            if idx == 0:
                if page.is_continued:
                    check(self.pending is not None,
                          "continued page without a pending packet")
                    chunk = self.pending + chunk
                    self.pending = None
                else:
                    check(self.pending is None,
                          "expected packet continuation page")
            if completes:
                out.append((chunk, -1))
            else:
                check(len(chunk) <= self.MAX_PACKET, "packet too large")
                self.pending = chunk
        if not runs and not page.is_continued:
            check(self.pending is None, "expected packet continuation page")
        if out:
            out[-1] = (out[-1][0], page.absolute_granule_pos)
        if page.is_eos:
            check(self.pending is None, "EOS page with incomplete packet")
        return out


def read_page(buf: bytes, offset: int, verify_crc: bool = True) -> Tuple[Optional[Page], int]:
    """Parse one page at *offset*; returns (page, next_offset).

    Returns (None, offset) at clean EOF (no bytes left).  Raises
    :class:`ParseError` on malformed data (same strictness as the reference:
    no resync-on-corruption).
    """
    if offset >= len(buf):
        return None, offset
    if offset + HEADER_SIZE > len(buf):
        raise ParseError("truncated page header at offset %d" % offset)
    (capture, version, flags, granule, serial, seq, crc, nseg) = _HEADER_STRUCT.unpack_from(
        buf, offset
    )
    check(capture == b"OggS", "bad capture pattern")
    check(version == 0, "bad stream structure version")
    seg_off = offset + HEADER_SIZE
    check(seg_off + nseg <= len(buf), "truncated segment table")
    segment_table = bytes(buf[seg_off : seg_off + nseg])
    data_len = sum(segment_table)
    data_off = seg_off + nseg
    check(data_off + data_len <= len(buf), "truncated page payload")
    data = bytes(buf[data_off : data_off + data_len])
    if verify_crc:
        header_zero_crc = bytearray(buf[offset : offset + HEADER_SIZE])
        header_zero_crc[22:26] = b"\x00\x00\x00\x00"
        calc = ogg_page_crc(bytes(header_zero_crc), segment_table, data)
        check(calc == crc, "page CRC mismatch")
    page = Page(
        header_type_flag=flags,
        absolute_granule_pos=granule,
        stream_serial_num=serial,
        page_sequence_num=seq,
        segment_table=segment_table,
        data=data,
    )
    return page, data_off + data_len

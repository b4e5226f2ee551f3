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
        """Reassemble packets from lacing values.

        Returns a list of (packet_bytes, is_last_packet_of_page).  A packet
        boundary is a lacing value < 255 (ParseOggVorbis.hpp:1444-1475).
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
    if nseg > 0:
        check(segment_table[-1] != 255, "packets spanning pages not supported")
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

"""Ogg page CRC-32 (polynomial 0x04c11db7, non-reflected, init/xorout 0).

Same checksum as the reference's ``update_crc`` (/root/reference/src/
Utils.cpp:13-30, table src/crctable.h) — the table here is generated, not
copied.  The production hot path lives in the C++ front-end; this Python
version is the portable fallback and the test reference.
"""

from __future__ import annotations

OGG_CRC_POLY = 0x04C11DB7


def _make_table() -> list:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ OGG_CRC_POLY if r & 0x80000000 else (r << 1)) & 0xFFFFFFFF
        table.append(r)
    return table


_TABLE = _make_table()


def update_crc(crc: int, data: bytes) -> int:
    table = _TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ table[((crc >> 24) & 0xFF) ^ b]
    return crc


def ogg_page_crc(header_with_zero_crc: bytes, segment_table: bytes, data: bytes) -> int:
    crc = update_crc(0, header_with_zero_crc)
    crc = update_crc(crc, segment_table)
    return update_crc(crc, data)

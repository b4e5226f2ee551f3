"""Vorbis header packets: identification (4.2.2) and comments (4.2.3).

Reference behavior: /root/reference/src/ParseOggVorbis.hpp:104-117,
1283-1340.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List, Tuple

from ..utils.errors import check


@dataclass
class IdHeader:
    vorbis_version: int
    audio_channels: int
    audio_sample_rate: int
    bitrate_maximum: int
    bitrate_nominal: int
    bitrate_minimum: int
    blocksize_0: int
    blocksize_1: int


_ID_STRUCT = struct.Struct("<IBIIIIBB")  # 20 bytes after the 7-byte preamble


def parse_id_header(data: bytes) -> IdHeader:
    check(len(data) >= 16, "id header too short")
    check(data[0] == 1, "id header packet type")
    check(data[1:7] == b"vorbis", "id header magic")
    check(len(data) - 7 == _ID_STRUCT.size, "id header size")
    (version, channels, rate, br_max, br_nom, br_min, bs_exp, framing) = _ID_STRUCT.unpack(
        data[7:]
    )
    check(framing == 1, "id header framing")
    check(version == 0, "vorbis version")
    check(channels >= 1, "channel count")
    bs0 = 1 << (bs_exp & 0x0F)
    bs1 = 1 << ((bs_exp & 0xF0) >> 4)
    check(64 <= bs0 <= 8192, "blocksize_0 range")
    check(64 <= bs1 <= 8192, "blocksize_1 range")
    check(bs0 <= bs1, "blocksize order")
    return IdHeader(
        vorbis_version=version,
        audio_channels=channels,
        audio_sample_rate=rate,
        bitrate_maximum=br_max,
        bitrate_nominal=br_nom,
        bitrate_minimum=br_min,
        blocksize_0=bs0,
        blocksize_1=bs1,
    )


def parse_comment_header(data: bytes) -> Tuple[str, List[str]]:
    check(len(data) >= 16, "comment header too short")
    check(data[0] == 3, "comment header packet type")
    check(data[1:7] == b"vorbis", "comment header magic")
    offset = 7
    check(offset + 4 <= len(data), "comment vendor length")
    (vendor_len,) = struct.unpack_from("<I", data, offset)
    offset += 4
    check(offset + vendor_len <= len(data), "comment vendor")
    vendor = data[offset : offset + vendor_len].decode("utf8", errors="replace")
    offset += vendor_len
    check(offset + 4 <= len(data), "comment list length")
    (count,) = struct.unpack_from("<I", data, offset)
    check(offset + count * 4 < len(data), "comment list size")
    offset += 4
    comments: List[str] = []
    for _ in range(count):
        check(offset + 4 <= len(data), "comment entry length")
        (clen,) = struct.unpack_from("<I", data, offset)
        offset += 4
        check(offset + clen <= len(data), "comment entry")
        comments.append(data[offset : offset + clen].decode("utf8", errors="replace"))
        offset += clen
    check(offset + 1 == len(data), "comment framing position")
    check(data[offset] == 1, "comment framing bit")
    return vendor, comments

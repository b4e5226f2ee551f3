"""Payload-level Ogg mutations that survive demux.

A naive bit flip almost always dies at the page CRC check and never
reaches the codec layers.  These helpers flip bits inside page payloads
and then re-seal the containing page's CRC, so the mutation is delivered
to the Vorbis packet parsers / decoder — the surface fuzzing actually
needs to reach.

Test-asset tool only; not part of the decode library.
"""

import os
import struct
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))

from parseoggvorbis_tpu.ogg.page import HEADER_SIZE, read_page  # noqa: E402
from parseoggvorbis_tpu.utils.crc import ogg_page_crc  # noqa: E402


def page_spans(data: bytes):
    """[(page_start, payload_start, page_end)] for every page."""
    spans = []
    off = 0
    while True:
        page, off2 = read_page(data, off)
        if page is None:
            break
        nseg = data[off + 26]
        spans.append((off, off + HEADER_SIZE + nseg, off2))
        off = off2
    return spans


def reseal(buf: bytearray, span) -> None:
    """Recompute and write the CRC of the page at ``span`` in place."""
    pstart, ppayload, pend = span
    nseg = buf[pstart + 26]
    hdr = bytearray(buf[pstart:pstart + HEADER_SIZE])
    hdr[22:26] = b"\x00\x00\x00\x00"
    seg = bytes(buf[pstart + HEADER_SIZE:pstart + HEADER_SIZE + nseg])
    crc = ogg_page_crc(bytes(hdr), seg, bytes(buf[ppayload:pend]))
    buf[pstart + 22:pstart + 26] = struct.pack("<I", crc)


def flip_payload_bit(data: bytes, rng, spans=None, skip_pages: int = 2) -> bytes:
    """One random payload bit flip on a random page (skipping the first
    ``skip_pages``, which carry the header packets), CRC re-sealed."""
    if spans is None:
        spans = page_spans(data)
    cand = spans[skip_pages:] or spans
    span = cand[rng.randint(len(cand))]
    mutated = bytearray(data)
    pos = rng.randint(span[1], span[2])
    mutated[pos] ^= 1 << rng.randint(0, 8)
    reseal(mutated, span)
    return bytes(mutated)

"""Re-paginate an Ogg stream, optionally forcing packets to span pages.

Produces spec-valid files (RFC 3533 framing: continued-packet flag,
granule on the page where the last packet completes, fresh CRCs) that
exercise cross-page packet reassembly — a capability the reference decoder
lacks (64 KiB cap, ParseOggVorbis.hpp:66,89).  Test-asset tool only.
"""

import struct
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))

from parseoggvorbis_tpu.ogg.page import read_page  # noqa: E402
from parseoggvorbis_tpu.utils.crc import ogg_page_crc  # noqa: E402


def demux_packets(data):
    """Single-stream file -> (serial, [(packet_bytes, granule)])."""
    packets = []
    serial = None
    offset = 0
    while True:
        page, offset = read_page(data, offset)
        if page is None:
            break
        serial = page.stream_serial_num
        for pkt, is_last in page.packets():
            packets.append([pkt, page.absolute_granule_pos if is_last else -1])
    return serial, packets


def _emit_page(out, serial, seq, granule, flags, lacings, payload):
    header = struct.pack("<4sBBqIIIB", b"OggS", 0, flags, granule, serial,
                         seq, 0, len(lacings))
    seg = bytes(lacings)
    crc = ogg_page_crc(header, seg, payload)
    header = header[:22] + struct.pack("<I", crc) + header[26:]
    out.extend(header + seg + payload)


def _lacings(length, terminated):
    full, rem = divmod(length, 255)
    lac = [255] * full
    if terminated:
        lac.append(rem)
    else:
        assert rem == 0, "unterminated run must be a multiple of 255"
    return lac


def repaginate(data, span_min_len=256, max_spans=8):
    """Rewrite a single-stream ogg so that up to ``max_spans`` packets
    longer than ``span_min_len`` each span two pages.

    Only packets > 255 bytes can span (the partial run must be whole
    255-lacings); in the golden files that includes the setup header —
    which is exactly the packet that spans pages in real-world files
    (large comment/codebook headers)."""
    serial, packets = demux_packets(data)
    out = bytearray()
    seq = 0
    spanned = 0
    for i, (pkt, granule) in enumerate(packets):
        bos = 0x02 if i == 0 else 0
        eos = 0x04 if i == len(packets) - 1 else 0
        g = granule if granule >= 0 else (0 if i < 3 else -1)
        if (i >= 2 and len(pkt) > span_min_len
                and spanned < max_spans and not eos):
            cut = 255 * max(1, (len(pkt) // 2) // 255)
            # page A: partial packet, nothing completes -> granule -1
            _emit_page(out, serial, seq, -1, bos,
                       _lacings(cut, terminated=False), pkt[:cut])
            seq += 1
            # page B: continuation completes the packet
            _emit_page(out, serial, seq, g, 0x01,
                       _lacings(len(pkt) - cut, terminated=True), pkt[cut:])
            seq += 1
            spanned += 1
        else:
            _emit_page(out, serial, seq, g, bos | eos,
                       _lacings(len(pkt), terminated=True), pkt)
            seq += 1
    assert spanned > 0, "no packet met the spanning criteria"
    return bytes(out), spanned


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    blob, n = repaginate(open(src, "rb").read())
    open(dst, "wb").write(blob)
    print("wrote %s with %d spanning packets" % (dst, n))

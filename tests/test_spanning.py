"""Page-spanning packet support (beyond-parity: the reference CHECK-fails
on any packet spanning pages and caps packets at 64 KiB,
ParseOggVorbis.hpp:66,89).

The golden files are re-paginated so that several audio packets span two
pages (valid RFC 3533 framing: continued flag, granule on the completing
page, fresh CRCs); decode must be sample-identical to the original file
through every front-end.
"""

import os
import sys

import numpy as np
import pytest

from conftest import MONO_OGG, STEREO_OGG, REPO_ROOT

sys.path.insert(0, os.path.join(REPO_ROOT, "tests", "tools"))

from repaginate import repaginate

from parseoggvorbis_tpu.runtime.batch import decode_bytes, parse_streams
from parseoggvorbis_tpu.utils.errors import ParseError


_FILES = {
    # golden files: only the setup header exceeds 255 bytes -> exactly the
    # real-world case (large codebook/comment headers spanning pages)
    "mono": (MONO_OGG, 1),
    "stereo": (STEREO_OGG, 1),
    # high-bitrate corpus file: many audio packets > 255 bytes
    "music-q8": (os.path.join(REPO_ROOT, "tests", "data", "bench",
                              "music8s.stereo.44k.q8.ogg"), 5),
}


@pytest.fixture(scope="module", params=list(_FILES))
def spanning_pair(request):
    path, min_spans = _FILES[request.param]
    if not os.path.exists(path):
        pytest.skip("bench corpus not generated")
    data = open(path, "rb").read()
    spanned, n = repaginate(data)
    assert n >= min_spans
    return data, spanned


@pytest.mark.parametrize("prefer_native", [True, False],
                         ids=["native", "python"])
def test_batch_decode_spanning(spanning_pair, prefer_native):
    original, spanned = spanning_pair
    ref = decode_bytes(original, prefer_native=prefer_native)
    got = decode_bytes(spanned, prefer_native=prefer_native)
    assert got.pcm.shape == ref.pcm.shape
    np.testing.assert_array_equal(got.pcm, ref.pcm)


def test_streaming_decoder_spanning(spanning_pair):
    """The scalar streaming path (OggReader -> parse_audio -> OLA)."""
    from parseoggvorbis_tpu.runtime.decoder import OggReader, ParseCallbacks

    original, spanned = spanning_pair
    pcms = {}
    for key, blob in (("orig", original), ("span", spanned)):
        chunks = []

        class CB(ParseCallbacks):
            def got_pcm_data(self, channel_pcms):
                chunks.append(np.array(channel_pcms))
                return True

        OggReader(CB()).full_read_from_memory(blob)
        pcms[key] = np.concatenate(chunks, axis=1)
    np.testing.assert_array_equal(pcms["orig"], pcms["span"])


@pytest.mark.parametrize("prefer_native", [True, False],
                         ids=["native", "python"])
def test_spanning_framing_errors(spanning_pair, prefer_native):
    """Continuation framing violations are rejected, not misparsed."""
    _, spanned = spanning_pair
    # strip the CONTINUED flag from every continuation page: the pending
    # tail is then orphaned -> must error
    import struct

    from parseoggvorbis_tpu.ogg.page import HEADER_SIZE, read_page
    from parseoggvorbis_tpu.utils.crc import ogg_page_crc

    broken = bytearray(spanned)
    offset = 0
    patched = False
    while True:
        page, next_offset = read_page(bytes(broken), offset)
        if page is None:
            break
        if page.is_continued and not patched:
            broken[offset + 5] = page.header_type_flag & ~0x01
            # recompute CRC
            broken[offset + 22 : offset + 26] = b"\x00\x00\x00\x00"
            hdr = bytes(broken[offset : offset + HEADER_SIZE])
            nseg = broken[offset + 26]
            seg = bytes(broken[offset + HEADER_SIZE : offset + HEADER_SIZE + nseg])
            body = bytes(broken[offset + HEADER_SIZE + nseg : next_offset])
            crc = ogg_page_crc(hdr, seg, body)
            struct.pack_into("<I", broken, offset + 22, crc)
            patched = True
        offset = next_offset
    assert patched
    with pytest.raises(ParseError):
        parse_streams(bytes(broken), prefer_native=prefer_native)


def test_native_capi_streaming_spanning(spanning_pair):
    """The reference-compatible C API path (povsc::full_read) also
    reassembles spanning packets; the full dump must equal the original
    file's (identical packets, only the pagination differs)."""
    import ctypes

    from parseoggvorbis_tpu.native.frontend import _LIB_PATH, available

    if not available():
        pytest.skip("native front-end not built")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ogg_vorbis_full_read_from_memory.restype = ctypes.c_int
    lib.ogg_vorbis_full_read_from_memory.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_char_p)]

    original, spanned = spanning_pair
    err = ctypes.c_char_p()
    for blob in (original, spanned):
        rc = lib.ogg_vorbis_full_read_from_memory(
            blob, len(blob), ctypes.byref(err))
        assert rc == 0, err.value


def test_granule_attaches_to_last_completed_packet():
    """RFC 3533: a page's granule belongs to the LAST packet completed on
    it — even when a spanning packet also completes earlier on the page
    and another packet spans onward."""
    from parseoggvorbis_tpu.ogg.page import Page, PacketAssembler

    def mkpage(flags, granule, lacings, payload):
        return Page(header_type_flag=flags, absolute_granule_pos=granule,
                    stream_serial_num=1, page_sequence_num=0,
                    segment_table=bytes(lacings), data=payload)

    a = bytes(range(256)) + b"A" * 100  # spans page1 -> page2
    b = b"B" * 50                       # completes last on page2
    c = b"C" * 300                      # spans page2 -> page3
    pages = [
        mkpage(0x02, -1, [255], a[:255]),
        mkpage(0x01, 777, [101, 50, 255], a[255:] + b + c[:255]),
        mkpage(0x05, 999, [45], c[255:]),
    ]
    asm = PacketAssembler()
    out = []
    for p in pages:
        out += asm.feed(p)
    assert out == [(a, -1), (b, 777), (c, 999)]

"""ctypes driver for the *system* libvorbis/libvorbisenc/libvorbisfile.

Used for two things, both independent of the vendored-reference oracle:

* generating the varied bench corpus (``make_bench_corpus.py``) by encoding
  synthetic audio through the real Xiph encoder, and
* decoding any ogg with the real Xiph decoder at bench time, so the
  benchmark can *measure* max-abs PCM error against libvorbis on the very
  corpus it times (instead of hardcoding a number).

No headers are required: all libvorbis objects are treated as opaque,
caller-allocated blobs (generously oversized), exactly how the public C API
uses them; only the two tiny public transport structs (ogg_packet/ogg_page)
and the leading fields of vorbis_info are declared, per the documented ABI.

Usage of the encode API follows the libvorbis public documentation
(analysis_buffer -> wrote -> blockout -> bitrate_addblock/flushpacket ->
ogg_stream pagein/out); this file is original interop code, not a port.
"""

from __future__ import annotations

import ctypes as C
import os
import tempfile
from typing import Optional, Tuple

import numpy as np

_BLOB = 1 << 16  # oversized allocation for opaque libvorbis structs


class OggPacket(C.Structure):
    _fields_ = [
        ("packet", C.POINTER(C.c_ubyte)),
        ("bytes", C.c_long),
        ("b_o_s", C.c_long),
        ("e_o_s", C.c_long),
        ("granulepos", C.c_int64),
        ("packetno", C.c_int64),
    ]


class OggPage(C.Structure):
    _fields_ = [
        ("header", C.POINTER(C.c_ubyte)),
        ("header_len", C.c_long),
        ("body", C.POINTER(C.c_ubyte)),
        ("body_len", C.c_long),
    ]


class _Libs:
    _instance: Optional["_Libs"] = None

    def __init__(self) -> None:
        mode = C.RTLD_GLOBAL
        self.ogg = C.CDLL("libogg.so.0", mode=mode)
        self.vorbis = C.CDLL("libvorbis.so.0", mode=mode)
        self.enc = C.CDLL("libvorbisenc.so.2", mode=mode)
        self.file = C.CDLL("libvorbisfile.so.3", mode=mode)

        v = self.vorbis
        v.vorbis_analysis_buffer.restype = C.POINTER(C.POINTER(C.c_float))
        self.file.ov_info.restype = C.c_void_p
        self.file.ov_pcm_total.restype = C.c_int64
        self.file.ov_read_float.restype = C.c_long

    @classmethod
    def get(cls) -> "_Libs":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance


def available() -> bool:
    try:
        _Libs.get()
        return True
    except OSError:
        return False


def _blob() -> C.Array:
    return C.create_string_buffer(_BLOB)


def encode_ogg(pcm: np.ndarray, rate: int, quality: float = 0.3,
               serial: int = 0, bitrate: Optional[int] = None) -> bytes:
    """Encode float32 PCM [channels, samples] (in [-1,1]) to an Ogg Vorbis
    stream via the system libvorbisenc: VBR at *quality* in [-0.1, 1.0],
    or managed-bitrate mode when *bitrate* (bits/s nominal) is given."""
    libs = _Libs.get()
    v, e, o = libs.vorbis, libs.enc, libs.ogg
    pcm = np.ascontiguousarray(pcm, dtype=np.float32)
    channels, total = pcm.shape

    vi, vc, vd, vb, ost = _blob(), _blob(), _blob(), _blob(), _blob()
    v.vorbis_info_init(vi)
    if bitrate is not None:
        rc = e.vorbis_encode_init(vi, C.c_long(channels), C.c_long(rate),
                                  C.c_long(-1), C.c_long(bitrate),
                                  C.c_long(-1))
    else:
        rc = e.vorbis_encode_init_vbr(vi, C.c_long(channels), C.c_long(rate),
                                      C.c_float(quality))
    if rc != 0:
        raise RuntimeError("vorbis_encode_init failed rc=%d "
                           "(channels=%d rate=%d q=%.2f br=%r)"
                           % (rc, channels, rate, quality, bitrate))
    v.vorbis_comment_init(vc)
    v.vorbis_analysis_init(vd, vi)
    v.vorbis_block_init(vd, vb)
    o.ogg_stream_init(ost, C.c_int(serial))

    out = bytearray()
    og = OggPage()
    op = OggPacket()

    def pageout(flush: bool) -> None:
        fn = o.ogg_stream_flush if flush else o.ogg_stream_pageout
        while fn(ost, C.byref(og)) != 0:
            out.extend(C.string_at(og.header, og.header_len))
            out.extend(C.string_at(og.body, og.body_len))

    hdr, hdr_comm, hdr_code = OggPacket(), OggPacket(), OggPacket()
    v.vorbis_analysis_headerout(vd, vc, C.byref(hdr), C.byref(hdr_comm),
                                C.byref(hdr_code))
    for h in (hdr, hdr_comm, hdr_code):
        o.ogg_stream_packetin(ost, C.byref(h))
    pageout(flush=True)  # audio data must start on a fresh page

    def drain() -> None:
        while v.vorbis_analysis_blockout(vd, vb) == 1:
            v.vorbis_analysis(vb, None)
            v.vorbis_bitrate_addblock(vb)
            while v.vorbis_bitrate_flushpacket(vd, C.byref(op)) == 1:
                o.ogg_stream_packetin(ost, C.byref(op))
                pageout(flush=False)

    step = 1024
    for start in range(0, total, step):
        n = min(step, total - start)
        bufpp = v.vorbis_analysis_buffer(vd, C.c_int(n))
        for ch in range(channels):
            C.memmove(bufpp[ch], pcm[ch, start:start + n].ctypes.data, 4 * n)
        v.vorbis_analysis_wrote(vd, C.c_int(n))
        drain()
    v.vorbis_analysis_wrote(vd, C.c_int(0))  # end of stream
    drain()
    pageout(flush=True)

    o.ogg_stream_clear(ost)
    v.vorbis_block_clear(vb)
    v.vorbis_dsp_clear(vd)
    v.vorbis_comment_clear(vc)
    v.vorbis_info_clear(vi)
    return bytes(out)


def decode_ogg(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode an Ogg Vorbis stream with the system libvorbisfile.

    Returns (pcm float32 [channels, samples], sample_rate)."""
    libs = _Libs.get()
    f = libs.file
    vf = _blob()
    with tempfile.NamedTemporaryFile(suffix=".ogg", delete=False) as tmp:
        tmp.write(data)
        path = tmp.name
    try:
        rc = f.ov_fopen(path.encode(), vf)
        if rc != 0:
            raise RuntimeError("ov_fopen failed rc=%d" % rc)
        vi_ptr = f.ov_info(vf, C.c_int(-1))
        # vorbis_info leading fields (documented ABI): int version;
        # int channels; long rate; ...
        channels = C.cast(vi_ptr + 4, C.POINTER(C.c_int)).contents.value
        rate = C.cast(vi_ptr + 8, C.POINTER(C.c_long)).contents.value
        total = f.ov_pcm_total(vf, C.c_int(-1))

        chunks = []
        pcmpp = C.POINTER(C.POINTER(C.c_float))()
        bitstream = C.c_int(0)
        while True:
            n = f.ov_read_float(vf, C.byref(pcmpp), C.c_int(4096),
                                C.byref(bitstream))
            if n == 0:
                break
            if n < 0:
                raise RuntimeError("ov_read_float error rc=%d" % n)
            frame = np.empty((channels, n), dtype=np.float32)
            for ch in range(channels):
                frame[ch] = np.ctypeslib.as_array(pcmpp[ch], shape=(n,))
            chunks.append(frame)
        f.ov_clear(vf)
    finally:
        os.unlink(path)
    pcm = (np.concatenate(chunks, axis=1) if chunks
           else np.zeros((channels, 0), np.float32))
    assert total < 0 or pcm.shape[1] == total, (pcm.shape, total)
    return pcm, int(rate)

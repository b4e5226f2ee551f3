"""ctypes binding for the C++ host front-end (_libpov.so).

``parse_stream_native(data)`` mirrors ``runtime.batch.parse_stream`` but runs
the bit-serial host pass (Ogg demux + Huffman/VQ + floor/residue symbol
decode) in native code.  ctypes releases the GIL during the parse call, so
corpus decode can run one native parse per thread.

Falls back (``available() == False``) when the library hasn't been built;
build it with ``python3 native/build.py``.
"""

from __future__ import annotations

import ctypes
import os
import threading
from dataclasses import dataclass
from typing import List

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_libpov.so")
_lib = None
_lib_lock = threading.Lock()


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            # Auto-build (best effort).  Disable with POV_AUTOBUILD=0 for
            # sandboxed/read-only deployments; the attempt and any failure
            # are logged once so the active front-end (native vs Python
            # fallback) is always observable.
            import logging

            log = logging.getLogger("parseoggvorbis_tpu.native")
            if os.environ.get("POV_AUTOBUILD", "1") == "0":
                log.info("native front-end not built and POV_AUTOBUILD=0; "
                         "using the pure-Python host path")
                return None
            try:
                import subprocess
                import sys

                build = os.path.join(
                    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                    "native", "build.py",
                )
                if os.path.exists(build):
                    log.info("building native front-end (%s)...", build)
                    subprocess.run(
                        [sys.executable, build], check=True,
                        capture_output=True, timeout=120,
                    )
            except Exception as exc:
                log.warning(
                    "native front-end auto-build failed (%s); using the "
                    "pure-Python host path", exc)
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pov_parse.restype = ctypes.c_void_p
        lib.pov_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.pov_free.argtypes = [ctypes.c_void_p]
        lib.pov_info.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
        lib.pov_mode_info.restype = ctypes.c_int32
        lib.pov_mode_info.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.pov_frame_meta.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
        lib.pov_export_frames.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.pov_export_flags.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.pov_export_residues.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.pov_export_env.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.pov_export_curves_full.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.pov_export_floor_ys.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.pov_export_floor_ys_flags.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.pov_num_floors.restype = ctypes.c_int32
        lib.pov_num_floors.argtypes = [ctypes.c_void_p]
        lib.pov_floor1_info.restype = ctypes.c_int32
        lib.pov_floor1_info.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.pov_mode_floor_numbers.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.pov_parse_multi.restype = ctypes.c_int32
        lib.pov_parse_multi.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_char_p, ctypes.c_size_t,
        ]
        if hasattr(lib, "pov_parse_multi_opts"):  # stale-build tolerant
            lib.pov_parse_multi_opts.restype = ctypes.c_int32
            lib.pov_parse_multi_opts.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_char_p,
                ctypes.c_size_t,
            ]
            lib.pov_is_floors_only.restype = ctypes.c_int32
            lib.pov_is_floors_only.argtypes = [ctypes.c_void_p]
        lib.pov_inc_open.restype = ctypes.c_void_p
        lib.pov_inc_open.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.pov_inc_next.restype = ctypes.c_int64
        lib.pov_inc_next.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.pov_inc_view.restype = ctypes.c_void_p
        lib.pov_inc_view.argtypes = [ctypes.c_void_p]
        lib.pov_inc_free.argtypes = [ctypes.c_void_p]
        lib.pov_factorize_f32.restype = ctypes.c_int64
        lib.pov_factorize_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p,
        ]
        try:  # absent from pre-r4 builds; crc32() then returns None
            lib.pov_crc32.restype = ctypes.c_uint32
            lib.pov_crc32.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_uint32,
            ]
        except AttributeError:
            pass
        try:  # direct PCM consumer API (decode_corpus route="native")
            lib.pov_decode_pcm.restype = ctypes.c_void_p
            lib.pov_decode_pcm.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
                ctypes.c_size_t,
            ]
            lib.pov_pcm_num_streams.restype = ctypes.c_int32
            lib.pov_pcm_num_streams.argtypes = [ctypes.c_void_p]
            lib.pov_pcm_info.argtypes = [
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.pov_pcm_get.argtypes = [
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
            ]
            lib.pov_pcm_free.argtypes = [ctypes.c_void_p]
        except AttributeError:
            pass
        try:  # i16 copy-out (r5); older builds fall back to numpy convert
            lib.pov_pcm_get_i16.argtypes = [
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
            ]
        except AttributeError:
            pass
        try:  # single-stream decode-into-caller-buffer fast path (r5)
            lib.pov_decode_pcm_into.restype = ctypes.c_int64
            lib.pov_decode_pcm_into.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_int64,
                ctypes.c_char_p, ctypes.c_size_t,
            ]
        except AttributeError:
            pass
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_pcm_native(data, out_i16: bool = False):
    """Full native (C++) host decode straight to PCM arrays.

    Returns ``[(pcm [C, N], sample_rate), ...]`` — one entry per logical
    stream in BOS order — or None when the native library (or the symbol,
    on stale builds) is unavailable.  PCM dtype is float32, or int16 with
    ``out_i16=True`` (the framework's pcm_f32_to_i16 contract, converted
    during the C copy-out when the build has pov_pcm_get_i16 — halves the
    copy-out write traffic on the one fully host-bound route — else via
    numpy).  Raises ParseError on malformed input (strict contract, same
    as the reference decoder: ogg_vorbis_full_read at
    ParseOggVorbis.hpp:1488, which only dumps taps; this surface hands
    the PCM back).  The scalar pipeline is the same one the dump path
    runs — O(n log n) FFT IMDCT, measured faster than the reference
    binary head-to-head (ROUND4.md §12)."""
    import numpy as np

    from ..utils.errors import ParseError

    lib = _load()
    if lib is None or not hasattr(lib, "pov_decode_pcm"):
        return None
    native_i16 = out_i16 and hasattr(lib, "pov_pcm_get_i16")
    data = bytes(data)
    err = ctypes.create_string_buffer(256)

    # Single-stream fast path: size the output from a pure page scan
    # (id header + final granule) and let the C decoder write PCM
    # straight into it — no sink growth, no copy-out pass.  Anything the
    # fast path cannot serve exactly (multi-stream/chained blob, scan vs
    # decode disagreement, truncated stream) falls through to the
    # general handle API below, which defines the behavior.
    if hasattr(lib, "pov_decode_pcm_into"):
        from ..runtime.batch import _scan_blob_meta

        try:
            _secs, samples, ch, rate, n_bos = _scan_blob_meta(data)
            # chained/multiplexed blobs (>1 BOS page) need the general
            # path — attempting them here would decode the first chain
            # link only to discard it at the second BOS.  A lying
            # granule must not become a huge allocation either (the
            # decoder's own strict granule check, not an alloc, defines
            # the failure): same 64-samples-per-byte plausibility cap
            # the C side's sink reservation uses (~14x the thinnest
            # real Vorbis stream)
            if n_bos > 1 or samples * ch > len(data) * 64:
                samples = 0
        except ValueError:
            samples = 0
        if samples > 0:
            pcm = np.empty((ch, samples),
                           dtype=np.int16 if out_i16 else np.float32)
            got = lib.pov_decode_pcm_into(
                data, len(data), 1 if out_i16 else 0,
                pcm.ctypes.data_as(ctypes.c_void_p), ch, samples, err, 256)
            if got == samples:
                return [(pcm, rate)]
            msg = err.value.decode("utf-8", "replace")
            if got < 0 and not msg.startswith("pov-into:"):
                raise ParseError(msg or "native decode failed")
            # else: blob needs the general path (chained/truncated)
    h = lib.pov_decode_pcm(data, len(data), err, 256)
    if not h:
        raise ParseError(err.value.decode("utf-8", "replace")
                         or "native decode failed")
    try:
        out = []
        for s in range(lib.pov_pcm_num_streams(h)):
            c = ctypes.c_int32()
            n = ctypes.c_int64()
            rate = ctypes.c_int32()
            lib.pov_pcm_info(h, s, ctypes.byref(c), ctypes.byref(n),
                             ctypes.byref(rate))
            pcm = np.empty((c.value, n.value),
                           dtype=np.int16 if native_i16 else np.float32)
            if pcm.size:
                getter = (lib.pov_pcm_get_i16 if native_i16
                          else lib.pov_pcm_get)
                getter(h, s, pcm.ctypes.data_as(ctypes.c_void_p))
            if out_i16 and not native_i16:  # stale build: numpy fallback
                from ..runtime.batch import pcm_f32_to_i16

                pcm = pcm_f32_to_i16(pcm)
            out.append((pcm, rate.value))
        return out
    finally:
        lib.pov_pcm_free(h)


def crc32(data, crc: int = 0):
    """Ogg CRC-32 over ``data`` chained from ``crc`` (C++ table loop;
    ~100x the pure-Python utils/crc.py, which stays the canonical
    reference).  None when the native library (or symbol) is absent."""
    lib = _load()
    if lib is None or not hasattr(lib, "pov_crc32"):
        return None
    data = bytes(data)
    return int(lib.pov_crc32(data, len(data), crc))


#: sentinel returned by :func:`factorize_f32` when the distinct-value count
#: exceeds the cap (vs ``None`` for "native library unavailable")
OVERFLOW = "overflow"


def factorize_f32(arr: np.ndarray, cap: int):
    """Native lossless factorization (sorted uniques + per-element ranks).

    Returns ``(uniq float32 [nu], codes uint16 shaped like arr)``, the
    :data:`OVERFLOW` sentinel when ``arr`` has more than ``cap`` distinct
    values, or ``None`` when the native library is unavailable.  Matches
    ``u = np.unique(arr); c = np.searchsorted(u, arr)`` in O(n) (modulo the
    sign bit of a zero representative — both paths keep a single zero).
    ``cap`` must be <= 65536 (codes are uint16).
    """
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(arr, dtype=np.float32).reshape(-1)
    uniq = np.empty(cap, dtype=np.float32)
    codes = np.empty(flat.shape, dtype=np.uint16)
    nu = lib.pov_factorize_f32(flat.ctypes.data, flat.size,
                               uniq.ctypes.data, cap, codes.ctypes.data)
    if nu < 0:
        return OVERFLOW
    return uniq[:nu].copy(), codes.reshape(arr.shape)


@dataclass
class NativeParsed:
    """Native front-end product: frame metadata + bulk tensor exporters."""

    sample_rate: int
    channels: int
    blocksize0: int
    blocksize1: int
    mode_idx: np.ndarray  # [T] i32
    win_sel: np.ndarray  # [T] i32
    frame_n: np.ndarray  # [T] i32
    granules: np.ndarray  # [T] i64
    mode_block_flag: List[bool]
    mode_couplings: List[tuple]
    _handle: int = 0
    # False: the handle is a borrowed view (incremental window) — never free
    _owned: bool = True
    # True: parsed with floors_only=True — final_ys/flags/metadata only;
    # the curve/residue/env exporters raise (the native side discarded
    # those tensors to halve the parse cost of the pure floor kinds)
    floors_only: bool = False

    def _need_full(self, what: str) -> None:
        if self.floors_only:
            raise RuntimeError(
                "%s unavailable: stream was parsed with floors_only=True "
                "(re-parse without it for curves/residues/envelopes)" % what)

    def export_frames(self, frame_ids: np.ndarray, n: int):
        """Bulk-export tensors for frames (all sharing blocksize n).

        Returns (curve u8 [B,C,half], decoded bool [B,C], used bool [B,C],
        residue f32 [B,C,half]).
        """
        self._need_full("export_frames")
        lib = _load()
        b = len(frame_ids)
        c = self.channels
        half = n // 2
        ids = np.ascontiguousarray(frame_ids, dtype=np.int64)
        curve = np.empty((b, c, half), dtype=np.uint8)
        decoded = np.empty((b, c), dtype=np.uint8)
        used = np.empty((b, c), dtype=np.uint8)
        residue = np.empty((b, c, half), dtype=np.float32)
        lib.pov_export_frames(
            self._handle,
            ids.ctypes.data, b,
            curve.ctypes.data, decoded.ctypes.data, used.ctypes.data,
            residue.ctypes.data,
        )
        return curve, decoded.astype(bool), used.astype(bool), residue

    def export_flags(self, frame_ids: np.ndarray):
        """Floor decode flags only: (decoded, used) bool [B, C] each."""
        lib = _load()
        ids = np.ascontiguousarray(frame_ids, dtype=np.int64)
        decoded = np.empty((len(ids), self.channels), dtype=np.uint8)
        used = np.empty((len(ids), self.channels), dtype=np.uint8)
        lib.pov_export_flags(self._handle, ids.ctypes.data, len(ids),
                             decoded.ctypes.data, used.ctypes.data)
        return decoded.astype(bool), used.astype(bool)

    def export_residues(self, frame_ids: np.ndarray, n: int,
                        ch0: int = 0, ch1: int = 0) -> np.ndarray:
        """Residue spectra [B, ch1-ch0, n/2] f32 for channels [ch0, ch1)."""
        self._need_full("export_residues")
        lib = _load()
        if ch1 <= 0:
            ch1 = self.channels
        ids = np.ascontiguousarray(frame_ids, dtype=np.int64)
        out = np.empty((len(ids), ch1 - ch0, n // 2), dtype=np.float32)
        lib.pov_export_residues(self._handle, ids.ctypes.data, len(ids),
                                ch0, ch1, out.ctypes.data)
        return out

    def export_env(self, frame_ids: np.ndarray, n: int) -> np.ndarray:
        """Float32 envelopes [B, C, n/2] (floor0/LSP modes; floor1
        channels get their inverse-dB envelope)."""
        self._need_full("export_env")
        lib = _load()
        ids = np.ascontiguousarray(frame_ids, dtype=np.int64)
        env = np.empty((len(ids), self.channels, n // 2), dtype=np.float32)
        lib.pov_export_env(self._handle, ids.ctypes.data, len(ids),
                           env.ctypes.data)
        return env

    def export_curves_full(self, frame_ids: np.ndarray, n: int) -> np.ndarray:
        """Full-window integer floor curves [B, C, n] u8 (feature path)."""
        self._need_full("export_curves_full")
        lib = _load()
        ids = np.ascontiguousarray(frame_ids, dtype=np.int64)
        curve = np.empty((len(ids), self.channels, n), dtype=np.uint8)
        lib.pov_export_curves_full(self._handle, ids.ctypes.data, len(ids),
                                   curve.ctypes.data)
        return curve

    def export_floor_ys(self, frame_ids: np.ndarray, total_pts: int) -> np.ndarray:
        """Concatenated per-channel final_ys [B, total_pts] u8."""
        lib = _load()
        ids = np.ascontiguousarray(frame_ids, dtype=np.int64)
        ys = np.zeros((len(ids), total_pts), dtype=np.uint8)
        if total_pts:
            lib.pov_export_floor_ys(self._handle, ids.ctypes.data, len(ids),
                                    ys.ctypes.data, total_pts)
        return ys

    def export_floor_ys_flags(self, frame_ids: np.ndarray, total_pts: int):
        """(final_ys, step2_flags) [B, total_pts] u8 each (device floor path)."""
        lib = _load()
        ids = np.ascontiguousarray(frame_ids, dtype=np.int64)
        ys = np.zeros((len(ids), total_pts), dtype=np.uint8)
        flags = np.zeros((len(ids), total_pts), dtype=np.uint8)
        if total_pts:
            lib.pov_export_floor_ys_flags(
                self._handle, ids.ctypes.data, len(ids), ys.ctypes.data,
                flags.ctypes.data, total_pts,
            )
        return ys, flags

    def floor1_info(self):
        """Per floor: (multiplier, xs array) or None for floor0 slots."""
        lib = _load()
        out = []
        for fi in range(lib.pov_num_floors(self._handle)):
            mult = ctypes.c_int32()
            xs = np.empty(256, dtype=np.uint32)
            npts = lib.pov_floor1_info(self._handle, fi, ctypes.byref(mult),
                                       xs.ctypes.data, 256)
            out.append((int(mult.value), xs[:npts].copy()) if npts else None)
        return out

    def mode_floor_numbers(self, mode_idx: int) -> np.ndarray:
        lib = _load()
        floors = np.empty(self.channels, dtype=np.int32)
        lib.pov_mode_floor_numbers(self._handle, mode_idx, floors.ctypes.data)
        return floors

    def close(self) -> None:
        if self._handle and self._owned:
            _load().pov_free(self._handle)
        self._handle = 0

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def parse_streams_native(data: bytes,
                         floors_only: bool = False) -> List[NativeParsed]:
    """Parse an in-memory Ogg file natively with full stream demux.

    Chained/multiplexed files return one NativeParsed per logical stream,
    in BOS order (reference semantics: ParseOggVorbis.hpp:1433-1484).

    ``floors_only=True`` halves the parse cost for consumers that need
    only floor final_ys/flags + frame metadata (the pure floor feature
    kinds): residue symbols are decoded (the bit position demands it) but
    their spectra discarded, and the floor curve render is skipped.  The
    curve/residue/env exporters then raise; re-parse without the flag for
    the full tensors.  Requires a current native build (older libraries
    fall back to a full parse).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native front-end not built (run native/build.py)")
    err = ctypes.create_string_buffer(512)
    use_opts = floors_only and hasattr(lib, "pov_parse_multi_opts")
    max_streams = 64
    while True:
        handles = (ctypes.c_void_p * max_streams)()
        if use_opts:
            count = lib.pov_parse_multi_opts(data, len(data), 1, handles,
                                             max_streams, err, len(err))
        else:
            count = lib.pov_parse_multi(data, len(data), handles,
                                        max_streams, err, len(err))
        if count < 0:
            from ..utils.errors import ParseError

            raise ParseError(err.value.decode("utf8", errors="replace"))
        if count <= max_streams:
            out = [_from_handle(lib, handles[i]) for i in range(count)]
            if use_opts:
                for p in out:
                    p.floors_only = True
            return out
        # More logical streams than the buffer held: free what was filled
        # and re-parse with an exactly-sized buffer (keeps the native and
        # pure-Python front-ends agreeing on arbitrarily chained files).
        for i in range(max_streams):
            lib.pov_free(handles[i])
        max_streams = count


def parse_stream_native(data: bytes,
                        floors_only: bool = False) -> NativeParsed:
    """Parse an in-memory Ogg Vorbis file natively (first logical stream)."""
    return parse_streams_native(data, floors_only=floors_only)[0]


class NativeIncremental:
    """Bounded-memory incremental parse of the first Vorbis stream.

    ``next_window(max_frames)`` parses up to ``max_frames`` fresh frames
    and returns a NativeParsed *view* over them (prefixed with one context
    frame after the first window, whose emission belongs to the previous
    window), or None at end of stream.  Host memory stays O(window)
    regardless of stream length; the view is invalidated by the next call.
    """

    def __init__(self, data: bytes) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native front-end not built")
        self._data = data  # keep alive: the parser reads it zero-copy
        err = ctypes.create_string_buffer(512)
        self._handle = lib.pov_inc_open(data, len(data), err, len(err))
        if not self._handle:
            from ..utils.errors import ParseError

            raise ParseError(err.value.decode("utf8", errors="replace"))
        self._first = True

    def next_window(self, max_frames: int):
        lib = _load()
        err = ctypes.create_string_buffer(512)
        count = lib.pov_inc_next(self._handle, max_frames, err, len(err))
        if count < 0:
            from ..utils.errors import ParseError

            raise ParseError(err.value.decode("utf8", errors="replace"))
        if count == 0:
            return None, False
        view = _from_handle(lib, lib.pov_inc_view(self._handle))
        view._owned = False
        has_context = not self._first
        self._first = False
        return view, has_context

    def close(self) -> None:
        if self._handle:
            _load().pov_inc_free(self._handle)
            self._handle = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def _from_handle(lib, handle) -> NativeParsed:
    sr = ctypes.c_uint32()
    ch = ctypes.c_int32()
    bs0 = ctypes.c_int32()
    bs1 = ctypes.c_int32()
    nframes = ctypes.c_int64()
    nmodes = ctypes.c_int32()
    lib.pov_info(handle, ctypes.byref(sr), ctypes.byref(ch), ctypes.byref(bs0),
                 ctypes.byref(bs1), ctypes.byref(nframes), ctypes.byref(nmodes))

    t = nframes.value
    mode_idx = np.empty(t, dtype=np.int32)
    win_sel = np.empty(t, dtype=np.int32)
    frame_n = np.empty(t, dtype=np.int32)
    granules = np.empty(t, dtype=np.int64)
    if t:
        lib.pov_frame_meta(handle, mode_idx.ctypes.data, win_sel.ctypes.data,
                           frame_n.ctypes.data, granules.ctypes.data)

    block_flags: List[bool] = []
    couplings: List[tuple] = []
    for m in range(nmodes.value):
        bf = ctypes.c_int32()
        # coupling_steps is read_bits(8)+1 (spec 4.3.9.?: <=256); a smaller
        # buffer would silently DROP coupling steps and corrupt the decode
        buf = np.empty(2 * 256, dtype=np.int32)
        cnt = lib.pov_mode_info(handle, m, ctypes.byref(bf), buf.ctypes.data,
                                256)
        block_flags.append(bool(bf.value))
        if cnt > 256:  # impossible for a spec-valid stream; never truncate
            raise RuntimeError("coupling count %d exceeds spec bound" % cnt)
        couplings.append(tuple(
            (int(buf[2 * i]), int(buf[2 * i + 1])) for i in range(cnt)
        ))

    return NativeParsed(
        sample_rate=sr.value,
        channels=ch.value,
        blocksize0=bs0.value,
        blocksize1=bs1.value,
        mode_idx=mode_idx,
        win_sel=win_sel,
        frame_n=frame_n,
        granules=granules,
        mode_block_flag=block_flags,
        mode_couplings=couplings,
        _handle=handle,
    )

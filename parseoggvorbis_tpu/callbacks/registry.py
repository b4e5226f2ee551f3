"""Debug tap registry: named, typed, per-channel observability taps.

This is the observability spine of the framework (the reference's
Callbacks.{h,cpp}): every decode stage pushes its intermediate data through
``push_data``; sinks are null (default), short-stdout, or the binary dump
file format.  A name filter keeps dumping cheap when only some taps matter.

Thread model matches the reference contract (Callbacks.h:16-21): decoders may
run in parallel threads, registration is locked, each decoder instance is
driven from a single thread; pending sink/filter settings are thread-local
and consumed by the next ``register_decoder`` in the same thread.

The C ABI shim for external (e.g. cffi) consumers lives in the native
front-end; within Python this object API is used directly.
"""

from __future__ import annotations

import sys
import threading
from typing import Dict, Iterable, Optional, Set

import numpy as np

from .format import ID_BY_KIND, MAGIC, pack_record, pack_typed

_KIND_BY_DTYPE = {
    np.dtype("float32"): "f32",
    np.dtype("int32"): "i32",
    np.dtype("uint32"): "u32",
    np.dtype("uint8"): "u8",
    np.dtype("bool"): "bool",
    np.dtype("int64"): "i64",
    np.dtype("uint64"): "u64",
}


class _PendingConfig(threading.local):
    def __init__(self) -> None:
        self.output: Optional[str] = None  # None | "stdout" | path
        self.filter: Optional[Set[str]] = None


_pending = _PendingConfig()
_lock = threading.Lock()
_decoders: Dict[int, "DecoderTaps"] = {}
_alias_map: Dict[int, int] = {}
_unique_idx = 1


class DecoderTaps:
    """Per-decoder tap sink, created by :func:`register_decoder`."""

    def __init__(self, idx: int, name: str, sample_rate: int, num_channels: int,
                 output, name_filter: Optional[Set[str]]) -> None:
        self.idx = idx
        self.name = name
        self.sample_rate = sample_rate
        self.num_channels = num_channels
        self.name_filter = name_filter
        self._file = None
        self._owns_file = False
        self._stdout = False
        if output == "stdout":
            self._stdout = True
        elif output is not None:
            if isinstance(output, str):
                self._file = open(output, "wb")
                self._owns_file = True
            else:  # file-like object (e.g. BytesIO) — caller keeps ownership
                self._file = output
            self._file.write(pack_record(MAGIC))
            self._write_typed("decoder-name", "u8", name.encode("utf8"))
            self._write_typed("decoder-sample-rate", "u32",
                              np.array([sample_rate], dtype="<u4").tobytes())
            self._write_typed("decoder-num-channels", "u8", bytes([num_channels]))

    @property
    def enabled(self) -> bool:
        return self._file is not None or self._stdout

    def _write_typed(self, key: str, kind: str, payload: bytes) -> None:
        self._file.write(pack_typed(key, ID_BY_KIND[kind], payload))

    def push(self, name: str, channel: int, data, kind: Optional[str] = None) -> None:
        """Record a tap.  *channel* -1 means 'not applicable'.

        *data* may be None (marker taps), a numpy array, or a sequence; *kind*
        overrides the inferred element type (e.g. "u8" markers).
        """
        if not self.enabled:
            return
        if self.name_filter is not None and name not in self.name_filter:
            return
        if data is None:
            arr = np.zeros(0, dtype=np.uint8)
            kind = kind or "u8"
        else:
            arr = np.asarray(data)
            if kind is None:
                kind = _KIND_BY_DTYPE[arr.dtype]
        if self._stdout:
            self._push_stdout(name, channel, arr, kind, data is None)
        if self._file is not None:
            if kind == "bool":
                payload = arr.astype("<u1").tobytes()
            else:
                payload = arr.astype(_np_dtype_for(kind)).tobytes()
            self._write_typed("entry-name", "u8", name.encode("utf8"))
            if channel >= 0:
                self._write_typed("entry-channel", "u8", bytes([channel]))
            self._write_typed("entry-data", kind, payload)

    def _push_stdout(self, name: str, channel: int, arr: np.ndarray, kind: str,
                     is_null: bool) -> None:
        out = ["decoder=%d '%s' name='%s' channel=%d" % (self.idx, self.name, name, channel)]
        if is_null:
            out.append(" data=NULL")
        else:
            vals = arr.reshape(-1)
            shown = " ".join(_fmt_val(v, kind) for v in vals[:10])
            if len(vals) > 10:
                shown += " ..."
            out.append(" data=%s{%s} len=%d" % (kind, shown, len(vals)))
        sys.stdout.write("".join(out) + "\n")

    def close(self) -> None:
        if self._file is not None:
            if self._owns_file:
                self._file.close()
            self._file = None


def _np_dtype_for(kind: str):
    return {
        "f32": "<f4", "i32": "<i4", "u32": "<u4", "u8": "<u1",
        "bool": "<u1", "i64": "<i8", "u64": "<u8",
    }[kind]


def _fmt_val(v, kind: str) -> str:
    if kind == "f32":
        return repr(float(v))
    return str(int(v))


# -- module-level API mirroring the reference C ABI -----------------------

def set_data_output_null() -> None:
    _pending.output = None


def set_data_output_short_stdout() -> None:
    _pending.output = "stdout"


def set_data_output_file(path: str) -> None:
    _pending.output = path


def set_data_output_fileobj(fileobj) -> None:
    """Route the next registered decoder's dump into a file-like object."""
    _pending.output = fileobj


def set_data_filter(names: Optional[Iterable[str]]) -> None:
    _pending.filter = set(names) if names is not None else None


def register_decoder(ref: object, name: str, sample_rate: int, num_channels: int) -> DecoderTaps:
    global _unique_idx
    with _lock:
        idx = _unique_idx
        _unique_idx += 1
        taps = DecoderTaps(
            idx, name, sample_rate, num_channels, _pending.output, _pending.filter
        )
        _decoders[id(ref)] = taps
    # consumed; reset thread-local pending config
    _pending.output = None
    _pending.filter = None
    return taps


def register_decoder_alias(orig_ref: object, alias_ref: object) -> None:
    with _lock:
        _alias_map[id(alias_ref)] = id(orig_ref)


def unregister_decoder(ref: object) -> None:
    with _lock:
        key = _alias_map.get(id(ref), id(ref))
        taps = _decoders.pop(key, None)
        _alias_map.pop(id(ref), None)
    if taps is not None:
        taps.close()


def get_decoder(ref: object) -> Optional[DecoderTaps]:
    with _lock:
        key = _alias_map.get(id(ref), id(ref))
        return _decoders.get(key)

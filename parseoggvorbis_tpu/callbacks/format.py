"""The debug-dump binary wire format (shared by writer and reader).

Format (must stay byte-compatible with the reference so the unmodified
``tests/compare-debug-out.py`` and the patched libvorbis oracle interoperate;
reference writer: /root/reference/src/Callbacks.cpp:146-199):

* stream = sequence of records; record = ``uint32 len`` + ``len`` bytes.
* file header: raw record ``b"ParseOggVorbis-header-v1"``, then entries
  ``decoder-name`` (u8 str), ``decoder-sample-rate`` (u32),
  ``decoder-num-channels`` (u8).
* entry = 4 records: key string, type-id (1 byte), element-size (1 byte),
  payload bytes.
* tap = entry ``entry-name`` + optional entry ``entry-channel`` (u8) +
  entry ``entry-data`` (typed payload).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"ParseOggVorbis-header-v1"

DT_FLOAT32 = 1
DT_INT32 = 2
DT_UINT32 = 3
DT_UINT8 = 4
DT_BOOL = 5
DT_INT64 = 6
DT_UINT64 = 7

DTYPE_BY_ID = {
    DT_FLOAT32: np.dtype("<f4"),
    DT_INT32: np.dtype("<i4"),
    DT_UINT32: np.dtype("<u4"),
    DT_UINT8: np.dtype("<u1"),
    DT_BOOL: np.dtype("<u1"),
    DT_INT64: np.dtype("<i8"),
    DT_UINT64: np.dtype("<u8"),
}

ID_BY_KIND = {
    "f32": DT_FLOAT32,
    "i32": DT_INT32,
    "u32": DT_UINT32,
    "u8": DT_UINT8,
    "bool": DT_BOOL,
    "i64": DT_INT64,
    "u64": DT_UINT64,
}

_LEN = struct.Struct("<I")


def pack_record(payload: bytes) -> bytes:
    return _LEN.pack(len(payload)) + payload


def pack_typed(key: str, type_id: int, payload: bytes) -> bytes:
    elem_size = DTYPE_BY_ID[type_id].itemsize
    return (
        pack_record(key.encode("utf8"))
        + pack_record(bytes([type_id]))
        + pack_record(bytes([elem_size]))
        + pack_record(payload)
    )

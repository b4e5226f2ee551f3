"""Parser for the debug-dump stream (``CallbacksOutputReader`` equivalent).

Reads the byte format documented in :mod:`.format`; API mirrors the
reference's Python reader (demo_live_extract.py:136-248) so downstream
feature extraction can consume either implementation's dumps.
"""

from __future__ import annotations

import io
import struct
from typing import BinaryIO, Iterator, Optional, Tuple, Union

import numpy as np

from .format import DTYPE_BY_ID, MAGIC


class DumpReader:
    """Sequential reader over a debug-dump stream."""

    def __init__(self, file: Union[BinaryIO, bytes, str]) -> None:
        if isinstance(file, (bytes, bytearray)):
            file = io.BytesIO(file)
        elif isinstance(file, str):
            file = open(file, "rb")
        self.file = file
        magic = self.raw_read()
        if magic != MAGIC:
            raise ValueError("bad dump magic: %r" % magic[:32])
        self.decoder_name = self.read_str_expect_key("decoder-name")
        self.decoder_sample_rate = self.read_single_int_expect_key("decoder-sample-rate")
        self.decoder_num_channels = self.read_single_int_expect_key("decoder-num-channels")

    def raw_read(self, expect_size: Optional[int] = None) -> bytes:
        raw_size = self.file.read(4)
        if len(raw_size) == 0:
            raise EOFError
        (size,) = struct.unpack("<I", raw_size)
        if expect_size is not None and size != expect_size:
            raise ValueError("record size %d != expected %d" % (size, expect_size))
        data = self.file.read(size)
        if len(data) != size:
            raise ValueError("truncated record")
        return data

    def read(self, as_bytes: bool = False, as_str: bool = False):
        key = self.raw_read().decode("utf8")
        (type_id,) = self.raw_read(expect_size=1)
        (elem_size,) = self.raw_read(expect_size=1)
        raw = self.raw_read()
        dtype = DTYPE_BY_ID[type_id]
        if dtype.itemsize != elem_size:
            raise ValueError("element size mismatch")
        if type_id == 4:  # uint8
            if as_bytes:
                return key, raw
            if as_str:
                return key, raw.decode("utf8")
        return key, np.frombuffer(raw, dtype=dtype)

    def read_str_expect_key(self, expected: str) -> str:
        key, value = self.read(as_str=True)
        if key != expected:
            raise ValueError("expected key %r, got %r" % (expected, key))
        return value

    def read_single_int_expect_key(self, expected: str) -> int:
        key, value = self.read()
        if key != expected or len(value) != 1:
            raise ValueError("expected single-int key %r" % expected)
        return int(value[0])

    def read_entry(self) -> Tuple[str, Optional[int], np.ndarray]:
        """One tap: (name, channel-or-None, data array)."""
        name = self.read_str_expect_key("entry-name")
        key, value = self.read()
        channel: Optional[int] = None
        if key == "entry-channel":
            channel = int(value[0])
            key, value = self.read()
        if key != "entry-data":
            raise ValueError("expected entry-data, got %r" % key)
        return name, channel, value

    def entries(self) -> Iterator[Tuple[str, Optional[int], np.ndarray]]:
        while True:
            try:
                yield self.read_entry()
            except EOFError:
                return

    def dump_entry(self, name: str, channel: Optional[int], data) -> None:
        """Print one tap in the reference's human-readable line format
        (demo_live_extract.py:250-260)."""
        values = np.asarray(data).tolist()
        if len(values) > 10:
            data_repr = repr(values[:10]) + "..."
        else:
            data_repr = repr(values)
        print("Decoder %r name=%r channel=%r data=%s len=%i"
              % (self.decoder_name, name, channel, data_repr, len(values)))

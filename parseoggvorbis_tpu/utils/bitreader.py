"""LSb-first bit unpacking over in-memory buffers.

Semantics follow the Vorbis I spec transport layer (and the reference's
``BitReader``, /root/reference/src/Utils.hpp:330-424): within a byte the least
significant bit comes first, bytes are consumed in order (little endian).

Reading past the end of the buffer is not an error: missing bits read as 0 and
the ``reached_end`` flag is set (the Vorbis setup parser relies on this to
detect the end-of-packet condition).

This is the pure-Python host front-end implementation; the optimized C++
front-end in ``native/`` implements the same contract for production decode.
"""

from __future__ import annotations


class BitReader:
    """Pull-based LSb-first bit reader over a ``bytes``-like buffer."""

    __slots__ = ("_buf", "_nbytes", "_bitpos", "reached_end")

    def __init__(self, data) -> None:
        self._buf = bytes(data)
        self._nbytes = len(self._buf)
        self._bitpos = 0
        self.reached_end = False

    def read_bits(self, num: int) -> int:
        """Read *num* bits, LSb-first. Bits past the end read as zero."""
        if num <= 0:
            return 0
        pos = self._bitpos
        end = pos + num
        total_bits = self._nbytes * 8
        if end > total_bits:
            # Mirror the reference's end handling: whatever full/partial bits
            # remain contribute at their in-stream positions; the rest are 0
            # and the reached-end flag latches.
            self.reached_end = True
            end = total_bits
            if pos >= total_bits:
                self._bitpos = total_bits
                return 0
        first_byte = pos >> 3
        last_byte = (end + 7) >> 3
        chunk = int.from_bytes(self._buf[first_byte:last_byte], "little")
        out = (chunk >> (pos & 7)) & ((1 << (end - pos)) - 1)
        self._bitpos = pos + num if not self.reached_end else total_bits
        return out

    def peek_bits(self, num: int) -> int:
        """Read *num* bits without consuming them (bits past end read 0)."""
        pos = self._bitpos
        end = pos + num
        total_bits = self._nbytes * 8
        if pos >= total_bits:
            return 0
        if end > total_bits:
            end = total_bits
        first_byte = pos >> 3
        last_byte = (end + 7) >> 3
        chunk = int.from_bytes(self._buf[first_byte:last_byte], "little")
        return (chunk >> (pos & 7)) & ((1 << (end - pos)) - 1)

    def skip_bits(self, num: int) -> None:
        """Consume *num* bits previously inspected with :meth:`peek_bits`."""
        pos = self._bitpos + num
        total_bits = self._nbytes * 8
        if pos > total_bits:
            self.reached_end = True
            pos = total_bits
        self._bitpos = pos

    def read_bit(self) -> int:
        pos = self._bitpos
        if pos >= self._nbytes * 8:
            self.reached_end = True
            return 0
        self._bitpos = pos + 1
        return (self._buf[pos >> 3] >> (pos & 7)) & 1

    def bit_offset(self) -> int:
        """Current bit position within the current byte (0..7)."""
        return self._bitpos & 7

    @property
    def bit_position(self) -> int:
        return self._bitpos

    def reached_end_now(self) -> bool:
        return self.reached_end

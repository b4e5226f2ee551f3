"""Vorbis codebooks: canonical Huffman decode trees + VQ lookup tables.

Spec: Vorbis I section 3.2.1.  Reference behavior: /root/reference/src/
ParseOggVorbis.hpp:120-375 (parse :247-329, codeword assignment :151-191,
VQ build :212-245, scalar decode :347-360, vector decode :367-374).

Host-side design notes (TPU rebuild): scalar Huffman decode is the inherently
bit-serial inner loop of Vorbis and stays on the host.  Instead of the
reference's 1-bit-per-step tree walk we use a table-driven decoder: an
``2**K``-entry table keyed by the next K raw stream bits resolves all
codewords of length <= K in one step; longer codewords (rare) fall back to an
incremental (length, codeword) hash probe.  The VQ lookup table is
materialized once at setup as a ``[entries, dims]`` float32 matrix — on the
device side residue reconstruction becomes a gather over this matrix.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils.bitreader import BitReader
from ..utils.errors import ParseError, check
from ..utils.specmath import float32_unpack, ilog, lookup1_values

_FAST_TABLE_BITS = 10


def assign_codewords(lengths: List[Tuple[int, int]], num_entries_hint: int = 0):
    """Canonical Huffman codeword assignment with over/underspecification checks.

    *lengths* is a list of (entry_number, bit_length), in entry order; only
    used entries appear.  Returns list of (entry_number, bit_length, codeword)
    where the codeword's MSb is the first bit read from the stream.

    Semantics match the Vorbis spec 3.2.1 decision-tree construction (and the
    reference's marker algorithm, ParseOggVorbis.hpp:151-191): each entry
    takes the lowest available codeword of its length; a full binary prefix
    tree must result (underspecified otherwise), and no entry may fall under
    an already-assigned prefix (overspecified).
    """
    # marker[l] = lowest unassigned codeword of length l; codewords advance
    # like a binary counter, rippling between depths as subtrees fill.
    # All marker arithmetic is masked to 32 bits (the spec's construction is
    # defined over uint32; length-32 books rely on the wrap).
    out = []
    mask32 = 0xFFFFFFFF
    # ZERO used entries (a sparse book with every used-flag 0) is legal:
    # vorbis_book_init_decode counts n==0 and builds no tables
    # (vorbis_sharedbook.c:319-334).  Such a book can sit unused in a setup
    # header; decoding through it fails at decode time instead.
    if not lengths:
        return []
    # libvorbis' retconned spec extension (vorbis_sharedbook.c:126-130 in
    # the vendored oracle): a codebook with a SINGLE used entry is legal iff
    # that entry's length is 1 — decode sinks one bit of either value and
    # returns the entry.  Without this shield the underspecification check
    # below rejects streams the oracle decodes.
    if len(lengths) == 1:
        entry_num, length = lengths[0]
        check(length == 1, "underspecified codebook")
        return [(entry_num, 1, 0), (entry_num, 1, 1)]
    marker = [0] * 33  # index by length 1..32
    for entry_num, length in lengths:
        check(1 <= length <= 32, "codeword length out of range")
        codeword = marker[length]
        check((codeword >> length) == 0, "overspecified codebook")
        out.append((entry_num, length, codeword))
        for j in range(length, 0, -1):
            if marker[j] & 1:
                if j == 1:
                    marker[1] = (marker[1] + 1) & mask32
                else:
                    marker[j] = (marker[j - 1] << 1) & mask32
                check(marker[j] <= (1 << j) & mask32 or j == 32, "overspecified codebook")
                break
            marker[j] = (marker[j] + 1) & mask32
        for j in range(length + 1, 33):
            if (marker[j] >> 1) == codeword:
                codeword = marker[j]
                marker[j] = (marker[j - 1] << 1) & mask32
            else:
                break
    # Underspecification check: the prefix tree must be exactly full.
    for i in range(1, 32):
        check(marker[i] == (1 << i), "underspecified codebook")
    check(marker[32] == 0, "underspecified codebook")
    return out


def _reverse_bits(value: int, nbits: int) -> int:
    r = 0
    for _ in range(nbits):
        r = (r << 1) | (value & 1)
        value >>= 1
    return r


class Codebook:
    """One parsed Vorbis codebook with decode acceleration structures."""

    __slots__ = (
        "dimensions",
        "num_entries",
        "ordered",
        "sparse",
        "lookup_type",
        "minimum_value",
        "delta_value",
        "value_bits",
        "sequence_p",
        "multiplicands",
        "vq_table",
        "_fast_table",
        "_fast_bits",
        "_long_codes",
        "_max_len",
        "codewords",
    )

    def __init__(self) -> None:
        self.dimensions = 0
        self.num_entries = 0
        self.ordered = False
        self.sparse = False
        self.lookup_type = 0
        self.minimum_value = 0.0
        self.delta_value = 0.0
        self.value_bits = 0
        self.sequence_p = False
        self.multiplicands: Optional[np.ndarray] = None
        self.vq_table: Optional[np.ndarray] = None  # [num_entries, dimensions] f32
        self._fast_table: Optional[np.ndarray] = None
        self._fast_bits = 0
        self._long_codes: Dict[Tuple[int, int], int] = {}
        self._max_len = 0
        self.codewords: List[Tuple[int, int, int]] = []  # (entry, len, codeword)

    # -- parsing ---------------------------------------------------------

    @classmethod
    def parse(cls, br: BitReader) -> "Codebook":
        self = cls()
        check(br.read_bits(24) == 0x564342, "codebook sync pattern")
        self.dimensions = br.read_bits(16)
        check(self.dimensions > 0, "codebook dimensions")
        self.num_entries = br.read_bits(24)
        check(self.num_entries > 0, "codebook entries")
        self.ordered = bool(br.read_bits(1))

        lengths: List[Tuple[int, int]] = []
        if not self.ordered:
            self.sparse = bool(br.read_bits(1))
            if self.sparse:
                for i in range(self.num_entries):
                    if br.read_bits(1):
                        lengths.append((i, br.read_bits(5) + 1))
            else:
                for i in range(self.num_entries):
                    lengths.append((i, br.read_bits(5) + 1))
        else:
            cur_len = br.read_bits(5) + 1
            cur_entry = 0
            while cur_entry < self.num_entries:
                number = br.read_bits(ilog(self.num_entries - cur_entry))
                for i in range(cur_entry, cur_entry + number):
                    lengths.append((i, cur_len))
                cur_entry += number
                check(cur_entry <= self.num_entries, "ordered codebook overflow")
                cur_len += 1
            check(cur_entry == self.num_entries, "ordered codebook underflow")

        self.codewords = assign_codewords(lengths)
        self._build_decode_tables()

        # VQ lookup
        self.lookup_type = br.read_bits(4)
        check(self.lookup_type in (0, 1, 2), "invalid VQ lookup type")
        if self.lookup_type in (1, 2):
            self.minimum_value = float32_unpack(br.read_bits(32))
            self.delta_value = float32_unpack(br.read_bits(32))
            self.value_bits = br.read_bits(4) + 1
            self.sequence_p = bool(br.read_bits(1))
            if self.lookup_type == 1:
                num_lookup = lookup1_values(self.num_entries, self.dimensions)
            else:
                num_lookup = self.num_entries * self.dimensions
            mults = np.empty(num_lookup, dtype=np.int64)
            for i in range(num_lookup):
                mults[i] = br.read_bits(self.value_bits)
            self.multiplicands = mults
            self._build_vq()
        check(not br.reached_end, "codebook ran past end of packet")
        return self

    def _build_vq(self) -> None:
        """Materialize the [entries, dims] float32 VQ matrix.

        Matches the reference's double-precision accumulation with float32
        stores (ParseOggVorbis.hpp:212-245): with sequence_p, each dimension
        adds the *stored float32* of the previous dimension.
        """
        ne, nd = self.num_entries, self.dimensions
        mults = self.multiplicands.astype(np.float64)
        table = np.zeros((ne, nd), dtype=np.float32)
        if self.lookup_type == 1:
            nmul = len(self.multiplicands)
            last = np.zeros(ne, dtype=np.float64)
            index_divisor = 1
            for dim in range(nd):
                offs = (np.arange(ne) // index_divisor) % nmul
                vals = mults[offs] * self.delta_value + self.minimum_value + last
                table[:, dim] = vals.astype(np.float32)
                if self.sequence_p:
                    last = table[:, dim].astype(np.float64)
                index_divisor *= nmul
        elif self.lookup_type == 2:
            check(len(self.multiplicands) == ne * nd, "lookup2 multiplicand count")
            m = mults.reshape(ne, nd)
            last = np.zeros(ne, dtype=np.float64)
            for dim in range(nd):
                vals = m[:, dim] * self.delta_value + self.minimum_value + last
                table[:, dim] = vals.astype(np.float32)
                if self.sequence_p:
                    last = table[:, dim].astype(np.float64)
        self.vq_table = table

    def _build_decode_tables(self) -> None:
        """Build the K-bit prefix table + long-code fallback hash."""
        fb = self._fast_bits = min(
            _FAST_TABLE_BITS,
            max((length for _, length, _ in self.codewords), default=0),
        )
        size = 1 << fb
        # fast[i] packs (entry << 6) | length; -1 means "not resolvable in fb bits"
        fast = np.full(size, -1, dtype=np.int64)
        self._long_codes = {}
        self._max_len = 0
        for entry, length, codeword in self.codewords:
            self._max_len = max(self._max_len, length)
            if length <= fb:
                # Stream bits arrive LSb-first; the codeword's MSb is the
                # first stream bit, so the table index is the bit-reversed
                # codeword in the low `length` bits, any suffix above.
                base = _reverse_bits(codeword, length)
                step = 1 << length
                fast[base::step] = (entry << 6) | length
            else:
                self._long_codes[(length, codeword)] = entry
            # Also index every codeword for the incremental fallback probe.
        if self._long_codes:
            # For the fallback walk we need all (len, prefix-codeword) pairs
            # reachable below fb... the incremental probe only needs exact
            # (length, codeword) membership, which we have.
            pass
        self._fast_table = fast

    # -- decoding --------------------------------------------------------

    def decode_scalar(self, br: BitReader) -> int:
        """Decode one Huffman symbol; returns the entry number."""
        peek = br.peek_bits(self._fast_bits)
        packed = int(self._fast_table[peek])
        if packed >= 0:
            br.skip_bits(packed & 63)
            return packed >> 6
        # Fast-table miss: the codeword is longer than the table covers.
        # Re-read bit-by-bit (the peek did not consume anything) and probe the
        # exact (length, codeword) hash at each step.
        word = 0
        long_codes = self._long_codes
        for length in range(1, self._max_len + 1):
            word = (word << 1) | br.read_bit()
            if length > self._fast_bits:
                entry = long_codes.get((length, word))
                if entry is not None:
                    return entry
        raise ParseError("invalid Huffman codeword (stream desync)")

    def decode_vector_index(self, br: BitReader) -> int:
        """Decode one symbol intended as a VQ row index."""
        return self.decode_scalar(br)

    def decode_vector(self, br: BitReader) -> Optional[np.ndarray]:
        idx = self.decode_scalar(br)
        if self.lookup_type == 0 or idx >= self.num_entries:
            return None
        return self.vq_table[idx]

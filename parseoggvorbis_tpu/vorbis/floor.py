"""Vorbis floors: spectral envelope decode.

Floor 1 (spec 7.2) is the piecewise-linear envelope used by essentially all
real-world streams.  Floor 0 (LSP, spec 6.2) is fully decoded here —
BEYOND the reference, which parses the header and rejects decode
(/root/reference/src/ParseOggVorbis.hpp:377-406); validated against the
system libvorbis on synthetic floor0 streams (tests/test_floor0.py).

Decode is split for the TPU pipeline:

* :meth:`Floor1.decode_ys` — bitstream Huffman decode of the Y values (host,
  inherently serial; reference :498-517).
* :meth:`Floor1.synthesize_step1` — integer amplitude synthesis with the
  prediction/room logic (host, <= 65 points; reference :521-559).  Must be
  integer-exact: the differential test compares these values exactly.
* :meth:`Floor1.render_curve_int` — sorted segment rendering to the integer
  floor curve (closed-form Bresenham, vectorized; reference :563-584).  The
  batched device pipeline performs the same computation as a gather
  (`dsp.floor_curve`).
* The final inverse-dB lookup maps the integer curve to the float32 envelope.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ..dsp.tables import INVERSE_DB_TABLE
from ..utils.bitreader import BitReader
from ..utils.errors import ParseError, check
from ..utils.specmath import high_neighbor, ilog, low_neighbor, render_point

_RANGE_BY_MULTIPLIER = {1: 256, 2: 128, 3: 86, 4: 64}


@dataclass
class FloorClass:
    dimensions: int = 0
    subclass: int = 0
    masterbook: int = 0
    subclass_books: List[int] = field(default_factory=list)


@dataclass
class Floor0:
    """LSP floor (spec 6.2) — fully decoded, BEYOND the reference's parity.

    The reference parses the header and rejects decode
    (/root/reference/src/ParseOggVorbis.hpp:400-405); we implement the
    whole of spec 6.2.2/6.2.3, numerically matching the libvorbis float
    implementation (the oracle: vorbis_floor0.c floor0_inverse1/2 +
    vorbis_lsp.c vorbis_lsp_to_curve) — validated end-to-end against the
    system libvorbis on synthetic floor0 streams
    (tests/test_floor0.py; no mainstream encoder emits floor0).
    """

    order: int = 0
    rate: int = 0
    bark_map_size: int = 0
    amplitude_bits: int = 0
    amplitude_offset: int = 0
    books: List[int] = field(default_factory=list)

    def __post_init__(self) -> None:
        self._maps = {}

    @classmethod
    def parse(cls, br: BitReader, max_books: int) -> "Floor0":
        self = cls()
        self.order = br.read_bits(8)
        self.rate = br.read_bits(16)
        self.bark_map_size = br.read_bits(16)
        self.amplitude_bits = br.read_bits(6)
        self.amplitude_offset = br.read_bits(8)
        check(self.order >= 1 and self.rate >= 1 and self.bark_map_size >= 1,
              "floor0 header field out of range")
        num_books = br.read_bits(4) + 1
        for _ in range(num_books):
            book = br.read_bits(8)
            check(book < max_books, "floor0 book index")
            self.books.append(book)
        return self

    # -- decode (spec 6.2.2) --------------------------------------------

    def decode_coeffs(self, br: BitReader, codebooks):
        """-> (amplitude_raw, lsp coefficients f32[order]) or None (unused).

        Bitstream reads ceil(order/dim) VQ codewords; surplus dimensions of
        the final vector are discarded, and each dim-block is offset by the
        previous block's last value (oracle: floor0_inverse1).
        """
        amp = br.read_bits(self.amplitude_bits)
        if amp <= 0:
            return None
        booknum = br.read_bits(ilog(len(self.books)))
        if booknum >= len(self.books):
            # oracle tolerates ('be paranoid'): treated as an unused channel
            return None
        book = codebooks[self.books[booknum]]
        check(book.lookup_type != 0 and book.dimensions >= 1,
              "floor0 book has no VQ lookup")
        m = self.order
        dim = book.dimensions
        coeffs = np.zeros(m, dtype=np.float32)
        i = 0
        while i < m:
            vec = book.decode_vector(br)
            check(vec is not None, "floor0 coefficient vector")
            take = min(dim, m - i)
            coeffs[i : i + take] = vec[:take]
            i += take
        last = np.float32(0.0)
        j = 0
        while j < m:
            for _ in range(dim):
                if j >= m:
                    break
                coeffs[j] = np.float32(coeffs[j] + last)
                j += 1
            last = coeffs[j - 1]
        return amp, coeffs

    # -- curve synthesis (spec 6.2.3) ------------------------------------

    def bark_map(self, n_half: int) -> np.ndarray:
        """Linear-bin -> bark-bin map, float32-faithful to the oracle.

        The oracle evaluates toBARK with float32 inner products (the macro's
        f-suffixed literals) before the double atan, and scales by a float32
        constant; mirroring the rounding keeps our floor() on the same side
        at band edges (vorbis_floor0.c floor0_map_lazy_init).
        """
        key = n_half
        got = self._maps.get(key)
        if got is not None:
            return got

        def to_bark(f32):  # f32: float32 array/scalar argument
            a = np.arctan((np.float32(0.00074) * f32).astype(np.float64))
            b = np.arctan((f32 * f32 * np.float32(1.85e-8)).astype(np.float64))
            tail = (np.float32(1e-4) * f32).astype(np.float64)
            # 13.1f/2.24f are float literals promoted to double in the oracle
            return (np.float64(np.float32(13.1)) * a
                    + np.float64(np.float32(2.24)) * b + tail)

        half_rate = np.float32(self.rate / 2.0)
        scale = np.float32(self.bark_map_size
                           / to_bark(np.float32(half_rate)))
        j = np.arange(n_half, dtype=np.float32)
        f = (half_rate / np.float32(n_half)) * j  # float32 ops
        val = np.floor(to_bark(f) * np.float64(scale)).astype(np.int64)
        val = np.minimum(val, self.bark_map_size - 1)
        self._maps[key] = val
        return val

    def curve(self, amp_raw: int, coeffs: np.ndarray,
              n_half: int) -> np.ndarray:
        """float32 envelope [n_half] (oracle: vorbis_lsp_to_curve, plain-C
        variant): per bark bin k, p/q products over the LSP cosines, then
        fromdB(amp / sqrt(p + q) - amplitude_offset)."""
        m = self.order
        ln = self.bark_map_size
        maxval = (1 << self.amplitude_bits) - 1
        amp = np.float32(np.float32(amp_raw) / np.float32(maxval)
                         * np.float32(self.amplitude_offset))
        # 2*cos in double, stored float32 (oracle: lsp[i] = 2.f*cos(lsp[i]))
        lsp = (2.0 * np.cos(coeffs.astype(np.float64))).astype(np.float32)
        kmap = self.bark_map(n_half)
        wdel = np.float32(np.pi / ln)
        ks = np.arange(ln, dtype=np.int64)
        w = (2.0 * np.cos((wdel * ks.astype(np.float32)).astype(np.float64))
             ).astype(np.float32)  # [ln] per bark bin
        p = np.full(ln, np.float32(0.5), dtype=np.float32)
        q = np.full(ln, np.float32(0.5), dtype=np.float32)
        j = 1
        while j < m:
            q = np.float32(q * (w - lsp[j - 1]))
            p = np.float32(p * (w - lsp[j]))
            j += 2
        # operation ORDER matters: the oracle writes `p *= p * (4.f - w*w)`,
        # i.e. p * (p * (4-w*w)) — float32 multiplication is non-associative,
        # so (p*p)*(4-w*w) can differ by 1 ulp; keep the oracle's grouping
        if j == m:  # odd order
            q = np.float32(q * (w - lsp[j - 1]))
            p = np.float32(p * np.float32(p * (np.float32(4.0) - w * w)))
            q = np.float32(q * q)
        else:  # even order
            p = np.float32(p * np.float32(p * (np.float32(2.0) - w)))
            q = np.float32(q * np.float32(q * (np.float32(2.0) + w)))
        # fromdB(x) = exp(x * .11512925f); the argument is computed in
        # double (C promotion through sqrt), result stored float32
        expo = (np.float64(amp) / np.sqrt((p + q).astype(np.float64))
                - np.float64(self.amplitude_offset))
        env_by_k = np.exp(expo * np.float64(np.float32(0.11512925))
                          ).astype(np.float32)
        return env_by_k[kmap]


class Floor1:
    """Parsed floor-1 configuration plus decode helpers."""

    __slots__ = (
        "partition_classes",
        "classes",
        "multiplier",
        "xs",
        "xs_sorted_idx",
        "xs_sorted",
        "range",
        "_neighbors",
    )

    def __init__(self) -> None:
        self.partition_classes: List[int] = []
        self.classes: List[FloorClass] = []
        self.multiplier = 0
        self.xs: List[int] = []
        self.xs_sorted_idx: Optional[np.ndarray] = None
        self.xs_sorted: Optional[np.ndarray] = None
        self.range = 0
        self._neighbors: List[Tuple[int, int]] = []

    @classmethod
    def parse(cls, br: BitReader, num_codebooks: int) -> "Floor1":
        self = cls()
        num_partitions = br.read_bits(5)
        self.partition_classes = [br.read_bits(4) for _ in range(num_partitions)]
        max_class = max(self.partition_classes) if self.partition_classes else -1

        for _ in range(max_class + 1):
            fc = FloorClass()
            fc.dimensions = br.read_bits(3) + 1
            fc.subclass = br.read_bits(2)
            if fc.subclass > 0:
                fc.masterbook = br.read_bits(8)
                # 8-bit fields: validate against the actual codebook
                # count (crafted headers must reject cleanly, never
                # index out of range — libvorbis does the same)
                check(fc.masterbook < num_codebooks,
                      "floor1 masterbook out of range")
            fc.subclass_books = [br.read_bits(8) - 1 for _ in range(1 << fc.subclass)]
            check(all(b < num_codebooks for b in fc.subclass_books),
                  "floor1 subclass book out of range")
            self.classes.append(fc)

        self.multiplier = br.read_bits(2) + 1
        self.range = _RANGE_BY_MULTIPLIER[self.multiplier]
        rangebits = br.read_bits(4)
        self.xs = [0, 1 << rangebits]
        for class_idx in self.partition_classes:
            check(class_idx < len(self.classes), "floor1 class index")
            for _ in range(self.classes[class_idx].dimensions):
                self.xs.append(br.read_bits(rangebits))

        order = sorted(range(len(self.xs)), key=lambda i: self.xs[i])
        self.xs_sorted_idx = np.array(order, dtype=np.int64)
        self.xs_sorted = np.array([self.xs[i] for i in order], dtype=np.int64)
        # Precompute low/high neighbors per point (they depend only on xs).
        self._neighbors = [
            (low_neighbor(self.xs, i), high_neighbor(self.xs, i))
            for i in range(2, len(self.xs))
        ]
        return self

    # -- decode ----------------------------------------------------------

    def decode_ys(self, br: BitReader, codebooks) -> Optional[List[int]]:
        """Huffman-decode the packed Y values; None means 'unused channel'.

        Spec 7.2.3 / reference ParseOggVorbis.hpp:478-517.
        """
        if br.read_bits(1) == 0:
            return None
        rng = self.range
        bits = ilog(rng - 1)
        ys = [br.read_bits(bits), br.read_bits(bits)]
        for class_idx in self.partition_classes:
            cl = self.classes[class_idx]
            cbits = cl.subclass
            csub = (1 << cbits) - 1
            cval = 0
            if cbits > 0:
                cval = codebooks[cl.masterbook].decode_scalar(br)
            for _ in range(cl.dimensions):
                check((cval & csub) < len(cl.subclass_books), "floor1 subclass book")
                book = cl.subclass_books[cval & csub]
                cval >>= cbits
                ys.append(codebooks[book].decode_scalar(br) if book >= 0 else 0)
        check(len(ys) == len(self.xs), "floor1 ys count")
        return ys

    def synthesize_step1(self, ys: List[int]) -> Tuple[List[int], List[bool]]:
        """Amplitude value synthesis (spec 7.2.4 step 1), integer-exact.

        Returns (final_ys, step2_flag).  Reference ParseOggVorbis.hpp:521-559.
        """
        n = len(self.xs)
        step2_flag = [False] * n
        step2_flag[0] = step2_flag[1] = True
        final_ys = [0] * n
        final_ys[0] = ys[0]
        final_ys[1] = ys[1]
        rng = self.range
        xs = self.xs
        for i in range(2, n):
            low_idx, high_idx = self._neighbors[i - 2]
            predicted = render_point(
                xs[low_idx], final_ys[low_idx], xs[high_idx], final_ys[high_idx], xs[i]
            )
            val = ys[i]
            # both bounds: a hostile val >= room on the high_room<=low_room
            # branch drives final_ys negative, and a negative prediction
            # later would index value tables out of range (native path
            # checks identically)
            check(0 <= predicted <= rng, "floor1 predicted out of range")
            high_room = rng - predicted
            low_room = predicted
            room = min(high_room, low_room) * 2
            if val == 0:
                final_ys[i] = predicted
            else:
                step2_flag[low_idx] = True
                step2_flag[high_idx] = True
                step2_flag[i] = True
                if val >= room:
                    if high_room > low_room:
                        final_ys[i] = val - low_room + predicted
                    else:
                        final_ys[i] = predicted - val + high_room - 1
                else:
                    if val % 2 == 1:
                        final_ys[i] = predicted - (val + 1) // 2
                    else:
                        final_ys[i] = predicted + val // 2
        return final_ys, step2_flag

    def render_curve_int(self, final_ys: List[int], step2_flag: List[bool], n_half: int) -> np.ndarray:
        """Curve synthesis (spec 7.2.4 step 2): integer floor curve of n_half bins.

        Uses the closed-form line renderer: for each segment between
        consecutive step2-flagged sorted points, y(x) = y0 + sign*(k*|dy|)//dx.
        Reference ParseOggVorbis.hpp:563-584.
        """
        idxs = self.xs_sorted_idx
        fys = np.asarray(final_ys, dtype=np.int64)[idxs]
        flags = np.asarray(step2_flag, dtype=bool)[idxs]
        mult = self.multiplier

        floor = np.zeros(n_half, dtype=np.int64)
        lx = 0
        ly = int(fys[0]) * mult
        hx = 0
        hy = 0
        xs_sorted = self.xs_sorted
        for i in range(1, len(fys)):
            if not flags[i]:
                continue
            hx = int(xs_sorted[i])
            hy = int(fys[i]) * mult
            _render_segment(lx, ly, hx, hy, floor)
            lx, ly = hx, hy
        if hx < n_half:
            # horizontal extension to the right edge
            floor[hx:] = hy
        return floor

    def envelope_from_curve(self, floor_int: np.ndarray) -> np.ndarray:
        """Inverse-dB lookup: integer curve -> float32 envelope."""
        check(int(floor_int.max(initial=0)) < 256, "floor curve exceeds dB table")
        return INVERSE_DB_TABLE[floor_int]


def _render_segment(x0: int, y0: int, x1: int, y1: int, vec: np.ndarray) -> None:
    n = len(vec)
    if x0 >= n:
        return
    adx = x1 - x0
    ady = abs(y1 - y0)
    sign = 1 if y1 >= y0 else -1
    stop = min(x1, n)
    ks = np.arange(stop - x0, dtype=np.int64)
    vec[x0:stop] = y0 + sign * ((ks * ady) // adx)


@dataclass
class Floor:
    floor_type: int
    floor0: Optional[Floor0] = None
    floor1: Optional[Floor1] = None

    @classmethod
    def parse(cls, br: BitReader, num_codebooks: int) -> "Floor":
        floor_type = br.read_bits(16)
        if floor_type == 0:
            return cls(floor_type=0, floor0=Floor0.parse(br, num_codebooks))
        if floor_type == 1:
            return cls(floor_type=1, floor1=Floor1.parse(br, num_codebooks))
        raise ParseError("invalid floor type %d" % floor_type)

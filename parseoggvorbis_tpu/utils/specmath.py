"""Integer-exact helper functions from the Vorbis I spec (section 9.2).

These must be *bit-exact* with the spec's integer algorithms: floor1
correctness depends on exact integer line rendering (the differential test
compares ``floor1 ys`` / ``floor1 final_ys`` with exact integer equality).

Reference behavior: /root/reference/src/Utils.hpp:47-217.  The line/point
renderers here use the closed forms of the spec's Bresenham loops — the spec
loop computes ``y(x0+k) = y0 +/- (k*|dy|)//|dx|`` exactly, which we evaluate
directly (and vectorized, see :func:`render_line_vec`) instead of stepping.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def ilog(v: int) -> int:
    """Spec 9.2.1 ilog: position of the highest set bit; ilog(0) == 0."""
    if v <= 0:
        return 0
    return v.bit_length()


def low_neighbor(vec: Sequence[int], idx: int) -> int:
    """Spec 9.2.4: index n < idx maximizing vec[n] subject to vec[n] < vec[idx]."""
    val = vec[idx]
    best_idx = -1
    best_val = None
    for n in range(idx):
        if vec[n] < val and (best_val is None or vec[n] > best_val):
            best_idx = n
            best_val = vec[n]
    return best_idx


def high_neighbor(vec: Sequence[int], idx: int) -> int:
    """Spec 9.2.5: index n < idx minimizing vec[n] subject to vec[n] > vec[idx]."""
    val = vec[idx]
    best_idx = -1
    best_val = None
    for n in range(idx):
        if vec[n] > val and (best_val is None or vec[n] < best_val):
            best_idx = n
            best_val = vec[n]
    return best_idx


def render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    """Spec 9.2.6: integer interpolation of y at x along (x0,y0)-(x1,y1)."""
    adx = x1 - x0
    ady = abs(y1 - y0)
    off = (ady * (x - x0)) // adx
    return y0 + off if y1 >= y0 else y0 - off


def render_line_into(x0: int, y0: int, x1: int, y1: int, vec) -> None:
    """Spec 9.2.7 render_line: vec[x] = interpolated y for x in [x0, x1).

    Entries outside ``len(vec)`` are skipped; ``vec`` is any mutable indexable
    (list or numpy array).  Closed form of the reference's Bresenham loop
    (Utils.hpp:143-183): after k steps y = y0 +/- (k*|dy|)//(x1-x0).
    """
    n = len(vec)
    if x0 >= n:
        return
    adx = x1 - x0
    ady = abs(y1 - y0)
    sign = 1 if y1 >= y0 else -1
    stop = min(x1, n)
    ks = np.arange(stop - x0, dtype=np.int64)
    ys = y0 + sign * ((ks * ady) // adx)
    vec[x0:stop] = ys


def render_line_vec(x0: int, y0: int, x1: int, y1: int, length: int) -> np.ndarray:
    """Vectorized render_line returning a fresh int64 array of *length*.

    Positions < x0 and >= x1 are zero.
    """
    out = np.zeros(length, dtype=np.int64)
    render_line_into(x0, y0, x1, y1, out)
    return out


def float32_unpack(v: int) -> float:
    """Spec 9.2.2: Vorbis' packed float (21-bit mantissa, 10-bit exponent).

    Matches Utils.hpp:193-203 including its exponent clamping to [-63, 63].
    """
    mant = float(v & 0x1FFFFF)
    if v & 0x80000000:
        mant = -mant
    exp = (v & 0x7FE00000) >> 21
    exp = exp - 20 - 768
    if exp > 63:
        exp = 63
    if exp < -63:
        exp = -63
    return float(np.ldexp(mant, exp))


def lookup1_values(entries: int, dimensions: int) -> int:
    """Spec 3.2.1: greatest integer v with v**dimensions <= entries."""
    v = 0
    while (v + 1) ** dimensions <= entries:
        v += 1
    return v

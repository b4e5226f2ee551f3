"""Inverse MDCT: R^(n/2) -> R^n, power-of-two n in [64, 8192].

The transform (verified against the Xiph split-radix float implementation the
reference vendors, /root/reference/src/mdct.cpp:433-527, to ~1e-6 for
n=2048):

    y[j] = sum_{k=0}^{n/2-1} X[k] * cos(pi/(2n) * (2j + 1 + n/2) * (2k + 1))

with no scale factor on the backward path (the 4/n scale is forward-only,
mdct.cpp:126).

TPU-native formulations (both numerically verified against the direct
float64 transform in tests/test_imdct_fft.py):

* a batched matmul ``[B, n/2] @ [n/2, n]`` against a precomputed cosine
  matrix — maps directly onto the MXU; the default for n <= 4096;
* an O(n log n) irfft path (:func:`imdct_via_rfft` here,
  ``runtime.jax_backend.imdct_via_rfft`` on device): the IMDCT phase
  pi/(2n)(2j+1+n/2)(2k+1) is the (2j+1+n/2)-th sample of a length-4n DFT
  whose odd harmonics 2k+1 carry X[k] — selected for n >= 8192 where the
  cosine matrix alone would occupy 128MB of HBM
  (runtime.device_decoder._FFT_IMDCT_MIN_N).

This module provides the numpy (host/reference) implementation; the JAX
device kernels live in ``runtime/jax_backend.py`` and reuse the same matrix
construction.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def imdct_matrix_f64(n: int) -> np.ndarray:
    """The [n/2, n] float64 IMDCT matrix M with y = X @ M.

    The integer phase (2j+1+n/2)(2k+1) is reduced modulo the cosine period
    4n exactly in int64 before the float multiply — more accurate than
    evaluating cos at ~1e8 radians, and an order of magnitude faster
    (large-argument range reduction in libm is slow)."""
    j = np.arange(n, dtype=np.int64)[None, :]
    k = np.arange(n // 2, dtype=np.int64)[:, None]
    # cos(m*pi/(2n)) = sin((m+n)*pi/(2n)): numpy's sin has a SIMD path that
    # its cos lacks (measured 10x), and the shift is exact in the int phase
    m = ((2 * k + 1) * (2 * j + 1 + n // 2) + n) % (4 * n)
    return np.sin(m.astype(np.float64) * (np.pi / (2 * n)))


@lru_cache(maxsize=None)
def imdct_matrix_f32(n: int) -> np.ndarray:
    return imdct_matrix_f64(n).astype(np.float32)


def imdct(spectrum: np.ndarray) -> np.ndarray:
    """IMDCT of [..., n/2] float spectra -> [..., n] float32 time frames.

    Accumulates in float64 and narrows to float32 (at least as accurate as
    the float32 split-radix reference path).
    """
    half = spectrum.shape[-1]
    n = half * 2
    m = imdct_matrix_f64(n)
    return (spectrum.astype(np.float64) @ m).astype(np.float32)


def imdct_via_rfft(spectrum: np.ndarray, n: int) -> np.ndarray:
    """O(n log n) IMDCT of [..., m<=n/2] spectra -> [..., n] (float64 FFT).

    Numpy twin of ``runtime.jax_backend.imdct_via_rfft`` (see that docstring
    for the derivation); the host-side oracle for the device FFT path.
    """
    m = n // 2
    l = 4 * n
    h = np.zeros(spectrum.shape[:-1] + (l // 2 + 1,), dtype=np.complex128)
    h[..., 1 : 2 * spectrum.shape[-1] : 2] = spectrum
    t = np.fft.irfft(h, n=l, axis=-1)
    idx = 2 * np.arange(n) + 1 + m
    return (t[..., idx] * (l / 2)).astype(np.float32)


def mdct_forward(frames: np.ndarray) -> np.ndarray:
    """Forward MDCT R^n -> R^(n/2) with the Xiph 4/n scale.

    The analysis counterpart of :func:`imdct` (the decoder never uses it;
    provided for capability parity with the reference's mdct_forward,
    mdct.cpp:529-599, which applies scale = 4/n on the forward path only).
    Satisfies mdct_forward(imdct(X) * w) ~ X-ish TDAC relations when w is a
    valid Princen-Bradley window.
    """
    n = frames.shape[-1]
    m = imdct_matrix_f64(n)  # [n/2, n]
    return (frames.astype(np.float64) @ m.T * (4.0 / n)).astype(np.float32)


def inverse_coupling(magnitude: np.ndarray, angle: np.ndarray):
    """Vorbis magnitude/angle rectangularization (spec 4.3.5), vectorized.

    Returns (new_magnitude, new_angle).  Pure adds/subtracts — exact in any
    float precision.  Reference: ParseOggVorbis.hpp:1213-1241.
    """
    m, a = magnitude, angle
    new_m = np.where(m > 0, np.where(a > 0, m, m + a), np.where(a > 0, m, m - a))
    new_a = np.where(m > 0, np.where(a > 0, m - a, m), np.where(a > 0, m + a, m))
    return new_m, new_a

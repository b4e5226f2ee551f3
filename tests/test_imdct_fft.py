"""The O(n log n) FFT IMDCT vs the float64 direct transform, n = 64..8192.

Covers the 8192 blocksize the encoder corpus can't produce (no libvorbis
mode emits it; the spec allows it and the decoder must handle it,
ParseOggVorbis.hpp:1294-1298).
"""

import numpy as np
import pytest

from parseoggvorbis_tpu.dsp.imdct import imdct_matrix_f64, imdct_via_rfft

SIZES = [64, 128, 256, 512, 1024, 2048, 4096, 8192]


def _direct_f64(x, n, cols):
    """Direct float64 IMDCT evaluated at selected output columns only
    (building the full [n/2, n] matrix for n=8192 is 33M slow scalar ops
    on this box's single throttled core; column sampling loses nothing)."""
    j = np.asarray(cols, dtype=np.int64)[None, :]
    k = np.arange(n // 2, dtype=np.int64)[:, None]
    m = ((2 * k + 1) * (2 * j + 1 + n // 2) + n) % (4 * n)
    sub = np.sin(m.astype(np.float64) * (np.pi / (2 * n)))
    return x.astype(np.float64) @ sub


def _cols(n, rng):
    if n <= 2048:
        return np.arange(n)
    return rng.choice(n, 768, replace=False)


@pytest.mark.parametrize("n", SIZES)
def test_numpy_fft_imdct_matches_f64_direct(n):
    rng = np.random.RandomState(n)
    x = rng.randn(3, n // 2)
    cols = _cols(n, rng)
    ref = _direct_f64(x, n, cols)
    got = imdct_via_rfft(x, n)[:, cols]
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 1e-6


def test_direct_f64_equals_full_matrix():
    n = 256
    rng = np.random.RandomState(0)
    x = rng.randn(2, n // 2)
    np.testing.assert_allclose(
        _direct_f64(x, n, np.arange(n)), x @ imdct_matrix_f64(n),
        rtol=0, atol=1e-12)


@pytest.mark.parametrize("n", SIZES)
def test_device_fft_imdct_matches_f64_direct(n):
    import jax.numpy as jnp

    from parseoggvorbis_tpu.runtime.jax_backend import imdct_via_rfft as dev

    rng = np.random.RandomState(n + 1)
    x = rng.randn(3, n // 2).astype(np.float32)
    cols = _cols(n, rng)
    ref = _direct_f64(x, n, cols)
    got = np.asarray(dev(jnp.asarray(x), n))[:, cols]
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-6


def test_device_fft_imdct_trimmed_spectrum():
    """The FFT path accepts residue-trimmed spectra (m < n/2 leading
    columns): missing tail coefficients are exactly zero harmonics."""
    import jax.numpy as jnp

    from parseoggvorbis_tpu.runtime.jax_backend import imdct_via_rfft as dev

    n = 2048
    rng = np.random.RandomState(7)
    x = rng.randn(2, n // 2).astype(np.float32)
    x[:, 832:] = 0.0
    full = np.asarray(dev(jnp.asarray(x), n))
    trimmed = np.asarray(dev(jnp.asarray(x[:, :832]), n))
    np.testing.assert_array_equal(full, trimmed)


def test_golden_decode_through_fft_path(stereo_ogg, monkeypatch):
    """Forcing every mode onto the FFT IMDCT must reproduce the matmul
    path's golden decode within the float32 budget."""
    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    data = open(stereo_ogg, "rb").read()
    ref = decode_bytes(data)
    monkeypatch.setattr(dd, "_FFT_IMDCT_MIN_N", 64)
    got = decode_bytes(data)
    assert got.pcm.shape == ref.pcm.shape
    assert np.abs(got.pcm - ref.pcm).max() < 1e-6


def test_mdct_forward_tdac_roundtrip():
    """mdct_forward (capability parity with the reference's mdct_forward,
    mdct.cpp:529-599) satisfies perfect reconstruction: windowed IMDCT
    frames overlap-added, re-windowed, and re-analyzed recover the middle
    frame's spectrum to f32 epsilon (Princen-Bradley TDAC)."""
    from parseoggvorbis_tpu.dsp import imdct as M
    from parseoggvorbis_tpu.vorbis.mode import make_window

    for n in (64, 256):
        w = make_window(n, n // 2, n // 2).astype(np.float64)
        rng = np.random.RandomState(0)
        X = rng.randn(3, n // 2).astype(np.float32)
        s = np.zeros(2 * n, np.float64)
        for i in range(3):
            s[i * n // 2 : i * n // 2 + n] += M.imdct(X[i]).astype(np.float64) * w
        t = s[n // 2 : 3 * n // 2]
        Xh = M.mdct_forward((t * w)[None, :].astype(np.float32))[0]
        assert np.abs(Xh - X[1]).max() < 1e-5

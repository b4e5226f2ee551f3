"""Pallas fused frame-decode kernel: exactness vs the XLA pipeline.

Runs in interpret mode on the CPU test mesh; on TPU the same kernel
compiles via Mosaic (exercised by tools/bench_kernels.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("shape", [(16, 2, 512), (8, 1, 256), (4, 6, 512)])
def test_fused_kernel_matches_xla(shape):
    from parseoggvorbis_tpu.dsp.imdct import imdct_matrix_f32
    from parseoggvorbis_tpu.dsp.pallas_kernels import fused_frame_decode
    from parseoggvorbis_tpu.dsp.tables import INVERSE_DB_TABLE
    from parseoggvorbis_tpu.runtime.jax_backend import frame_pipeline
    from parseoggvorbis_tpu.vorbis.mode import make_window

    b, c, n = shape
    half = n // 2
    couplings = ((0, 1),) if c >= 2 else ()
    if c == 6:
        couplings = ((0, 1), (2, 3))
    rng = np.random.RandomState(1)
    res = rng.randn(b, c, half).astype(np.float32)
    curve = rng.randint(0, 256, (b, c, half)).astype(np.int32)
    dec = rng.rand(b, c) > 0.2
    used = dec.copy()
    for mag, ang in couplings:
        both = used[:, mag] | used[:, ang]
        used[:, mag] = both
        used[:, ang] = both
    wsel = np.zeros(b, np.int32)
    m = imdct_matrix_f32(n)
    windows = np.stack([make_window(n, half, half)])

    ref = frame_pipeline(
        jnp.asarray(res), jnp.asarray(curve), jnp.asarray(dec),
        jnp.asarray(used), jnp.asarray(wsel),
        imdct_m=jnp.asarray(m), windows=jnp.asarray(windows),
        inverse_db=jnp.asarray(INVERSE_DB_TABLE), couplings=couplings,
    )
    got = fused_frame_decode(
        jnp.asarray(res), jnp.asarray(curve), jnp.asarray(dec),
        jnp.asarray(used), jnp.asarray(windows[wsel]),
        jnp.asarray(INVERSE_DB_TABLE), jnp.asarray(m),
        couplings=couplings, interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

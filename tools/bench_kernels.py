#!/usr/bin/env python3
"""Device-kernel microbenchmark: XLA pipeline vs Pallas fused kernel.

Runs on whatever accelerator jax sees (TPU in production); prints per-call
times and realtime-equivalents for the stereo long-block configuration.
Useful for chasing device-compute regressions independently of the host
link (the end-to-end bench is bench.py).

SYNC CAVEAT: ``jax.block_until_ready`` is a NO-OP on this environment's
tunneled backend (it returns before execution finishes) — every timing
here therefore syncs by fetching a tiny on-device reduction of the result
instead.  The r3 numbers printed by earlier revisions of this script used
the broken barrier and are untrustworthy.
"""


def _sync(x) -> float:
    """Honest barrier: fetch a 4-byte reduction of ``x`` (leaves ok)."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from parseoggvorbis_tpu.dsp.pallas_kernels import fused_frame_decode
    from parseoggvorbis_tpu.runtime.device_decoder import _CONSTS, setup_jax
    from parseoggvorbis_tpu.runtime.jax_backend import frame_pipeline
    from parseoggvorbis_tpu.vorbis.mode import make_window

    setup_jax()
    rng = np.random.RandomState(0)
    b, c, n = 512, 2, 2048
    half = n // 2
    res = jax.device_put(rng.randn(b, c, half).astype(np.float32))
    curve = jax.device_put(rng.randint(0, 256, (b, c, half)).astype(np.int32))
    dec = jax.device_put(np.ones((b, c), bool))
    used = dec
    wsel = jax.device_put(np.zeros(b, np.int32))
    m = _CONSTS.imdct(n)
    windows = jax.device_put(np.stack([make_window(n, half, half)]))
    winpf = jnp.take(windows, jnp.zeros(b, jnp.int32), axis=0)
    idb = _CONSTS.inverse_db

    xla = jax.jit(functools.partial(
        frame_pipeline, imdct_m=m, windows=windows, inverse_db=idb,
        couplings=((0, 1),),
    ))

    variants = {
        "xla": lambda s: xla(res * s, curve, dec, used, wsel),
        "pallas": lambda s: fused_frame_decode(
            res * s, curve, dec, used, winpf, idb, m, couplings=((0, 1),)
        ),
    }
    outs = {}
    for name, fn in variants.items():
        out = fn(jnp.float32(1.0))
        _sync(out)
        outs[name] = np.asarray(out)
        # vary the input each call so no layer can cache results
        scales = [jnp.float32(1.0 + i * 1e-6) for i in range(10)]
        t0 = time.time()
        rs = [fn(s) for s in scales]
        _sync(rs)
        dt = (time.time() - t0) / len(scales)
        print("%-6s %.4fs/call (%d frames) -> %.0fx realtime-equiv (stereo)"
              % (name, dt, b, b * half / 44100.0 / dt))
    diff = np.max(np.abs(outs["xla"] - outs["pallas"]))
    print("pallas vs xla max abs diff:", diff)
    assert diff < 1e-5

    bench_imdct_crossover()


def bench_imdct_crossover():
    """Cosine-matrix matmul vs O(n log n) FFT IMDCT, chained timing.

    Measured on the v5e (2026-08, chained steps; ~1.5ms/call of chained
    dispatch overhead is common to both variants):
      n=2048: matmul 1.56-1.90ms, fft 1.69-2.52ms   (b = 64..1024)
      n=4096: matmul 1.47-1.90ms, fft 1.66-5.12ms
      n=8192: matmul 1.85ms,      fft 3.96ms        (b = 64)
    The MXU matmul wins at every legal blocksize (the length-4n irfft is
    VPU-bound and scales worse with batch), so _FFT_IMDCT_MIN_N defaults
    to 16384 = matmul everywhere; the FFT path remains env-selectable for
    HBM-constrained deployments (the 8192 matrix is 134MB).
    """
    from parseoggvorbis_tpu.runtime.device_decoder import _CONSTS
    from parseoggvorbis_tpu.runtime.jax_backend import imdct_via_rfft

    rng = np.random.RandomState(1)
    for n in (2048, 8192):
        half = n // 2
        m = _CONSTS.imdct(n)

        @jax.jit
        def mm_step(x, m=m, half=half):
            y = jnp.matmul(x, m, precision=jax.lax.Precision.HIGHEST)
            return y[:, :half] * jnp.float32(1e-3)

        @jax.jit
        def ff_step(x, n=n, half=half):
            return imdct_via_rfft(x, n)[:, :half] * jnp.float32(1e-3)

        for b in (64, 512):
            x0 = jax.device_put(rng.randn(b, half).astype(np.float32))
            for name, step in (("matmul", mm_step), ("fft", ff_step)):
                x = step(x0)
                _sync(x)
                t0 = time.time()
                for _ in range(5):
                    x = step(x)  # chained: output feeds the next input
                _sync(x)
                dt = (time.time() - t0) / 5
                print("imdct %-6s n=%-5d b=%-4d %.4fs/call" % (name, n, b, dt))


if __name__ == "__main__":
    main()

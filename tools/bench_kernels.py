#!/usr/bin/env python3
"""Device-kernel microbenchmark: XLA pipeline vs Pallas fused kernel.

Runs on whatever accelerator jax sees (TPU in production); prints per-call
times and realtime-equivalents for the stereo long-block configuration.
Useful for chasing device-compute regressions independently of the host
link (the end-to-end bench is bench.py).
"""

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
        jax.block_until_ready(out)
        outs[name] = np.asarray(out)
        # vary the input each call so no layer can cache results
        scales = [jnp.float32(1.0 + i * 1e-6) for i in range(10)]
        t0 = time.time()
        rs = [fn(s) for s in scales]
        jax.block_until_ready(rs)
        dt = (time.time() - t0) / len(scales)
        print("%-6s %.4fs/call (%d frames) -> %.0fx realtime-equiv (stereo)"
              % (name, dt, b, b * half / 44100.0 / dt))
    diff = np.max(np.abs(outs["xla"] - outs["pallas"]))
    print("pallas vs xla max abs diff:", diff)
    assert diff < 1e-5


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""In-run device-only corpus decode benchmark (no host link on the path).

Answers the question the end-to-end bench can't: what does the DEVICE
pipeline sustain once symbols are staged in HBM?  The production corpus
path is link-bound on this environment's tunneled host<->device path
(bench.py's phase timeline + link probe prove it); this stages every
stream's prepared symbol tensors on device once, then times launches of
the full fused per-stream executables (floor render, coupling, envelope,
IMDCT matmul, window, OLA scan, dense PCM assembly, i16 convert) with a
``block_until_ready`` barrier — outputs materialize in HBM, nothing is
read back.

Also reports achieved IMDCT matmul TFLOP/s and MFU vs the chip's bf16
peak: the decode's MXU work is [B*C, res_cols] @ [res_cols, n] per mode
(2*B*C*res_cols*n FLOPs), run at float32 Precision.HIGHEST.

Importable: ``measure(blobs, repeats)`` returns a dict (bench.py embeds it
in the headline JSON as ``device_only``).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# v5e MXU peak (bf16): the standard public number for MFU accounting.
_BF16_PEAK_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0}


def measure(blobs, repeats: int = 8) -> dict:
    import jax

    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime.batch import parse_streams

    dd.setup_jax()
    flat = [sf for b in blobs for sf in parse_streams(b)]
    audio_s = 0.0
    staged = []
    flops = 0.0
    for sf in flat:
        for view in dd._chunk_views(sf):
            sig, mode_args, n_half, nums, n_total, consts = \
                dd._prepare_stream(view, True)
            audio_s += n_total / sf.sample_rate
            dargs = jax.device_put((mode_args, n_half, nums))
            imdct_ms, window_stacks, floor_consts = dd._device_consts(consts)
            fn = dd._get_stream_fn(sig)
            for ms in sig.modes:
                cols = ms.res_cols or ms.n // 2
                flops += 2.0 * ms.batch * sig.channels * cols * ms.n
            staged.append((fn, dargs, imdct_ms, window_stacks, floor_consts))

    import jax.numpy as jnp

    checksum = jax.jit(lambda xs: sum(jnp.sum(x.astype(jnp.float32))
                                      for x in xs))

    def run_all(check: bool):
        outs = [fn(a, nh, nm, im, ws, dd._CONSTS.inverse_db, fc)
                for fn, (a, nh, nm), im, ws, fc in staged]
        if check:
            # provably forces every execution: a reduction over all outputs
            # whose 4-byte result is read back (one small transfer)
            return float(checksum(outs))
        jax.block_until_ready(outs)
        return None

    run_all(True)  # warm: compile + constant staging
    walls, cwalls = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_all(False)
        walls.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_all(True)
        cwalls.append(time.perf_counter() - t0)
    walls.sort()
    cwalls.sort()
    best, p50 = walls[0], walls[len(walls) // 2]
    cbest = cwalls[0]
    dev = jax.devices()[0]
    peak = None
    for key, tf in _BF16_PEAK_TFLOPS.items():
        if key.lower() in getattr(dev, "device_kind", "").lower():
            peak = tf
    achieved_tflops = flops / best / 1e12
    return {
        "device_only_rtf": round(audio_s / best, 1),
        "device_only_rtf_p50": round(audio_s / p50, 1),
        "device_only_rtf_checksummed": round(audio_s / cbest, 1),
        "streams": len(staged),
        "audio_seconds": round(audio_s, 2),
        "repeats": repeats,
        "imdct_matmul_tflops_f32": round(achieved_tflops, 3),
        "imdct_mfu_vs_bf16_peak": (
            None if peak is None else round(achieved_tflops / peak, 4)),
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "note": "symbols pre-staged in HBM; full fused decode executables "
                "(floor render -> ... -> dense i16 PCM) timed with a "
                "block_until_ready barrier, no host readback; MFU "
                "denominator is the chip's bf16 MXU peak while the decode "
                "matmuls run f32 Precision.HIGHEST",
    }


def main():
    import glob
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "tests/data/bench/*.ogg")))
    files += [os.path.join(repo, "tests/data", f)
              for f in ("test.mono44khz.ogg", "test.stereo44khz.ogg")]
    blobs = [open(p, "rb").read() for p in files if os.path.exists(p)]
    print(json.dumps(measure(blobs), indent=2))


if __name__ == "__main__":
    main()

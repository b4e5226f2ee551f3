#!/usr/bin/env python3
"""In-run device-only corpus decode benchmark (no host link on the path).

Answers the question the end-to-end bench can't: what does the DEVICE
pipeline sustain once symbols are staged in HBM?  The production corpus
path is link-bound on this environment's tunneled host<->device path
(bench.py's phase timeline + link probe prove it); this stages every
stream's prepared symbol tensors on device once, then times the full
decode pipelines (floor render, coupling, envelope, IMDCT matmul, window,
OLA, dense PCM assembly, i16 convert) under an on-device checksum whose
4-byte readback is the barrier: ``jax.block_until_ready`` is a NO-OP on
this tunneled backend (returns before execution finishes), so a value
fetch is the only honest sync.

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

    def run_all():
        # per-stream dispatch variant.  The reduction's 4-byte readback
        # provably forces every execution — jax.block_until_ready is a
        # NO-OP on this tunneled backend (returns before execution
        # finishes), so a value fetch is the only honest barrier.
        outs = [fn(a, nh, nm, im, ws, dd._CONSTS.inverse_db, fc)
                for fn, (a, nh, nm), im, ws, fc in staged]
        return float(checksum(outs))

    # mega variant: EVERY stream's full pipeline in ONE traced program whose
    # output is a scalar checksum — one dispatch round trip total, so a
    # high-latency control link (each execute RPC costs an RTT on the
    # tunneled bench host) cannot masquerade as device time
    def mega(args_list):
        total = jnp.float32(0)
        for (fn, _, im, ws, fc), (a, nh, nm) in zip(staged, args_list):
            out = fn(a, nh, nm, im, ws, dd._CONSTS.inverse_db, fc)
            total = total + jnp.sum(out.astype(jnp.float32))
        return total

    mega_jit = jax.jit(mega)
    mega_args = [args for _, args, _, _, _ in staged]

    # null-program baseline: one dispatch + 4-byte checksum fetch of a
    # trivial reduction — the control-link round trip the mega wall pays
    # exactly once.  Subtracting it isolates device compute time.
    tiny = jax.device_put(np.ones(8, np.float32))
    null_jit = jax.jit(lambda v: jnp.sum(v))
    float(null_jit(tiny))
    nwalls = []
    for _ in range(max(repeats, 6)):
        t0 = time.perf_counter()
        float(null_jit(tiny))
        nwalls.append(time.perf_counter() - t0)
    nwalls.sort()

    run_all()  # warm: compile + constant staging
    float(mega_jit(mega_args))  # warm the fused program
    cwalls, mwalls = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_all()
        cwalls.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(mega_jit(mega_args))
        mwalls.append(time.perf_counter() - t0)
    cwalls.sort()
    mwalls.sort()
    cbest = cwalls[0]
    mbest = mwalls[0]
    compute_s = max(mbest - nwalls[0], 1e-6)
    dev = jax.devices()[0]
    peak = None
    for key, tf in _BF16_PEAK_TFLOPS.items():
        if key.lower() in getattr(dev, "device_kind", "").lower():
            peak = tf
    achieved_tflops = flops / mbest / 1e12
    return {
        # one fused dispatch for the WHOLE corpus + 4-byte checksum: the
        # honest device number (per-stream dispatch costs one control-link
        # RTT each, which dominates on the tunneled bench host)
        "device_only_rtf": round(audio_s / mbest, 1),
        "device_only_rtf_p50": round(audio_s / mwalls[len(mwalls) // 2], 1),
        "device_only_rtf_per_stream_dispatch": round(audio_s / cbest, 1),
        "device_only_rtf_per_stream_p50": round(
            audio_s / cwalls[len(cwalls) // 2], 1),
        # the mega wall pays exactly one control round trip; subtracting
        # the measured null dispatch+fetch isolates device compute — what
        # a host-local (non-tunneled) deployment would see per program
        "null_roundtrip_s": round(nwalls[0], 4),
        "device_only_rtf_rtt_corrected": round(audio_s / compute_s, 1),
        "mega_wall_s": round(mbest, 4),
        "streams": len(staged),
        "audio_seconds": round(audio_s, 2),
        "repeats": repeats,
        "imdct_matmul_tflops_f32": round(achieved_tflops, 3),
        "imdct_mfu_vs_bf16_peak": (
            None if peak is None else round(achieved_tflops / peak, 4)),
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "note": "symbols pre-staged in HBM; full decode pipelines (floor "
                "render -> ... -> dense i16 PCM) for ALL streams traced "
                "into one program whose 4-byte checksum is read back — one "
                "dispatch RTT total (block_until_ready is a no-op on this "
                "backend; the checksum fetch is the only honest barrier).  "
                "The per_stream variants pay one control-link RTT per "
                "stream and show the dispatch-latency floor instead.  "
                "MFU denominator is the chip's bf16 MXU "
                "peak while the decode matmuls run f32 Precision.HIGHEST; "
                "tflops treats the mega wall (incl. one RTT) as compute "
                "time, i.e. a lower bound",
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

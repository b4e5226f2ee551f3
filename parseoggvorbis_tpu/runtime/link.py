"""Host<->device link probes: bandwidth, round-trip latency, cached summary.

The decode pipeline's end-to-end ceiling on a given host is set by the
accelerator link, not the kernels (the device-only pipeline sustains
>1400x realtime while a tunneled ~40 MB/s link caps the end-to-end route
near 200x — see BENCH_DETAIL.json's device_only vs link_probe records).
Route selection (batch.decode_corpus route="auto") and dispatch grouping
(device_decoder.group_streams) therefore consult the link itself instead
of assuming "accelerator present == accelerator route fastest".

All probes are small (default 4 MB / a few round-trips) and the summary is
cached per process: the cost is paid once, before the first routed decode.
"""

from __future__ import annotations

import os
import threading
import time
from typing import List, Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_SUMMARY: Optional[dict] = None


def measure_link(mb: float = 8.0, repeats: int = 8) -> Tuple[List[float], List[float]]:
    """-> (h2d, d2h) MB/s samples for an ``mb``-sized float32 buffer.

    One implementation shared by tools/probe_link.py, bench.py, and the
    auto-route below.  ``block_until_ready`` is a no-op on this
    environment's tunneled backend (ROUND4.md §3), so the h2d side is
    timed honestly by fetching a 4-byte slice OF the transferred buffer
    (the slice executes only after the put completes) and subtracting the
    separately-measured null round-trip.
    """
    import jax

    n = int(mb * 1e6 / 4)
    host = np.random.RandomState(0).rand(n).astype(np.float32)
    probe = jax.jit(lambda x: x[:1])
    dev = jax.device_put(host)  # warm (allocator, tunnel session, compile)
    np.asarray(probe(dev))
    rtt = measure_roundtrip(repeats=2)

    h2d, d2h = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        dev = jax.device_put(host)
        np.asarray(probe(dev))  # honest barrier: depends on the full put
        dt = max(time.perf_counter() - t0 - rtt, 1e-9)
        h2d.append(host.nbytes / dt / 1e6)
        t0 = time.perf_counter()
        back = np.asarray(dev)
        d2h.append(back.nbytes / (time.perf_counter() - t0) / 1e6)
    return h2d, d2h


def measure_roundtrip(repeats: int = 4) -> float:
    """Best-of null round-trip seconds: a 4-byte host->device->host hop.

    Measures the per-dispatch latency floor of the link (control-path
    RTT), which dominates per-stream dispatch cost on tunneled backends
    (~30-90 ms here vs <1 ms on a local PCIe/ICI-attached chip).
    """
    import jax

    tiny = np.zeros(1, dtype=np.float32)
    np.asarray(jax.device_put(tiny))  # warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(jax.device_put(tiny))
        best = min(best, time.perf_counter() - t0)
    return best


def link_summary(refresh: bool = False) -> dict:
    """Cached per-process link characterization.

    Returns {platform, local, h2d_mb_per_s, d2h_mb_per_s, roundtrip_s}.
    ``local`` is True for the host-CPU backend (no link at all).  Probe
    sizes are kept small (4 MB, 2 repeats + 4 null hops: ~0.5 s on the
    tunneled link, microseconds locally) because the summary gates the
    first decode of the process.

    Env overrides (testing / operators who know their link):
      POV_LINK_MB_PER_S   — skip the bandwidth probe, use this value
      POV_LINK_RTT_MS     — skip the round-trip probe, use this value
    """
    global _SUMMARY
    with _LOCK:
        if _SUMMARY is not None and not refresh:
            return _SUMMARY
        import jax

        dev = jax.devices()[0]
        if dev.platform == "cpu":
            _SUMMARY = {"platform": "cpu", "local": True,
                        "h2d_mb_per_s": float("inf"),
                        "d2h_mb_per_s": float("inf"), "roundtrip_s": 0.0}
            return _SUMMARY
        bw_env = os.environ.get("POV_LINK_MB_PER_S")
        rtt_env = os.environ.get("POV_LINK_RTT_MS")
        if bw_env is not None:
            h2d = d2h = float(bw_env)
        else:
            h2d_s, d2h_s = measure_link(mb=4.0, repeats=2)
            h2d, d2h = max(h2d_s), max(d2h_s)
        rtt = (float(rtt_env) / 1e3 if rtt_env is not None
               else measure_roundtrip())
        _SUMMARY = {"platform": dev.platform, "local": False,
                    "h2d_mb_per_s": round(h2d, 1),
                    "d2h_mb_per_s": round(d2h, 1),
                    "roundtrip_s": round(rtt, 4)}
        return _SUMMARY


def _reset_cache() -> None:
    """Testing hook: drop the per-process summary."""
    global _SUMMARY
    with _LOCK:
        _SUMMARY = None

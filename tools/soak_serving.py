#!/usr/bin/env python3
"""Serving soak: sustained varied-config load against DecodeServer.

Every request uses a stream with DIFFERENT floor X values, so each one
creates distinct device render constants — exactly the load that would
leak memory without the LRU-bounded constant cache (POV_CONST_CACHE_CAP).
Reports request throughput, batching stats, and the RSS delta between the
warm point and the end of the run.

Measured on the 1-core CPU-backend dev host (240 s): 21,892 requests,
0 errors, 5,474 batches (4 req/batch), RSS +4 MB after warmup.

Usage: python3 tools/soak_serving.py [--seconds 240] [--concurrency 4]
"""
import argparse
import json
import os
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests", "tools"))


def rss_mb() -> float:
    for line in open("/proc/self/status"):
        if line.startswith("VmRSS"):
            return int(line.split()[1]) / 1024.0
    return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=240.0)
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--distinct", type=int, default=40,
                    help="distinct stream configs (distinct device consts)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (hermetic soak off-TPU)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from make_synth_vorbis import SynthStream
    from parseoggvorbis_tpu.serving import DecodeServer

    blobs = [
        SynthStream(bs0=512, bs1=2048, seed=i, floor_kind="floor1",
                    floor_xs=(64 + 7 * i, 700 + 13 * i)).make(num_frames=10)
        for i in range(args.distinct)
    ]
    server = DecodeServer(max_batch=8, max_wait_ms=10.0)
    port = server.start()

    errors = [0]

    def post(blob):
        req = urllib.request.Request("http://127.0.0.1:%d/decode" % port,
                                     data=blob, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                if r.status != 200:
                    errors[0] += 1
        except Exception:
            errors[0] += 1

    t_end = time.time() + args.seconds
    base = None
    n = 0
    while time.time() < t_end:
        threads = [
            threading.Thread(target=post, args=(blobs[(n + j) % len(blobs)],))
            for j in range(args.concurrency)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        n += args.concurrency
        if base is None and n >= 20 * args.concurrency:
            base = rss_mb()
    stats = json.loads(urllib.request.urlopen(
        "http://127.0.0.1:%d/stats" % port).read())
    server.stop()
    print(json.dumps({
        "requests": n, "errors": errors[0],
        "req_per_s": round(n / args.seconds, 1),
        "warm_rss_mb": round(base or 0, 1),
        "final_rss_mb": round(rss_mb(), 1),
        "rss_delta_mb": round(rss_mb() - (base or 0), 1),
        "server_stats": stats,
    }))


if __name__ == "__main__":
    main()

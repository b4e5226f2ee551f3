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
    """Duration of the first Vorbis stream, by a pure-stdlib page scan.

    Deliberately imports NOTHING from the package: importing
    parseoggvorbis_tpu pulls in jax, and on this host jax import/init goes
    through the axon tunnel, which has moods where it blocks forever.
    bench.py's native-host fallback and stall watchdog call this function
    precisely when the tunnel is stalled, so it must not touch jax.

    Equals the old parse_stream-based value (min(last granule, emitted))
    for well-formed complete files, where the final granule IS the emitted
    sample count; asserted against the full parse in
    tests/test_bench_watchdog.py.
    """
    import struct
    data = open(path, "rb").read()
    rate = None
    serial = None
    last_granule = None
    off = 0
    while True:
        off = data.find(b"OggS", off)
        if off < 0 or off + 27 > len(data):
            break
        granule, ser, _seq, _crc, nsegs = struct.unpack_from(
            "<qIIIB", data, off + 6)
        if off + 27 + nsegs > len(data):
            break
        segs = data[off + 27:off + 27 + nsegs]
        body_len = sum(segs)
        body = data[off + 27 + nsegs:off + 27 + nsegs + body_len]
        if serial is None and body.startswith(b"\x01vorbis"):
            serial = ser
            rate = struct.unpack_from("<I", body, 12)[0]
        if ser == serial and granule >= 0:
            last_granule = granule
        off += 27 + nsegs + body_len
    if rate is None or last_granule is None or rate == 0:
        raise ValueError("no complete Vorbis stream found in %s" % path)
    return last_granule / rate


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

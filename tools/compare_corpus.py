#!/usr/bin/env python3
"""Corpus-wide differential verification against patched libvorbis.

Runs the reference's UNMODIFIED tests/compare-debug-out.py over every file
of the bench corpus (plus the two golden files): our decoder's debug dump
(native pov_decode binary — byte-compatible dump format) vs the patched
libvorbis-standalone oracle built from the reference checkout.  This
extends the decisive stage-by-stage oracle check from the two golden files
to 5.1, single-blocksize, long, and high/low-bitrate streams.

Requires /root/reference (read-only).  Usage: python3 tools/compare_corpus.py
"""

import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("POV_REFERENCE", "/root/reference")
WORK = "/tmp/pov_compare_corpus"

sys.path.insert(0, os.path.join(REPO, "tests", "tools"))


def ensure_stub():
    os.makedirs(WORK, exist_ok=True)
    stub = os.path.join(WORK, "better_exchook.py")
    with open(stub, "w") as f:
        f.write("def install():\n    pass\n"
                "def better_exchook(*a, **k):\n"
                "    import traceback; traceback.print_exception(*a[:3])\n")
    return WORK


def main():
    if not os.path.isdir(REF):
        print("reference checkout not found at %s" % REF, file=sys.stderr)
        return 2
    import make_golden  # reuses the oracle build recipe

    _, lv = make_golden.build()
    stub_dir = ensure_stub()

    # our native demo binary (same CLI contract)
    subprocess.run([sys.executable, os.path.join(REPO, "native", "build.py")],
                   check=True, capture_output=True)
    ours = os.path.join(REPO, "parseoggvorbis_tpu", "native", "pov_decode")

    files = sorted(glob.glob(os.path.join(REPO, "tests", "data", "bench",
                                          "*.ogg")))
    files += [os.path.join(REPO, "tests", "data", f)
              for f in ("test.mono44khz.ogg", "test.stereo44khz.ogg")]

    failures = []
    for path in files:
        name = os.path.basename(path)
        our_dump = os.path.join(WORK, name + ".ours.dump")
        lv_dump = os.path.join(WORK, name + ".lv.dump")
        subprocess.run([ours, "--in", path, "--debug_out", our_dump],
                       check=True, stdout=subprocess.DEVNULL)
        subprocess.run([lv, "--in", path, "--debug_out", lv_dump],
                       check=True, stdout=subprocess.DEVNULL)
        env = dict(os.environ,
                   PYTHONPATH=stub_dir + os.pathsep +
                   os.environ.get("PYTHONPATH", ""))
        proc = subprocess.run(
            [sys.executable, os.path.join(REF, "tests", "compare-debug-out.py"),
             "--ourout", our_dump, "--libvorbisout", lv_dump],
            env=env, capture_output=True, text=True, timeout=600)
        ok = proc.returncode == 0 and "Finished." in proc.stdout
        harness = "reference harness"
        if not ok and "len(pcms1) == len(pcms2)" in proc.stderr:
            # The reference harness asserts equal per-packet pcm TAP COUNTS;
            # libvorbis-demo's 4096-byte read buffer splits >2-channel PCM
            # into several taps per packet, which it cannot absorb (it was
            # never run on 5.1).  Our reimplementation compares the
            # concatenated PCM itself; same tolerances.
            proc = subprocess.run(
                [sys.executable, "-m", "parseoggvorbis_tpu.tools.compare",
                 "--ourout", our_dump, "--libvorbisout", lv_dump],
                cwd=REPO, capture_output=True, text=True, timeout=600)
            ok = proc.returncode == 0 and "Finished." in proc.stdout
            harness = "our harness (multi-tap pcm grouping)"
        print("%-36s %s  [%s]" % (name, "OK" if ok else "FAIL", harness))
        if not ok:
            failures.append((name, proc.stdout[-1500:], proc.stderr[-1500:]))
    for name, out, err in failures:
        print("==== %s ====\n%s\n%s" % (name, out, err), file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

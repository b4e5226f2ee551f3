#!/usr/bin/env python3
"""Regenerate the golden oracle dumps in tests/golden/.

Requires the reference checkout mounted at /root/reference.  Compiles (out of
tree, into /tmp) the reference decoder and the patched libvorbis-standalone,
runs both over the test audio with --debug_out, and stores the dumps
xz-compressed.  The goldens in git were produced by exactly this procedure.
"""

import glob
import lzma
import os
import subprocess
import sys

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "..", "golden")
DATA = os.path.join(HERE, "..", "data")
BUILD = "/tmp/parseoggvorbis_oracle_build"

CONFIG_TYPES_H = """#ifndef __CONFIG_TYPES_H__
#define __CONFIG_TYPES_H__
#include <stdint.h>
typedef int16_t ogg_int16_t;
typedef uint16_t ogg_uint16_t;
typedef int32_t ogg_int32_t;
typedef uint32_t ogg_uint32_t;
typedef int64_t ogg_int64_t;
typedef uint64_t ogg_uint64_t;
#endif
"""


def run(cmd, **kw):
    print("$", " ".join(cmd))
    subprocess.check_call(cmd, **kw)


def build():
    os.makedirs(BUILD, exist_ok=True)
    os.makedirs(os.path.join(BUILD, "inc", "ogg"), exist_ok=True)
    with open(os.path.join(BUILD, "inc", "ogg", "config_types.h"), "w") as f:
        f.write(CONFIG_TYPES_H)
    ours = os.path.join(BUILD, "ours.bin")
    if not os.path.exists(ours):
        run(["g++", "-std=c++11", "-O2"] + glob.glob(REF + "/src/*.cpp")
            + ["-I", REF + "/src", "-o", ours])
    lv = os.path.join(BUILD, "libvorbis-standalone.bin")
    if not os.path.exists(lv):
        cfiles = glob.glob(REF + "/tests/libvorbis-standalone/*.c")
        incs = ["-I", os.path.join(BUILD, "inc"),
                "-I", REF + "/tests/libvorbis-standalone", "-I", REF + "/src"]
        run(["gcc", "-O2", "-w", "-c"] + cfiles + incs, cwd=BUILD)
        run(["g++", "-O2", "-w", "-c", REF + "/tests/libvorbis-demo.cpp",
             REF + "/src/Callbacks.cpp"] + incs, cwd=BUILD)
        run(["g++", "-O2"] + glob.glob(BUILD + "/*.o") + ["-lm", "-o", lv])
    return ours, lv


def main():
    ours, lv = build()
    for short in ("mono", "stereo"):
        ogg = os.path.join(DATA, "test.%s44khz.ogg" % short)
        for tag, binary in (("ours", ours), ("libvorbis", lv)):
            dump = os.path.join(BUILD, "%s.%s.dump" % (tag, short))
            run([binary, "--in", ogg, "--debug_out", dump])
            out = os.path.join(GOLDEN, "%s.%s.dump.xz" % (tag, short))
            with open(dump, "rb") as f:
                data = f.read()
            with lzma.open(out, "wb", preset=9) as f:
                f.write(data)
            print("wrote", out, len(data), "bytes raw")


if __name__ == "__main__":
    sys.exit(main())

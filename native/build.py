#!/usr/bin/env python3
"""Build the native host front-end shared library.

g++ -O3 -march=native -shared -fPIC native/pov_frontend.cpp
    -> parseoggvorbis_tpu/native/_libpov.so

The Python package falls back to the pure-Python front-end when the library
is absent, so this build is an optimization, not a requirement.

Sanitizer builds (the thread contract is registry-mutex + thread-local
pending config, callbacks/registry.py and native povcb; the reference had
no sanitizer story at all): POV_SANITIZE=address|thread|undefined builds
the library and binary with the matching -fsanitize flag and -O1 -g.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SRC = [os.path.join(HERE, "pov_frontend.cpp"), os.path.join(HERE, "pov_capi.cpp")]
OUT_DIR = os.path.join(REPO, "parseoggvorbis_tpu", "native")
OUT = os.path.join(OUT_DIR, "_libpov.so")

SANITIZE = os.environ.get("POV_SANITIZE", "")
# -fno-semantic-interposition + -fvisibility-inlines-hidden: without them
# -fPIC keeps every exported C++ method interposable, so hot intra-library
# calls (e.g. parse_audio -> BitReader::read) go through the PLT and are
# never inlined across functions; the C API stays dlsym/ctypes-visible.
_PIC_FLAGS = ["-fno-semantic-interposition", "-fvisibility-inlines-hidden"]
_SAN_FLAGS = (["-fsanitize=%s" % SANITIZE, "-fno-omit-frame-pointer",
               "-O1", "-g"] if SANITIZE else ["-O3", "-march=native"])
_SAN_FLAGS = _PIC_FLAGS + _SAN_FLAGS


def _drop_unsupported(cmd):
    """Retry without -march=native if this g++/host rejects it (the
    library is always built on the host that runs it, so the flag is safe
    when accepted; ~7% on the FFT IMDCT inner loops)."""
    return [f for f in cmd if f != "-march=native"]


def build(verbose: bool = True) -> str:
    os.makedirs(OUT_DIR, exist_ok=True)
    cmd = [
        "g++", "-std=c++17", "-fPIC", "-shared", "-Wall", "-Wextra",
    ] + _SAN_FLAGS + SRC + ["-o", OUT]
    if verbose:
        print("$", " ".join(cmd))
    try:
        subprocess.check_call(cmd)
    except subprocess.CalledProcessError:
        cmd = _drop_unsupported(cmd)
        subprocess.check_call(cmd)
    # native demo binary (same CLI contract as the reference's ours.bin)
    main_src = os.path.join(HERE, "pov_main.cpp")
    bin_out = os.path.join(OUT_DIR, "pov_decode")
    cmd = ["g++", "-std=c++17", "-Wall"] + _SAN_FLAGS + [main_src] + SRC[1:] + [
        "-o", bin_out]
    if verbose:
        print("$", " ".join(cmd))
    try:
        subprocess.check_call(cmd)
    except subprocess.CalledProcessError:
        cmd = _drop_unsupported(cmd)
        subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    build()
    print("built", OUT)
    sys.exit(0)

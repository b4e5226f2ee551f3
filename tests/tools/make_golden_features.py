#!/usr/bin/env python3
"""Generate golden feature matrices with the REFERENCE extraction stack.

Requires /root/reference (compiles its shared lib out-of-tree) — run once to
(re)generate tests/golden/features_golden.npz; the committed file was made by
exactly this script.  Our feature extractors must reproduce these matrices
bit-for-bit (they share the dump-stream input, which is already validated
byte-identical to the reference decoder's).
"""

import glob
import importlib
import importlib.util
import os
import subprocess
import sys

import numpy as np

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "..", "golden")
DATA = os.path.join(HERE, "..", "data")
BUILD = "/tmp/parseoggvorbis_oracle_build"
LIB = os.path.join(BUILD, "ParseOggVorbis.so")


def build_lib():
    os.makedirs(BUILD, exist_ok=True)
    if os.path.exists(LIB):
        return
    srcs = [f for f in glob.glob(REF + "/src/*.cpp") if not f.endswith("main.cpp")]
    subprocess.check_call(
        ["g++", "-std=c++11", "-O2", "-fpic", "-shared"] + srcs
        + ["-I", REF + "/src", "-o", LIB]
    )


def load_reference_pkg():
    sys.path.insert(0, REF)
    spec = importlib.util.spec_from_file_location(
        "refpkg", REF + "/__init__.py", submodule_search_locations=[REF]
    )
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["refpkg"] = pkg
    spec.loader.exec_module(pkg)
    return importlib.import_module("refpkg.demo_live_extract")


KINDS = {
    "floor_final_ys": ["floor1_unpack multiplier", "floor1_unpack xs", "finish_setup",
                       "floor_number", "floor1 final_ys", "finish_audio_packet"],
    "floor_final_ys_rendered": ["floor1_unpack multiplier", "floor1_unpack xs",
                                "finish_setup", "floor_number", "floor1 floor",
                                "finish_audio_packet"],
    "floor_final_ys_rendered_concat_residue": [
        "floor1_unpack multiplier", "floor1_unpack xs", "finish_setup",
        "floor_number", "floor1 floor", "after_residue", "finish_audio_packet"],
    "residue_ys": ["floor1_unpack multiplier", "floor1_unpack xs", "finish_setup",
                   "floor_number", "after_residue", "finish_audio_packet"],
    "residue_ys_with_floor": ["floor1_unpack multiplier", "floor1_unpack xs",
                              "finish_setup", "floor_number", "floor1 floor",
                              "after_residue", "finish_audio_packet"],
}

# (name, kind, extractor, output_dim, kwargs)
CASES = [
    ("floor_ys_d64", "floor_final_ys", "floor", 64, {}),
    ("floor_ys_d64_nofloornum", "floor_final_ys", "floor", 64,
     {"include_floor_number": False}),
    ("floor_ys_d64_biggest", "floor_final_ys", "floor", 64,
     {"only_biggest_floor": True}),
    ("floor_ys_d64_positive", "floor_final_ys", "floor", 64,
     {"floor_always_positive": True}),
    ("floor_ys_d40_sorted", "floor_final_ys", "floor", 40, {"sorted_xs": True}),
    ("floor_rendered_d64", "floor_final_ys_rendered", "floor", 64, {}),
    ("floor_rendered_d64_frombig", "floor_final_ys_rendered", "floor", 64,
     {"xs_from_biggest_floor": True}),
    ("floor_rendered_concat_d128", "floor_final_ys_rendered_concat_residue",
     "floor", 128, {}),
    ("floor_ys_d64_upscale2", "floor_final_ys", "floor", 64,
     {"upscale_xs_factor": 2}),
    ("residue_d64", "residue_ys", "residue", 64, {}),
    ("residue_d64_scaled", "residue_ys", "residue", 64,
     {"scale": 0.5, "clip_abs_max": 1.0}),
    ("residue_d64_log1p", "residue_ys", "residue", 64, {"log1p_abs_space": True}),
    ("residue_d64_ignore_xs", "residue_ys", "residue", 64, {"ignore_xs": True}),
    ("residue_floor_d64", "residue_ys_with_floor", "residue", 64,
     {"log1p_abs_space": True, "floor_base_factor": 2.0}),
]


def main():
    build_lib()
    dle = load_reference_pkg()
    lib = dle.ParseOggVorbisLib(lib_filename=LIB)
    out = {}
    for short in ("mono", "stereo"):
        raw = open(os.path.join(DATA, "test.%s44khz.ogg" % short), "rb").read()
        for name, kind, extractor, dim, kwargs in CASES:
            reader = lib.decode_ogg_vorbis(raw, data_filter=KINDS[kind])
            if extractor == "floor":
                res = reader.read_floor_ys(output_dim=dim, **kwargs)
            else:
                res = reader.read_residue_ys(output_dim=dim, **kwargs)
            out["%s/%s" % (short, name)] = res
            print(short, name, res.shape)
    np.savez_compressed(os.path.join(GOLDEN, "features_golden.npz"), **out)
    print("wrote", os.path.join(GOLDEN, "features_golden.npz"))


if __name__ == "__main__":
    main()

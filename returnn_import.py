"""RETURNN import point — vendor this repo at ``RETURNN/extern/<name>`` and
``from extern.<name>.returnn_import import ParseOggVorbisLib``.

API-compatible with the reference's returnn_import.py
(/root/reference/returnn_import.py:58-117): a singleton ``ParseOggVorbisLib``
whose ``get_features_from_raw_bytes(raw_bytes, output_dim, kind=...)``
returns (time, output_dim) float32 acoustic-feature matrices for the same
five kinds — floor_final_ys, floor_final_ys_rendered,
floor_final_ys_rendered_concat_residue, residue_ys, residue_ys_with_floor.

Differences by design (TPU-native rebuild):

* feature extraction runs in-process over our decoder's debug-dump channel
  (no cffi / dlopen required), so the module works even where no compiler
  exists; ``get_auto_compiled_lib_filename`` still builds the native C++
  host front-end — through RETURNN's NativeCodeCompiler when RETURNN is on
  sys.path (the reference's mechanism, returnn_import.py:28-55), falling
  back to this repo's own ``native/build.py``;
* corpus-scale extraction should use
  ``parseoggvorbis_tpu.features.batched.get_features_batched`` (native
  front-end + vectorized assembly, no dump round-trip).
"""

from __future__ import annotations

import os
import sys
from glob import glob

my_dir = os.path.dirname(os.path.abspath(__file__))

if __name__ == "__main__":
    __path__ = [my_dir]  # noqa: F841 — run as script from anywhere

if my_dir not in sys.path:
    sys.path.insert(0, my_dir)

from parseoggvorbis_tpu.features.lib import (  # noqa: E402
    DATA_FILTERS,
    ParseOggVorbisLib as _ParseOggVorbisLib,
)

src_dir = "%s/native" % my_dir


def get_auto_compiled_lib_filename(verbose: bool = False) -> str:
    """Build (or reuse) the native C++ host front-end, returning its path.

    Uses RETURNN's NativeCodeCompiler when importable (concatenating the
    native sources with #line markers, exactly the reference's recipe),
    else this repo's native/build.py.
    """
    try:
        try:
            from returnn.util.basic import NativeCodeCompiler  # RETURNN >= 1.0
        except ImportError:
            from Util import NativeCodeCompiler  # legacy RETURNN layout

        assert os.path.exists(src_dir)
        src_files = sorted(glob("%s/*.cpp" % src_dir))
        src_files = [f for f in src_files if not f.endswith("pov_main.cpp")]
        assert src_files
        src_code = ""
        for src_fn in src_files:
            src_code += "\n// ------------ %s : BEGIN { ------------\n" % (
                os.path.basename(src_fn))
            src_code += '#line 1 "%s"\n' % os.path.basename(src_fn)
            src_code += open(src_fn).read()
            src_code += "\n// ------------ %s : END } --------------\n\n" % (
                os.path.basename(src_fn))
        native = NativeCodeCompiler(
            base_name="parseoggvorbis_tpu", code_version=1, code=src_code,
            include_paths=[src_dir], use_cxx11_abi=True, verbose=verbose)
        return native.get_lib_filename()
    except ImportError:
        # no RETURNN on sys.path: this repo's own build
        import subprocess

        lib = os.path.join(my_dir, "parseoggvorbis_tpu", "native",
                           "_libpov.so")
        if not os.path.exists(lib):
            subprocess.run(
                [sys.executable, os.path.join(my_dir, "native", "build.py")],
                check=True, capture_output=not verbose)
        return lib


class ParseOggVorbisLib(_ParseOggVorbisLib):
    """Singleton feature-extraction front-end (reference:
    returnn_import.py:58-75)."""

    instance = None

    def __init__(self):
        super().__init__(lib_filename=get_auto_compiled_lib_filename())

    @classmethod
    def get_instance(cls) -> "ParseOggVorbisLib":
        if cls.instance is None:
            cls.instance = cls()
        return cls.instance

    # get_features_from_raw_bytes(raw_bytes, output_dim, kind, **kwargs) is
    # inherited; the five kinds and their tap filters are DATA_FILTERS in
    # features/lib.py, 1:1 with returnn_import.py:77-117.


FEATURE_KINDS = tuple(DATA_FILTERS)


def _plot(m, end_frame=None):
    print("Plotting matrix of shape %s." % (m.shape,))
    from matplotlib.pyplot import matshow, show

    matshow(m.transpose()[:, :end_frame], aspect="auto")
    show()


def _demo():
    from argparse import ArgumentParser

    arg_parser = ArgumentParser()
    arg_parser.add_argument("--ogg")
    arg_parser.add_argument("--opts")
    arg_parser.add_argument("--kind", default="floor_final_ys")
    arg_parser.add_argument("--dim", type=int)
    arg_parser.add_argument("--end_frame", type=int, default=None,
                            help="e.g. 200, better for plotting")
    arg_parser.add_argument("--no_plot", action="store_true")
    args = arg_parser.parse_args()
    lib_fn = get_auto_compiled_lib_filename(verbose=True)
    print("Lib filename:", lib_fn)
    lib = ParseOggVorbisLib.get_instance()
    if args.ogg:
        raw_bytes = open(args.ogg, "rb").read()
        import ast

        opts = ast.literal_eval(args.opts) if args.opts else {}
        features = lib.get_features_from_raw_bytes(
            raw_bytes=raw_bytes, kind=args.kind, output_dim=args.dim, **opts)
        if args.no_plot:
            print("Features shape:", features.shape)
        else:
            _plot(features, end_frame=args.end_frame)


if __name__ == "__main__":
    _demo()

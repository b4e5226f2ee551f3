"""Corpus decode / feature-extraction driver (demo_live_extract equivalent).

    python -m parseoggvorbis_tpu.tools.live_extract FILE_OR_ZIP
        [--filter NAME ...] [--mode dump|floor_ys|residue_ys]
        [--output_dim N] [--scale S] [--clip_abs_max M] [--multi_threaded]
        [--device]

Same CLI contract as the reference's demo_live_extract.py:555-599; ZIP
archives are swept for .ogg members.  ``--multi_threaded`` parallelizes
decode across files (the reference's ThreadPoolExecutor path).
``--device`` (floor_ys/residue_ys modes) computes the feature matrices on
the TPU (features/device.py, >=500x realtime corpus-wide) — same values,
none of the per-entry host state machine.
"""

from __future__ import annotations

import sys
from argparse import ArgumentParser
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor

from ..features.lib import ParseOggVorbisLib

DEFAULT_FILTER = [
    "floor1_unpack multiplier", "floor1_unpack xs", "finish_setup",
    "floor_number", "floor1 final_ys", "finish_audio_packet",
]


def _do_file(lib, args, fn=None, reader=None, raw_bytes=None):
    if fn:
        print(fn)
    if getattr(args, "device", False) and raw_bytes is not None:
        from ..features.device import get_features_device

        if args.mode == "floor_ys":
            res = get_features_device(raw_bytes, args.output_dim,
                                      "floor_final_ys")
        else:
            res = get_features_device(
                raw_bytes, args.output_dim, "residue_ys", scale=args.scale,
                clip_abs_max=args.clip_abs_max)
        print("res shape:", res.shape)
        print("res:")
        print(res)
        return
    if not reader:
        assert raw_bytes is not None
        reader = lib.decode_ogg_vorbis(raw_bytes, data_filter=args.filter)

    if args.mode == "dump":
        counts = defaultdict(int)
        while True:
            try:
                name, channel, data = reader.read_entry()
            except EOFError:
                break
            counts[name] += 1
            reader.dump_entry(name, channel, data)
        print("Entry name counts:", dict(counts))
    elif args.mode == "floor_ys":
        assert args.output_dim
        res = reader.read_floor_ys(output_dim=args.output_dim)
        print("res shape:", res.shape)
        print("res:")
        print(res)
    elif args.mode == "residue_ys":
        assert args.output_dim
        assert "after_residue" in args.filter or not args.filter
        res = reader.read_residue_ys(
            output_dim=args.output_dim, scale=args.scale,
            clip_abs_max=args.clip_abs_max,
        )
        print("res shape:", res.shape)
        print("res:")
        print(res)
    else:
        raise Exception("invalid mode %r" % (args.mode,))


def main(argv=None) -> int:
    ap = ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--filter", nargs="*", default=DEFAULT_FILTER)
    ap.add_argument("--mode", default="dump")
    ap.add_argument("--output_dim", type=int)
    ap.add_argument("--clip_abs_max", type=float)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--multi_threaded", action="store_true")
    ap.add_argument("--device", action="store_true",
                    help="compute feature matrices on the TPU")
    args = ap.parse_args(argv)
    if args.device and args.mode == "dump":
        ap.error("--device applies to the floor_ys/residue_ys modes")

    lib = ParseOggVorbisLib()

    if args.file.endswith(".zip"):
        print("Got a ZIP file, iterating through all OGG inside.")
        import zipfile

        # ogg_count counts EVERY archive member, not just .ogg — quirk kept
        # bug-for-bug from the reference CLI (demo_live_extract.py:584-589),
        # whose "Found %i OGG files." line this output mirrors
        ogg_count = 0
        with zipfile.ZipFile(args.file) as zip_f:
            names = zip_f.namelist()
            # --device bypasses the reader pre-decode entirely (the TPU
            # path batches internally), so the threaded reader pipeline
            # below would both waste the host decode and silently drop
            # the flag
            if args.multi_threaded and not args.device:
                futures = {}
                with ThreadPoolExecutor(max_workers=10) as ex:
                    for fn in names:
                        if fn.endswith(".ogg"):
                            futures[fn] = ex.submit(
                                lib.decode_ogg_vorbis,
                                raw_bytes=zip_f.read(fn),
                                data_filter=args.filter,
                            )
                    for fn in names:
                        ogg_count += 1
                        if fn.endswith(".ogg"):
                            _do_file(lib, args=args, reader=futures[fn].result(),
                                     fn=fn)
            else:
                for fn in names:
                    ogg_count += 1
                    if fn.endswith(".ogg"):
                        _do_file(lib, args=args, raw_bytes=zip_f.read(fn), fn=fn)
        print("Found %i OGG files." % ogg_count)
    else:
        raw = open(args.file, "rb").read()
        _do_file(lib, raw_bytes=raw, args=args)
    print("Finished")
    return 0


if __name__ == "__main__":
    sys.exit(main())

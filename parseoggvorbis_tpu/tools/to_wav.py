"""Decode Ogg Vorbis to WAV — the end-user face of the decode surfaces.

    python3 -m parseoggvorbis_tpu.tools.to_wav in.ogg out.wav
        [--start S] [--end E]      sample-exact range (seek path)
        [--seconds]                interpret --start/--end as seconds
        [--recover]                corruption-tolerant decode (resync)
        [--route device|native|auto]   decode backend (see decode_corpus)
        [--serial N]               logical stream of a multiplexed file

Ranges decode only the covering pages (O(range), ogg/seek.py); --recover
resyncs past damage, zero-fills the lost ranges and reports them on
stderr (ogg/recover.py).  Output is 16-bit PCM WAV (stdlib wave module;
interleaved, int16 conversion identical to the decode paths').
"""

from __future__ import annotations

import argparse
import sys
import wave

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Decode Ogg Vorbis to 16-bit WAV")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--start", default=None)
    ap.add_argument("--end", default=None)
    ap.add_argument("--seconds", action="store_true",
                    help="--start/--end are seconds, not samples")
    ap.add_argument("--recover", action="store_true")
    ap.add_argument("--route", default=None,
                    choices=("device", "native", "auto"))
    ap.add_argument("--serial", type=int, default=None)
    args = ap.parse_args(argv)
    # seconds are floats; sample indices must be exact integers (a float
    # round-trip would silently truncate / lose precision)
    for key in ("start", "end"):
        v = getattr(args, key)
        if v is None:
            continue
        try:
            setattr(args, key, float(v) if args.seconds else int(v))
        except ValueError:
            ap.error("--%s must be an %s" % (
                key, "number of seconds" if args.seconds
                else "integer sample index"))
    if args.recover and args.seconds:
        ap.error("--recover takes sample --start/--end, not --seconds")
    if args.route and (args.start is not None or args.end is not None
                       or args.serial is not None or args.recover):
        # ranged/serial/recover decodes run on their own fixed paths
        ap.error("--route applies only to the plain full decode")

    from ..runtime.batch import (
        decode_corpus,
        decode_file_recover,
        decode_sample_range,
        decode_time_range,
    )

    if args.recover:
        rec = decode_file_recover(args.input, out_i16=True,
                                  serial=args.serial,
                                  start=args.start or 0, end=args.end)
        if rec.damage:
            print("recovered: %d bytes of damage skipped; holes=%s "
                  "approximate=%s" % (sum(b - a for a, b in rec.damage),
                                      rec.holes, rec.approximate),
                  file=sys.stderr)
        pcm, rate = rec.pcm, rec.sample_rate
    elif args.start is not None or args.end is not None:
        data = open(args.input, "rb").read()
        fn = decode_time_range if args.seconds else decode_sample_range
        out = fn(data, args.start or 0, args.end, out_i16=True,
                 serial=args.serial)
        pcm, rate = out.pcm, out.sample_rate
    elif args.serial is not None:
        # full decode of one selected logical stream (seek path with the
        # whole range — bit-identical to a full decode of that stream)
        data = open(args.input, "rb").read()
        out = decode_sample_range(data, 0, None, out_i16=True,
                                  serial=args.serial)
        pcm, rate = out.pcm, out.sample_rate
    else:
        data = open(args.input, "rb").read()
        out = decode_corpus([data], out_i16=True, route=args.route)[0]
        pcm, rate = out.pcm, out.sample_rate

    with wave.open(args.output, "wb") as w:
        w.setnchannels(pcm.shape[0])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.ascontiguousarray(pcm.T).tobytes())
    print("wrote %s: %d ch, %d samples @ %d Hz"
          % (args.output, pcm.shape[0], pcm.shape[1], rate))
    return 0


if __name__ == "__main__":
    sys.exit(main())

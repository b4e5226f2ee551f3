#!/usr/bin/env python3
"""Randomized encode->decode differential fuzz against system libvorbis.

Each iteration synthesizes random audio (random channel count, sample
rate, duration, spectral content, transient density), encodes it with the
system libvorbisenc at a random VBR quality, decodes it with BOTH our
framework (native front-end + device pipeline) and the system
libvorbisfile, and asserts sample-count equality and max-abs error
<= 1e-6.  Sweeps far more encoder mode/codebook configurations than any
fixed corpus.

Usage: python3 tools/fuzz_roundtrip.py [--iters 50] [--seed 0]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests", "tools"))

RATES = [8000, 11025, 16000, 22050, 32000, 44100, 48000]


def random_audio(rng):
    channels = int(rng.choice([1, 1, 2, 2, 2, 4, 6]))
    rate = int(rng.choice(RATES))
    seconds = float(rng.uniform(0.3, 6.0))
    n = int(seconds * rate)
    t = np.arange(n) / rate
    out = np.zeros((channels, n), np.float32)
    for _ in range(rng.randint(1, 6)):  # random tonal components
        f = rng.uniform(30, rate / 2 * 0.9)
        amp = rng.uniform(0.01, 0.4)
        ph = rng.uniform(0, 2 * np.pi, size=(channels, 1))
        out += (amp * np.sin(2 * np.pi * f * t[None, :] + ph)).astype(np.float32)
    if rng.rand() < 0.7:  # noise bed
        out += rng.uniform(0.001, 0.1) * rng.randn(channels, n).astype(np.float32)
    for _ in range(rng.randint(0, 8)):  # transients
        at = rng.randint(0, max(1, n - 64))
        out[:, at : at + 64] += rng.uniform(0.2, 0.9) * rng.randn(64).astype(np.float32)
    if rng.rand() < 0.1:
        out[:] = 0.0  # digital silence
    peak = max(1e-9, float(np.abs(out).max()))
    if peak > 0.95:
        out *= 0.95 / peak
    return out, rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--mutate", type=int, default=0, metavar="N",
                    help="after each good roundtrip, full-decode N "
                         "CRC-resealed payload mutations (crash hunt)")
    args = ap.parse_args()

    from vorbis_oracle import decode_ogg, encode_ogg

    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    from repaginate import repaginate

    from parseoggvorbis_tpu.runtime.batch import decode_all_streams

    rng = np.random.RandomState(args.seed)
    worst = 0.0
    fails = 0
    prev = None  # (ogg, ref) for chained-file checks
    for i in range(args.iters):
        pcm, rate = random_audio(rng)
        q = float(rng.uniform(-0.1, 1.0))
        bitrate = None
        if rng.rand() < 0.25:  # managed-bitrate mode (different templates)
            bitrate = int(rng.uniform(12000, 80000)) * pcm.shape[0]
        try:
            ogg = encode_ogg(pcm, rate, q, serial=i, bitrate=bitrate)
        except RuntimeError as exc:
            print("%3d: encoder refused (ch=%d rate=%d q=%.2f br=%r): %s"
                  % (i, pcm.shape[0], rate, q, bitrate, exc))
            continue
        ours = decode_bytes(ogg)
        ref, ref_rate = decode_ogg(ogg)
        ok = (ours.sample_rate == ref_rate and ours.pcm.shape == ref.shape)
        err = float(np.abs(ours.pcm - ref).max()) if ok else float("inf")
        worst = max(worst, err)
        status = "ok" if ok and err <= args.tol else "FAIL"
        if status == "FAIL":
            fails += 1
        mode = ("br=%dk" % (bitrate // 1000)) if bitrate else ("q=%+.2f" % q)
        extra = ""
        if ok and err <= args.tol:
            # re-paginate with spanning packets: identical decode expected
            if rng.rand() < 0.3:
                try:
                    spanned, nspans = repaginate(ogg)
                except AssertionError:
                    spanned = None  # no packet long enough to span
                if spanned is not None:
                    got = decode_bytes(spanned)
                    if (got.pcm.shape != ours.pcm.shape
                            or not np.array_equal(got.pcm, ours.pcm)):
                        fails += 1
                        status = "FAIL(spanning)"
                    extra += " +span%d" % nspans
            # chain with the previous file: demux must recover both
            if prev is not None and rng.rand() < 0.3:
                p_ogg, p_ref = prev
                outs = decode_all_streams(p_ogg + ogg)
                ok2 = (len(outs) == 2
                       and outs[0].pcm.shape == p_ref.shape
                       and np.abs(outs[0].pcm - p_ref).max() <= args.tol
                       and outs[1].pcm.shape == ref.shape
                       and np.abs(outs[1].pcm - ref).max() <= args.tol)
                if not ok2:
                    fails += 1
                    status = "FAIL(chained)"
                extra += " +chain"
            # streaming path: chunked decode must match the whole-file
            # decode (2e-6: batch-shape f32 reassociation, see
            # tests/test_streaming.py)
            if rng.rand() < 0.3:
                from parseoggvorbis_tpu.runtime.batch import \
                    decode_bytes_streaming

                chunk = int(rng.choice([0, 7, 33, 256]))
                got = decode_bytes_streaming(ogg, chunk_frames=chunk).read_all()
                if (got.pcm.shape != ours.pcm.shape
                        or float(np.abs(got.pcm - ours.pcm).max()) > 2e-6):
                    fails += 1
                    status = "FAIL(stream)"
                extra += " +stream%d" % chunk
            # random-range seek must equal slicing the full decode EXACTLY
            # (bit-contract of decode_sample_range, ogg/seek.py)
            if rng.rand() < 0.3:
                from parseoggvorbis_tpu.runtime.batch import \
                    decode_sample_range

                total = ours.pcm.shape[1]
                if total > 1:
                    s = int(rng.randint(0, total))
                    e = int(min(total, s + 1 + rng.randint(0, total)))
                    try:
                        got = decode_sample_range(ogg, s, e)
                        seek_ok = np.array_equal(got.pcm, ours.pcm[:, s:e])
                    except Exception as exc:
                        print("    seek[%d:%d] raised: %s" % (s, e, exc))
                        seek_ok = False
                    if not seek_ok:
                        fails += 1
                        status = "FAIL(seek)"
                    extra += " +seek[%d:%d]" % (s, e)
            # ranged feature rows must equal the full extraction's rows at
            # the same packets EXACTLY (features/batched.get_features_range)
            if rng.rand() < 0.3:
                from parseoggvorbis_tpu.features.batched import (
                    get_features, get_features_range)

                total = ours.pcm.shape[1]
                if total > 1:
                    s = int(rng.randint(0, total))
                    e = int(min(total, s + 1 + rng.randint(0, total)))
                    kind = ("floor_final_ys", "residue_ys")[
                        int(rng.randint(0, 2))]
                    try:
                        try:
                            full = get_features(ogg, 48, kind=kind)
                        except AssertionError:
                            # output_dim < len(floor xs): the extractors
                            # refuse, identically to the reference (see
                            # .claude/skills/verify gotchas) — skip probe
                            full = None
                        r = (get_features_range(ogg, 48, s, e, kind=kind)
                             if full is not None else None)
                        # crops are contiguous row windows of the full
                        # matrix; locate by packet count (rows per packet
                        # vary, but packets are nondecreasing)
                        if full is None:
                            frange_ok, n = True, -1
                        else:
                            n = r.features.shape[0]
                            frange_ok = any(
                                np.array_equal(full[o:o + n], r.features)
                                for o in range(full.shape[0] - n + 1)
                            ) if n else True
                    except Exception as exc:
                        print("    frange[%d:%d] raised: %s" % (s, e, exc))
                        frange_ok = False
                    if not frange_ok:
                        fails += 1
                        status = "FAIL(frange)"
                    extra += " +frange[%d:%d]" % (s, e)
            # recovery decode: flip a raw byte in one audio page (CRC NOT
            # resealed) — the page must be skipped, intact regions must
            # match the clean decode outside holes/approximate ranges
            if rng.rand() < 0.3:
                from parseoggvorbis_tpu.ogg.seek import walk_pages
                from parseoggvorbis_tpu.runtime.batch import \
                    decode_bytes_recover

                audio_pages = walk_pages(ogg).audio_pages
                if audio_pages:
                    v = audio_pages[int(rng.randint(0, len(audio_pages)))]
                    blob = bytearray(ogg)
                    pos = v.offset + int(rng.randint(0, v.end - v.offset))
                    blob[pos] ^= 1 << int(rng.randint(0, 8))
                    try:
                        rec = decode_bytes_recover(bytes(blob))
                        mask = np.ones(
                            min(rec.pcm.shape[1], ours.pcm.shape[1]), bool)
                        for a, b in rec.holes + rec.approximate:
                            mask[a:min(b, len(mask))] = False
                        d = rec.pcm[:, :len(mask)][:, mask] \
                            - ours.pcm[:, :len(mask)][:, mask]
                        rec_ok = (rec.damage == [(v.offset, v.end)]
                                  and (d.size == 0
                                       or float(np.abs(d).max()) <= 2e-6))
                    except Exception as exc:
                        print("    recover raised: %s" % (exc,))
                        rec_ok = False
                    if not rec_ok:
                        fails += 1
                        status = "FAIL(recover)"
                    extra += " +recover@p%d" % v.seq
            # CRC-resealed payload mutations must full-decode or reject
            # cleanly, never crash (see tests/tools/page_mutate.py)
            if args.mutate:
                from page_mutate import flip_payload_bit, page_spans

                from parseoggvorbis_tpu.utils.errors import ParseError

                spans = page_spans(ogg)
                nmut_ok = 0
                for _ in range(args.mutate):
                    blob = flip_payload_bit(ogg, rng, spans=spans)
                    try:
                        decode_bytes(blob)
                        nmut_ok += 1
                    except (ParseError, ValueError, AssertionError,
                            RuntimeError):
                        pass
                extra += " +mut%d/%d" % (nmut_ok, args.mutate)
            prev = (ogg, ref)
        print("%3d: ch=%d rate=%5d %-8s %5.2fs -> %7d B  err=%.2e  %s%s"
              % (i, pcm.shape[0], rate, mode, pcm.shape[1] / rate, len(ogg),
                 err, status, extra), flush=True)
    print("worst err: %.3e   failures: %d/%d" % (worst, fails, args.iters))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

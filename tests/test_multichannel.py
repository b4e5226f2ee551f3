"""Multichannel (5.1-style) decode paths on synthetic streams.

No 6-channel test asset exists (the reference ships none either), so these
tests build a synthetic 6-channel StreamFrames with chained couplings and
mixed blocksizes and verify the batched device pipeline against the
independent scalar numpy numerics — exercising exactly the channel-topology
code (coupling chains, per-channel floors, submap muxing shapes) that a
surround file would."""

import os
import sys

import numpy as np
import pytest

from parseoggvorbis_tpu.dsp.imdct import imdct, inverse_coupling
from parseoggvorbis_tpu.dsp.tables import INVERSE_DB_TABLE
from parseoggvorbis_tpu.runtime.batch import ModeInfo, StreamFrames, overlap_add
from parseoggvorbis_tpu.vorbis.mode import make_window

C = 6
COUPLINGS = ((0, 1), (2, 3), (4, 5), (0, 2))  # chained, like 5.1 mappings
BS0, BS1 = 256, 1024


def _make_stream(rng, t=24):
    """Synthetic StreamFrames with random residues/floors, 2 modes."""
    modes = []
    for block_flag in (False, True):
        n = BS1 if block_flag else BS0
        windows = (np.stack([
            make_window(n, (BS1 if i & 1 else BS0) // 2,
                        (BS1 if i & 2 else BS0) // 2) for i in range(4)
        ]) if block_flag else make_window(BS0, BS0 // 2, BS0 // 2)[None])
        modes.append(ModeInfo(block_flag=block_flag, couplings=COUPLINGS,
                              blocksize=n, windows=windows))

    # legal window-flag sequence: long frames carry (prev,next) short flags
    mode_idx = rng.randint(0, 2, t).astype(np.int32)
    mode_idx[0] = 1
    win_sel = np.zeros(t, np.int32)
    frame_n = np.where(mode_idx == 1, BS1, BS0).astype(np.int32)
    for i in range(t):
        if mode_idx[i] == 1:
            prev_short = i > 0 and mode_idx[i - 1] == 0
            next_short = i + 1 < t and mode_idx[i + 1] == 0
            win_sel[i] = (0 if prev_short else 1) + (0 if next_short else 2)

    frames = {}
    for m in (0, 1):
        ids = np.nonzero(mode_idx == m)[0]
        n = modes[m].blocksize
        half = n // 2
        b = len(ids)
        # residues from a small value lattice (exercises dict coding)
        lattice = np.array([-7.5, -2.5, -1.0, 0.0, 1.0, 2.5, 7.5], np.float32)
        residue = lattice[rng.randint(0, len(lattice), (b, C, half))]
        curve = rng.randint(0, 256, (b, C, half)).astype(np.uint8)
        decoded = rng.rand(b, C) > 0.3
        used = decoded.copy()
        for mag, ang in COUPLINGS:
            both = used[:, mag] | used[:, ang]
            used[:, mag] = both
            used[:, ang] = both
        residue[~used] = 0.0
        curve[~decoded] = 0
        frames[m] = (ids, residue, curve, decoded, used)

    def exporter(frame_ids, n):
        m = 1 if n == BS1 else 0
        ids, residue, curve, decoded, used = frames[m]
        sel = np.searchsorted(ids, frame_ids)
        return curve[sel], decoded[sel], used[sel], residue[sel]

    granules = np.full(t, -1, dtype=np.int64)
    # total samples = sum of emissions
    total = sum(int(frame_n[i - 1] // 4 + frame_n[i] // 4) for i in range(1, t))
    granules[-1] = total

    return StreamFrames(
        sample_rate=48000, channels=C, blocksize0=BS0, blocksize1=BS1,
        mode_idx=mode_idx, win_sel=win_sel, frame_n=frame_n,
        granules=granules, modes=modes, exporter=exporter,
        floors=None, mode_floor_numbers=None, exporter_ys=None,
    ), frames


def _scalar_reference(sf, frames):
    """Independent numpy decode of the synthetic stream."""
    windowed = []
    for tt in range(sf.num_frames):
        m = int(sf.mode_idx[tt])
        mi = sf.modes[m]
        n = mi.blocksize
        half = n // 2
        ids, residue, curve, decoded, used = frames[m]
        i = int(np.searchsorted(ids, tt))
        res = residue[i].copy()
        for mag, ang in reversed(COUPLINGS):
            res[mag], res[ang] = inverse_coupling(res[mag], res[ang])
        env = INVERSE_DB_TABLE[curve[i].astype(np.int64)]
        env = env * decoded[i][:, None]
        spec = res * np.where(used[i][:, None], env, 1.0)
        pcm = imdct(spec)
        w = mi.windows[sf.win_sel[tt] if mi.block_flag else 0]
        windowed.append((pcm * w).astype(np.float32))
    return overlap_add(sf, windowed)


def test_six_channel_device_vs_scalar():
    from parseoggvorbis_tpu.runtime.device_decoder import launch_stream_decode

    rng = np.random.RandomState(3)
    sf, frames = _make_stream(rng)
    ref = _scalar_reference(sf, frames)
    pending = launch_stream_decode(sf)
    pcm = pending.fetch()
    assert pcm.shape == ref.pcm.shape
    assert pcm.shape[0] == C
    # device runs f32 (HIGHEST), reference accumulates f64; synthetic
    # residues are large so compare relative to the signal scale
    scale = max(1.0, float(np.abs(ref.pcm).max()))
    err = np.max(np.abs(pcm - ref.pcm)) / scale
    assert err < 2e-6, err


def test_six_channel_corpus_stacked():
    from parseoggvorbis_tpu.runtime.device_decoder import launch_corpus_decode

    rng = np.random.RandomState(5)
    streams = []
    refs = []
    for _ in range(4):
        sf, frames = _make_stream(rng)
        streams.append(sf)
        refs.append(_scalar_reference(sf, frames))
    pendings = launch_corpus_decode(streams)
    for sf, pending, ref in zip(streams, pendings, refs):
        pcm = pending.fetch()
        scale = max(1.0, float(np.abs(ref.pcm).max()))
        err = np.max(np.abs(pcm - ref.pcm)) / scale
        assert err < 2e-6, err


def test_over64_coupling_steps_native_frontend_vs_python_vs_oracle():
    """>64 square-polar coupling steps (legal: spec allows up to 256; no
    encoder emits them).  Review finding: the native binding's fixed
    64-pair buffer silently DROPPED steps 65+ — the native-frontend device
    decode returned corrupted PCM with no error while the python front-end
    and the scalar routes applied all steps."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from make_synth_vorbis import SynthStream

    from parseoggvorbis_tpu.native import frontend as native
    from parseoggvorbis_tpu.runtime.batch import (decode_corpus,
                                                  parse_streams,
                                                  parse_streams_python)

    blob = SynthStream(seed=3, floor_kind="mixed",
                       coupling_steps=65).make(num_frames=6)
    py = parse_streams_python(blob)[0]
    assert len(py.modes[0].couplings) == 65
    if native.available():
        nat = parse_streams(blob, prefer_native=True)[0]
        assert [m.couplings for m in nat.modes] == \
            [m.couplings for m in py.modes]
    out = decode_corpus([blob])[0]
    assert out.ok
    try:
        from vorbis_oracle import available as _ok, decode_ogg
    except ImportError:
        return
    if _ok():
        ref, _ = decode_ogg(blob)
        scale = max(1.0, float(np.abs(ref).max()))
        assert np.abs(out.pcm - ref).max() <= 2e-6 * scale

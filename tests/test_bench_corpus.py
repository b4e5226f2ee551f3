"""The varied bench corpus must decode bit-faithfully vs system libvorbis.

Covers what the two golden files cannot: 5.1 coupling, single-blocksize
(512/512, 1024/1024) low-rate streams, short-block-heavy speech, a >60 s
stream (chunked device decode), and high/low VBR extremes.  The oracle is
the *system* libvorbisfile driven via ctypes (tests/tools/vorbis_oracle.py)
— fully independent of the committed reference dumps.
"""

import glob
import os
import sys

import numpy as np
import pytest

from conftest import REPO_ROOT

sys.path.insert(0, os.path.join(REPO_ROOT, "tests", "tools"))

import vorbis_oracle

BENCH_DIR = os.path.join(REPO_ROOT, "tests", "data", "bench")
FILES = sorted(glob.glob(os.path.join(BENCH_DIR, "*.ogg")))

pytestmark = pytest.mark.skipif(
    not vorbis_oracle.available(), reason="system libvorbis not installed")


def test_corpus_exists():
    names = {os.path.basename(p) for p in FILES}
    assert "long64s.stereo.44k.q3.ogg" in names          # >=60s, chunked
    assert "surround6s.5_1.44k.q4.ogg" in names          # 6 channels
    assert "lowrate8s.mono.8k.q_1.ogg" in names          # 512/512 blocks
    assert "midrate8s.stereo.16k.q0.ogg" in names        # 1024/1024 blocks
    assert len(names) >= 8


@pytest.mark.parametrize("path", FILES, ids=[os.path.basename(p) for p in FILES])
def test_corpus_file_matches_system_libvorbis(path):
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    data = open(path, "rb").read()
    ours = decode_bytes(data)
    ref, rate = vorbis_oracle.decode_ogg(data)
    assert ours.sample_rate == rate
    assert ours.pcm.shape == ref.shape
    err = float(np.abs(ours.pcm - ref).max())
    assert err <= 1e-6, err


def test_decodes_streams_the_reference_crashes_on():
    """The reference C++ decoder asserts out on 0-bit reads (readBits(0)
    for the mode number when a stream has a single mode/blocksize,
    /root/reference/src/Utils.hpp:347); the spec says reading zero bits
    yields zero.  We decode these streams correctly — beyond-parity
    format coverage, exercised by the two low-rate corpus files."""
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    for name in ("lowrate8s.mono.8k.q_1.ogg", "midrate8s.stereo.16k.q0.ogg"):
        data = open(os.path.join(BENCH_DIR, name), "rb").read()
        out = decode_bytes(data)
        assert out.ok and out.num_samples > 0


@pytest.mark.parametrize("kind", ["floor_final_ys", "residue_ys"])
def test_batched_features_match_dump_path_on_corpus(kind):
    """The dump-free batched feature path must be bit-equal to the
    reference-semantics dump path on the varied corpus (5.1, low-rate,
    high-bitrate) — not just the golden files."""
    import numpy as np

    from parseoggvorbis_tpu.features.batched import get_features_batched
    from parseoggvorbis_tpu.features.lib import ParseOggVorbisLib

    names = ["surround6s.5_1.44k.q4.ogg", "lowrate8s.mono.8k.q_1.ogg",
             "music8s.stereo.44k.q8.ogg"]
    blobs = [open(os.path.join(BENCH_DIR, n), "rb").read() for n in names]
    batched = get_features_batched(blobs, 64, kind=kind)
    lib = ParseOggVorbisLib.get_instance()
    for name, blob, got in zip(names, blobs, batched):
        ref = lib.get_features_from_raw_bytes(blob, 64, kind=kind)
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        np.testing.assert_array_equal(got, ref, err_msg=name)


def test_uncoupled_multichannel_residue_order():
    """Regression: multichannel UNCOUPLED residues (4ch, no coupling pairs)
    decode with the spec's partition advance (8.6.2 step 6: once per
    partition, after the channel loop).  The reference advances per
    channel — a latent bug its single-channel test files never hit — and
    this framework inherited it until tools/fuzz_roundtrip.py caught a
    ~1.0 max-abs misdecode vs system libvorbis on 4/6ch low-rate streams."""
    import numpy as np

    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    path = os.path.join(REPO_ROOT, "tests", "data", "quad4s.4ch.32k.q5.ogg")
    data = open(path, "rb").read()
    ref, rate = vorbis_oracle.decode_ogg(data)
    for prefer_native in (True, False):
        ours = decode_bytes(data, prefer_native=prefer_native)
        assert ours.pcm.shape == ref.shape
        err = float(np.abs(ours.pcm - ref).max())
        assert err <= 1e-6, (prefer_native, err)


def test_pipelined_midcorpus_fetch_matches_tail_fetch(monkeypatch):
    """POV_PIPELINE_FETCH (off by default; see device_decoder._PIPELINE_FRAC)
    must produce byte-identical PCM: the mid-corpus wave fetch and the tail
    fused fetch split the same device buffers."""
    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    blobs = []
    for name in ("test.stereo44khz.ogg", "test.mono44khz.ogg"):
        with open(os.path.join(REPO_ROOT, "tests", "data", name), "rb") as f:
            blobs.append(f.read())
    blobs = blobs * 3
    base = decode_corpus(blobs, out_i16=True)
    monkeypatch.setattr(dd, "_PIPELINE_FRAC", 0.3)
    piped = decode_corpus(blobs, out_i16=True)
    assert len(base) == len(piped) == len(blobs)
    for a, b in zip(base, piped):
        assert a.ok and b.ok
        np.testing.assert_array_equal(a.pcm, b.pcm)

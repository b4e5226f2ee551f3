"""End-to-end 8192-blocksize decode (round-2 VERDICT item 5).

libvorbis's ENCODER tops out at 2048-sample blocks, so no encoder-made
corpus reaches the spec's 8192 ceiling — but its DECODER accepts the full
64..8192 range, which makes it an independent oracle for hand-authored
streams.  tests/tools/make_synth_vorbis.py writes legal streams from
scratch (real floor-1 + type-1 residues + VQ books); here they decode
through the full production pipeline — both IMDCT implementations — and
must match the system libvorbis within the project eps.
"""

import os
import sys

import numpy as np
import pytest

from conftest import REPO_ROOT

sys.path.insert(0, os.path.join(REPO_ROOT, "tests", "tools"))

from make_synth_vorbis import make_8192_stream  # noqa: E402


@pytest.fixture(scope="module")
def oracle():
    import vorbis_oracle

    if not vorbis_oracle.available():
        pytest.skip("system libvorbis not available")
    return vorbis_oracle


@pytest.mark.parametrize("mixed", [True, False],
                         ids=["mixed4096_8192", "single8192"])
@pytest.mark.parametrize("imdct", ["fft", "matmul"])
def test_8192_end_to_end_vs_libvorbis(oracle, mixed, imdct, monkeypatch):
    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    monkeypatch.setattr(dd, "_FFT_IMDCT_MIN_N",
                        8192 if imdct == "fft" else 1 << 20)
    blob = make_8192_stream(seed=1, num_frames=16, mixed=mixed)
    ours = decode_bytes(blob)
    ref, rate = oracle.decode_ogg(blob)
    assert ours.sample_rate == rate
    assert ours.pcm.shape == ref.shape
    # f32 IMDCT at n=8192 accumulates 4096 terms; both decoders agree to
    # ~6e-6 (the differential-test eps is 1e-5, compare-debug-out.py:90)
    assert float(np.abs(ours.pcm - ref).max()) <= 1e-5


def test_8192_native_and_python_frontends_agree(oracle):
    from parseoggvorbis_tpu.native.frontend import available
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    blob = make_8192_stream(seed=2, num_frames=12)
    py = decode_bytes(blob, prefer_native=False)
    if available():
        nat = decode_bytes(blob, prefer_native=True)
        np.testing.assert_array_equal(py.pcm, nat.pcm)
    ref, _ = oracle.decode_ogg(blob)
    assert py.pcm.shape == ref.shape


def test_8192_granule_truncation(oracle):
    """A truncating final granule must shorten the 8192 stream identically
    in both decoders."""
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    blob = make_8192_stream(seed=3, num_frames=10, truncate_final=777)
    ours = decode_bytes(blob)
    ref, _ = oracle.decode_ogg(blob)
    assert ours.pcm.shape == ref.shape
    assert float(np.abs(ours.pcm - ref).max()) <= 1e-5


def test_8192_streaming_and_features():
    """The streaming front-end and the device feature path accept 8192
    streams too (every n in 64..8192 is product-real, not kernel-test-real)."""
    from parseoggvorbis_tpu.native.frontend import available
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    blob = make_8192_stream(seed=4, num_frames=12)
    whole = decode_bytes(blob, prefer_native=False)
    if available():
        from parseoggvorbis_tpu.features import batched
        from parseoggvorbis_tpu.features.device import get_features_device
        from parseoggvorbis_tpu.runtime.batch import decode_bytes_streaming

        got = decode_bytes_streaming(blob, chunk_frames=5).read_all()
        assert got.pcm.shape == whole.pcm.shape
        np.testing.assert_allclose(got.pcm, whole.pcm, atol=2e-6, rtol=0)
        want = batched.get_features(blob, 64, "floor_final_ys_rendered")
        dev = get_features_device(blob, 64, "floor_final_ys_rendered")
        np.testing.assert_array_equal(dev, want)


def test_8192_floor0_intersection(oracle):
    """LSP floors at the spec's largest blocksize — two beyond-parity
    surfaces composed (neither exists in any encoder-generated corpus)."""
    from make_synth_vorbis import make_floor0_stream
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    blob = make_floor0_stream(seed=7, num_frames=10, bs0=4096, bs1=8192)
    ref, _ = oracle.decode_ogg(blob)
    ours = decode_bytes(blob)
    assert ours.pcm.shape == ref.shape
    scale = max(float(np.abs(ref).max()), 1e-20)
    assert float(np.abs(ours.pcm - ref).max()) / scale <= 1e-5


@pytest.mark.parametrize("seed", [0, 1])
def test_residue_type0_end_to_end(oracle, seed):
    """Residue type 0 (stride-interleaved format, spec 8.6.3) end-to-end
    vs the system libvorbis — the corpus and every encoder-made stream use
    types 1/2, so this surface only exists via the synthetic writer (types
    0 and 1 share the bitstream layout; only the decode interleave
    differs)."""
    from make_synth_vorbis import SynthStream
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    blob = SynthStream(bs0=512, bs1=2048, seed=seed,
                       residue_type=0).make(num_frames=14)
    ref, _ = oracle.decode_ogg(blob)
    ours = decode_bytes(blob)
    assert ours.pcm.shape == ref.shape
    scale = max(float(np.abs(ref).max()), 1e-20)
    assert float(np.abs(ours.pcm - ref).max()) / scale <= 1e-5


def test_residue_type0_python_frontend_and_scalar_cli(tmp_path, capsys):
    """The PYTHON front-end and the scalar CLI pipeline also decode the
    type-0 interleave (Residue._accumulate_partition's rtype==0 branch;
    the batch tests above exercise only the native front-end)."""
    from make_synth_vorbis import SynthStream
    from parseoggvorbis_tpu import cli
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    blob = SynthStream(bs0=512, bs1=2048, seed=0,
                       residue_type=0).make(num_frames=14)
    nat = decode_bytes(blob)
    py = decode_bytes(blob, prefer_native=False)
    assert py.pcm.shape == nat.pcm.shape
    np.testing.assert_array_equal(py.pcm, nat.pcm)

    path = str(tmp_path / "type0.ogg")
    open(path, "wb").write(blob)
    assert cli.main(["cli", "--in", path]) == 0
    out = capsys.readouterr().out
    assert "got eof. sample count: %d" % nat.num_samples in out

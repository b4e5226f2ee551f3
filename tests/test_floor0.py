"""Floor0 (LSP) decode — BEYOND the reference's parity.

The reference parses floor0 headers and rejects decode
(/root/reference/src/ParseOggVorbis.hpp:400-405); we implement spec 6.2
fully, in all three host paths (Python, native C++, streaming) and in the
device pipeline (float envelopes ship as f32, bypassing the inverse-dB
table).  The oracle is the system libvorbis decoding synthetic floor0
streams (tests/tools/make_synth_vorbis.py) — no mainstream encoder emits
floor type 0, so this surface exists in no encoder-generated corpus.

Tolerances: the envelope is exp(dB)-scaled, so comparisons are relative.
Our float ops mirror the libvorbis float implementation; the residual
(~5e-7 rel) is transcendental-libm-level.  Python vs native differ at the
same level (numpy vs libm cos/exp), asserted <=1e-6 rel.
"""

import os
import sys

import numpy as np
import pytest

from conftest import REPO_ROOT

sys.path.insert(0, os.path.join(REPO_ROOT, "tests", "tools"))

from make_synth_vorbis import SynthStream, make_floor0_stream  # noqa: E402


@pytest.fixture(scope="module")
def oracle():
    import vorbis_oracle

    if not vorbis_oracle.available():
        pytest.skip("system libvorbis not available")
    return vorbis_oracle


def _rel_err(a, b):
    scale = max(float(np.abs(b).max()), 1e-20)
    return float(np.abs(a - b).max()) / scale


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_floor0_vs_libvorbis(oracle, seed):
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    blob = make_floor0_stream(seed=seed, num_frames=14)
    ref, rate = oracle.decode_ogg(blob)
    ours = decode_bytes(blob, prefer_native=False)
    assert ours.sample_rate == rate
    assert ours.pcm.shape == ref.shape
    assert _rel_err(ours.pcm, ref) <= 1e-5


def test_floor0_native_frontend(oracle):
    from parseoggvorbis_tpu.native.frontend import available
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    if not available():
        pytest.skip("native front-end not built")
    blob = make_floor0_stream(seed=3, num_frames=14)
    py = decode_bytes(blob, prefer_native=False)
    nat = decode_bytes(blob, prefer_native=True)
    assert py.pcm.shape == nat.pcm.shape
    # numpy and libm transcendentals differ at the ulp level; everything
    # else in the two front-ends is identical
    assert _rel_err(nat.pcm, py.pcm) <= 1e-6
    ref, _ = oracle.decode_ogg(blob)
    assert _rel_err(nat.pcm, ref) <= 1e-5


def test_floor0_scalar_streaming_decoder(oracle):
    """The reference-shaped scalar path (OggReader + ParseCallbacks +
    debug taps) decodes floor0 too."""
    from parseoggvorbis_tpu.runtime.decoder import OggReader, ParseCallbacks

    blob = make_floor0_stream(seed=4, num_frames=10)

    class Collect(ParseCallbacks):
        def __init__(self):
            self.chunks = []

        def got_pcm_data(self, pcm):
            self.chunks.append(np.array(pcm))
            return True

    cb = Collect()
    OggReader(cb).full_read_from_memory(blob)
    pcm = np.concatenate(cb.chunks, axis=1)
    ref, _ = oracle.decode_ogg(blob)
    assert pcm.shape == ref.shape
    assert _rel_err(pcm, ref) <= 1e-5


def test_floor0_streaming_windows(oracle):
    from parseoggvorbis_tpu.native.frontend import available
    from parseoggvorbis_tpu.runtime.batch import (decode_bytes,
                                                  decode_bytes_streaming)

    if not available():
        pytest.skip("native front-end not built")
    blob = make_floor0_stream(seed=5, num_frames=20)
    whole = decode_bytes(blob)
    got = decode_bytes_streaming(blob, chunk_frames=6).read_all()
    assert got.pcm.shape == whole.pcm.shape
    assert _rel_err(got.pcm, whole.pcm) <= 1e-6


def test_floor0_unused_channel_frames(oracle):
    """amplitude == 0 marks the channel unused (no coefficients, no
    residue reads); seeds are chosen so such frames occur."""
    from parseoggvorbis_tpu.runtime.batch import parse_stream

    def has_unused(sf):
        for m in sorted(set(sf.mode_idx.tolist())):
            ids = np.nonzero(sf.mode_idx == m)[0]
            _, decoded, _, _ = sf.exporter(ids, int(sf.frame_n[ids[0]]))
            if not decoded.all():
                return True
        return False

    for seed in range(8):
        blob = make_floor0_stream(seed=seed, num_frames=16)
        if has_unused(parse_stream(blob, prefer_native=False)):
            break
    else:
        pytest.skip("no unused-channel frame in sampled seeds")
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    ref, _ = oracle.decode_ogg(blob)
    ours = decode_bytes(blob, prefer_native=False)
    assert ours.pcm.shape == ref.shape
    assert _rel_err(ours.pcm, ref) <= 1e-5


def test_floor0_scalar_c_path_dump_parity(tmp_path):
    """The native scalar C path (pov_decode, the reference-CLI twin)
    decodes floor0 and its tap dump diffs clean against the Python scalar
    decoder's dump."""
    import subprocess

    from parseoggvorbis_tpu.native.frontend import available
    from parseoggvorbis_tpu.tools.compare import compare_dumps

    if not available():
        pytest.skip("native front-end not built")
    binary = os.path.join(REPO_ROOT, "parseoggvorbis_tpu", "native",
                          "pov_decode")
    if not os.path.exists(binary):
        pytest.skip("pov_decode binary not built")
    blob = make_floor0_stream(seed=6, num_frames=10)
    ogg = tmp_path / "f0.ogg"
    ogg.write_bytes(blob)
    nat_dump = tmp_path / "nat.dump"
    subprocess.run([binary, "--in", str(ogg), "--debug_out", str(nat_dump)],
                   check=True, capture_output=True)
    py_dump = tmp_path / "py.dump"
    subprocess.run(
        [sys.executable, "-m", "parseoggvorbis_tpu.cli", "--in", str(ogg),
         "--debug_out", str(py_dump)],
        check=True, capture_output=True, cwd=REPO_ROOT)
    # float taps within eps (ulp-level libm vs numpy transcendentals;
    # floor0 PCM can reach ~1e3, so the eps here is scaled up)
    packets = compare_dumps(str(py_dump), str(nat_dump), eps=0.02)
    assert packets == 10


@pytest.mark.parametrize("seed", [0, 1])
def test_mixed_floor0_floor1_mapping(oracle, seed):
    """A mapping with ch0 on a floor0 submap and ch1 on a floor1 submap:
    the env export must carry BOTH channels' envelopes (a native bug this
    test was written against: floor1 channels shipped zero envelopes when
    any floor0 channel was present)."""
    from make_synth_vorbis import SynthStream
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    blob = SynthStream(bs0=512, bs1=2048, seed=seed,
                       floor_kind="mixed").make(num_frames=14)
    ref, _ = oracle.decode_ogg(blob)
    assert ref.shape[0] == 2
    py = decode_bytes(blob, prefer_native=False)
    assert py.pcm.shape == ref.shape
    assert _rel_err(py.pcm, ref) <= 1e-5
    from parseoggvorbis_tpu.native.frontend import available

    if available():
        nat = decode_bytes(blob, prefer_native=True)
        assert _rel_err(nat.pcm, ref) <= 1e-5
        # the floor1 channel must NOT be silent (the regression's symptom)
        assert float(np.abs(nat.pcm[1]).max()) > 0


def test_floor0_feature_path_matches_reference_posture():
    """Feature extraction on a floor0-only stream fails identically to the
    reference Python stack (no floor1 setup taps -> assertion)."""
    from parseoggvorbis_tpu.features import batched
    from parseoggvorbis_tpu.native.frontend import available

    if not available():
        pytest.skip("native front-end not built")
    blob = make_floor0_stream(seed=0, num_frames=6)
    with pytest.raises(AssertionError):
        batched.get_features(blob, 64, "floor_final_ys")


@pytest.mark.parametrize("order", [3, 5])
def test_floor0_odd_order_vs_libvorbis(oracle, order):
    """Odd LSP orders take the distinct p/q product tail (spec 6.2.3's
    'm is odd' case — floor.py Floor0.curve's odd branch; libvorbis
    vorbis_lsp_to_curve's m&1 path).  Even orders (the writer's default)
    never execute it, so this is its only oracle coverage."""
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    blob = SynthStream(bs0=512, bs1=2048, seed=1, floor_kind="floor0",
                       lsp_order=order).make(num_frames=14)
    ref, rate = oracle.decode_ogg(blob)
    ours = decode_bytes(blob, prefer_native=False)
    assert ours.sample_rate == rate
    assert ours.pcm.shape == ref.shape
    assert _rel_err(ours.pcm, ref) <= 1e-5
    from parseoggvorbis_tpu.native.frontend import available

    if available():
        nat = decode_bytes(blob, prefer_native=True)
        assert _rel_err(nat.pcm, ref) <= 1e-5


@pytest.mark.parametrize("order,dims", [(5, 3), (6, 4)])
def test_floor0_multi_vector_block_offset(oracle, order, dims):
    """order > book dims: the channel ships ceil(order/dims) VQ vectors and
    each later block is offset by the previous block's last value (spec
    6.2.2 'cumulative block offset' — floor.py decode_coeffs' multi-vector
    loop; libvorbis floor0 inverse1's `last` carry).  Single-vector
    streams (every other floor0 test) never execute the carry."""
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    blob = SynthStream(bs0=512, bs1=2048, seed=2, floor_kind="floor0",
                       lsp_order=order, lsp_dims=dims).make(num_frames=12)
    ref, rate = oracle.decode_ogg(blob)
    scale = max(float(np.abs(ref).max()), 1e-20)
    assert np.isfinite(ref).all()
    ours = decode_bytes(blob)
    assert ours.pcm.shape == ref.shape
    assert float(np.abs(ours.pcm - ref).max()) / scale <= 1e-5
    py = decode_bytes(blob, prefer_native=False)
    assert float(np.abs(py.pcm - ref).max()) / scale <= 1e-5


@pytest.mark.parametrize("amp_bits", [33, 58, 63])
def test_floor0_wide_amplitude_bits(amp_bits):
    """ampbits > 32 (spec allows up to 63; read(6)) — beyond libvorbis'
    oggpack_read limit, so the two front-ends pin each other: the native
    BitReader serves >57-bit misaligned reads through peek_slow and the
    amplitude must not be 32-bit truncated (a truncation can flip a used
    channel to unused).  Python (arbitrary-precision reads) == native
    bit-equal, with at least one genuinely used floor0 frame."""
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    from make_synth_vorbis import SynthStream

    blob = SynthStream(bs0=512, bs1=512, seed=7, floor_kind="floor0",
                       amp_bits=amp_bits).make(num_frames=16)
    py = decode_bytes(blob, prefer_native=False)
    nat = decode_bytes(blob, prefer_native=True)
    assert py.pcm.shape == nat.pcm.shape
    np.testing.assert_array_equal(py.pcm, nat.pcm)
    # the wide-amp path must actually render: a truncated-to-zero (or
    # negative) amplitude chain would emit all-silent PCM
    assert float(np.abs(py.pcm).max()) > 0.0

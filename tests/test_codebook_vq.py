"""VQ table construction edge cases, parsed from hand-written bitstreams.

``sequence_p`` (spec 3.2.1 step 10: each dimension adds the previous
dimension's stored value) is never set by libvorbis' encoder, so no
encoder-generated corpus covers it — these build codebook headers with
the synthetic writer's BitWriter and check the cumulative semantics
against hand computation for both lookup types.
"""

import os
import sys

import numpy as np
import pytest

from conftest import REPO_ROOT

sys.path.insert(0, os.path.join(REPO_ROOT, "tests", "tools"))

from make_synth_vorbis import BitWriter, float32_pack  # noqa: E402

from parseoggvorbis_tpu.utils.bitreader import BitReader  # noqa: E402
from parseoggvorbis_tpu.utils.errors import ParseError  # noqa: E402
from parseoggvorbis_tpu.vorbis.codebook import Codebook  # noqa: E402


def _book_bits(dims, entries, lengths, lookup, mults, seq_p,
               minimum=0.0, delta=0.5, value_bits=4):
    w = BitWriter()
    w.write(0x564342, 24)  # sync
    w.write(dims, 16)
    w.write(entries, 24)
    w.write(0, 1)  # not ordered
    w.write(0, 1)  # not sparse
    for ln in lengths:
        w.write(ln - 1, 5)
    w.write(lookup, 4)
    if lookup:
        w.write(float32_pack(minimum), 32)
        w.write(float32_pack(delta), 32)
        w.write(value_bits - 1, 4)
        w.write(1 if seq_p else 0, 1)
        for m in mults:
            w.write(m, value_bits)
    return w.getvalue()


def test_lookup1_sequence_p_cumulative():
    # entries=4 dims=2 -> lookup1_values = 2 multiplicands [1, 2]
    blob = _book_bits(2, 4, [2, 2, 2, 2], 1, [1, 2], seq_p=True)
    cb = Codebook.parse(BitReader(blob))
    # dim0: mult[idx % 2] * .5; dim1: mult[idx // 2 % 2] * .5 + dim0
    expect = np.array([[0.5, 1.0], [1.0, 1.5], [0.5, 1.5], [1.0, 2.0]],
                      dtype=np.float32)
    np.testing.assert_array_equal(cb.vq_table, expect)
    # same book without sequence_p: independent dimensions
    cb0 = Codebook.parse(BitReader(_book_bits(2, 4, [2] * 4, 1, [1, 2],
                                              seq_p=False)))
    np.testing.assert_array_equal(
        cb0.vq_table,
        np.array([[0.5, 0.5], [1.0, 0.5], [0.5, 1.0], [1.0, 1.0]],
                 dtype=np.float32))


def test_lookup2_sequence_p_cumulative():
    # lookup 2: entries*dims explicit multiplicands
    mults = [1, 2, 3, 4, 5, 6, 7, 8]
    blob = _book_bits(2, 4, [2, 2, 2, 2], 2, mults, seq_p=True)
    cb = Codebook.parse(BitReader(blob))
    m = np.array(mults, np.float64).reshape(4, 2) * 0.5
    expect = np.stack([m[:, 0], m[:, 1] + m[:, 0]], axis=1).astype(np.float32)
    np.testing.assert_array_equal(cb.vq_table, expect)


def test_lookup0_decode_vector_returns_none():
    blob = _book_bits(2, 4, [2, 2, 2, 2], 0, [], seq_p=False)
    cb = Codebook.parse(BitReader(blob))
    assert cb.vq_table is None or cb.lookup_type == 0
    assert cb.decode_vector(BitReader(b"\x00\x00")) is None


def test_underspecified_codebook_rejected():
    # three length-2 codewords leave a quarter of the code space unused
    with pytest.raises(ParseError, match="underspecified"):
        Codebook.parse(BitReader(_book_bits(1, 3, [2, 2, 2], 0, [],
                                            seq_p=False)))
    # and an overfull assignment is impossible to express canonically:
    # lengths [1, 1, 2] over-fill after the second entry
    with pytest.raises(ParseError, match="overspecified"):
        Codebook.parse(BitReader(_book_bits(1, 3, [1, 1, 2], 0, [],
                                            seq_p=False)))


def test_sequence_p_end_to_end_vs_libvorbis():
    """A full stream whose residue VQ book sets sequence_p, decoded by the
    system libvorbis and by both our front-ends — covers the cumulative
    path through setup parse, native VQ build, and the device pipeline."""
    import vorbis_oracle

    from make_synth_vorbis import SynthStream
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    if not vorbis_oracle.available():
        pytest.skip("system libvorbis not available")
    blob = SynthStream(bs0=512, bs1=2048, seed=0,
                       vq_sequence_p=True).make(num_frames=12)
    ref, rate = vorbis_oracle.decode_ogg(blob)
    scale = max(float(np.abs(ref).max()), 1e-20)
    ours = decode_bytes(blob)
    assert ours.sample_rate == rate and ours.pcm.shape == ref.shape
    assert float(np.abs(ours.pcm - ref).max()) / scale <= 1e-5
    py = decode_bytes(blob, prefer_native=False)
    np.testing.assert_array_equal(py.pcm, ours.pcm)


def test_single_entry_codebook_legal_iff_length1():
    """libvorbis' retconned extension (vorbis_sharedbook.c:126-130): ONE
    used entry of length 1 is legal; decode sinks one bit of either value
    and returns the entry.  Any other single-entry shape stays rejected."""
    cb = Codebook.parse(BitReader(_book_bits(1, 1, [1], 0, [], seq_p=False)))
    # both bit values decode to entry 0, consuming exactly one bit
    for byte in (b"\x00", b"\x01", b"\xff"):
        br = BitReader(byte)
        assert cb.decode_scalar(br) == 0
        assert br.bit_position == 1
    with pytest.raises(ParseError, match="underspecified"):
        Codebook.parse(BitReader(_book_bits(1, 1, [2], 0, [], seq_p=False)))
    # sparse book with a single used entry: same rule, entry keeps its index
    w = BitWriter()
    w.write(0x564342, 24)
    w.write(1, 16)   # dims
    w.write(4, 24)   # entries
    w.write(0, 1)    # not ordered
    w.write(1, 1)    # sparse
    for i, used in enumerate((0, 0, 1, 0)):
        w.write(used, 1)
        if used:
            w.write(0, 5)  # length 1
    w.write(0, 4)    # lookup 0
    cb = Codebook.parse(BitReader(w.getvalue()))
    br = BitReader(b"\xaa")
    assert cb.decode_scalar(br) == 2 and br.bit_position == 1


def test_single_entry_codebook_end_to_end_vs_libvorbis():
    """A stream whose floor1 Y reads go through a 1-used-entry codebook
    (libvorbis' retconned extension; no encoder emits one) decodes on the
    batch path AND the native route, matching the libvorbis oracle."""
    from make_synth_vorbis import SynthStream

    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    blob = SynthStream(seed=5, floor_kind="floor1",
                       single_entry_floor_book=True).make(num_frames=8)
    out = decode_corpus([blob])[0]
    assert out.ok, out.error
    from parseoggvorbis_tpu.native import frontend as native
    if native.available():
        nat = decode_corpus([blob], route="native")[0]
        assert nat.ok, nat.error
        np.testing.assert_allclose(nat.pcm, out.pcm, atol=1e-6)
    try:
        from vorbis_oracle import available, decode_ogg
    except ImportError:
        return
    if available():
        ref, _ = decode_ogg(blob)
        assert np.abs(out.pcm - ref).max() <= 1e-6


def test_zero_used_entry_codebook_accepted_unused():
    """A sparse codebook with ZERO used entries is legal (the oracle's
    vorbis_book_init_decode builds no tables for n==0 and returns success,
    vorbis_sharedbook.c:319-334); decoding THROUGH one fails at decode
    time, never at setup."""
    w = BitWriter()
    w.write(0x564342, 24)
    w.write(1, 16)   # dims
    w.write(3, 24)   # entries
    w.write(0, 1)    # not ordered
    w.write(1, 1)    # sparse
    for _ in range(3):
        w.write(0, 1)  # every used-flag 0
    w.write(0, 4)    # lookup 0
    cb = Codebook.parse(BitReader(w.getvalue()))
    assert cb.codewords == []
    with pytest.raises(ParseError):
        cb.decode_scalar(BitReader(b"\xff\xff"))


def test_zero_used_entry_codebook_end_to_end_vs_libvorbis():
    """A stream carrying an unused zero-used-entry codebook must decode on
    the batch path and the native route, matching the libvorbis oracle
    (review finding: both languages ran the underspecification check over
    the empty length list and rejected the whole stream at setup)."""
    from make_synth_vorbis import SynthStream

    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    blob = SynthStream(seed=7, floor_kind="floor1",
                       unused_empty_book=True).make(num_frames=8)
    out = decode_corpus([blob])[0]
    assert out.ok, out.error
    from parseoggvorbis_tpu.native import frontend as native
    if native.available():
        nat = decode_corpus([blob], route="native")[0]
        assert nat.ok, nat.error
        np.testing.assert_allclose(nat.pcm, out.pcm, atol=1e-6)
    try:
        from vorbis_oracle import available, decode_ogg
    except ImportError:
        return
    if available():
        ref, _ = decode_ogg(blob)
        assert np.abs(out.pcm - ref).max() <= 1e-6


@pytest.mark.parametrize("rtype", [0, 1])
def test_nondividing_vq_dims_clamp_vs_libvorbis(rtype):
    """VQ book dims that do NOT divide partition_size — legal, emitted by
    no encoder.  Format 1 truncates the final codeword of each partition
    (vorbis_book_decodev_add's k<n clamp, mirrored at
    native/pov_core.h's 'k-bound INSIDE the dims loop'); format 0 reads
    only floor(ps/dims) codewords (decodevs_add).  End-to-end vs the
    system libvorbis, Python and native front-ends bit-equal."""
    import vorbis_oracle

    from make_synth_vorbis import SynthStream
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    if not vorbis_oracle.available():
        pytest.skip("system libvorbis not available")
    blob = SynthStream(bs0=512, bs1=2048, seed=3, residue_type=rtype,
                       vq_dims=5).make(num_frames=12)
    ref, rate = vorbis_oracle.decode_ogg(blob)
    scale = max(float(np.abs(ref).max()), 1e-20)
    ours = decode_bytes(blob)
    assert ours.sample_rate == rate and ours.pcm.shape == ref.shape
    assert float(np.abs(ours.pcm - ref).max()) / scale <= 1e-5
    py = decode_bytes(blob, prefer_native=False)
    np.testing.assert_array_equal(py.pcm, ours.pcm)

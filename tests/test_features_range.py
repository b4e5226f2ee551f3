"""Ranged (crop) feature extraction — features/batched.get_features_range
and get_features_batched(ranges=...).

Contract: every row returned for a sample range is BIT-identical to the
corresponding row of the full extraction, and ``row_packets`` gives each
row's absolute audio-packet index so crops compose with full decodes.
Capability beyond the reference (its extractors always consume the file
from byte 0 — demo_live_extract.py reads whole-file dumps).

The row->packet bookkeeping is verified two independent ways: the
extractor state machines record the packet of every row they emit as
they replay the taps (extract.py ``row_frames``), while
``_row_frames_from_parsed`` derives the same mapping from the decode
flags alone; CI asserts they agree across kinds, channel counts and
floor configurations.
"""

import os

import numpy as np
import pytest

from conftest import DATA_DIR, MONO_OGG, STEREO_OGG

from parseoggvorbis_tpu.features.batched import (
    SyntheticTapReader,
    _extract,
    _row_frames_from_parsed,
    get_features,
    get_features_batched,
    get_features_range,
)
from parseoggvorbis_tpu.features.lib import DATA_FILTERS
from parseoggvorbis_tpu.native import frontend as native

BENCH = os.path.join(DATA_DIR, "bench")

_FILES = {
    "mono": MONO_OGG,
    "stereo": STEREO_OGG,
    "surround": os.path.join(BENCH, "surround6s.5_1.44k.q4.ogg"),
    "quad": os.path.join(DATA_DIR, "quad4s.4ch.32k.q5.ogg"),
}

# one kind per distinct row-emission rule (floor: decoded channels;
# floor+biggest filter; concat: floor rows extended in place; residue:
# biggest-floor channels regardless of decode)
_KINDS = [
    ("floor_final_ys", {}),
    ("floor_final_ys", {"only_biggest_floor": True}),
    ("floor_final_ys_rendered_concat_residue", {}),
    ("residue_ys", {}),
    ("residue_ys_with_floor", {}),
]


def _load(name):
    path = _FILES[name]
    if not os.path.exists(path):
        pytest.skip("corpus file not generated")
    return open(path, "rb").read()


def _full_with_rows(data, dim, kind, kwargs):
    """Full extraction + the extractor's own row->packet recording."""
    parsed = native.parse_stream_native(data)
    reader = SyntheticTapReader(parsed, DATA_FILTERS[kind])
    mat = _extract(reader, dim, kind, kwargs)
    return parsed, mat, reader.row_frames


@pytest.mark.parametrize("name", list(_FILES))
@pytest.mark.parametrize("kind,kw", _KINDS,
                         ids=[k + ("+big" if kw else "") for k, kw in _KINDS])
def test_row_frames_derivation_agrees_with_extractors(name, kind, kw):
    """_row_frames_from_parsed (flags-only derivation) == the row->packet
    stream the extractor state machines record while emitting rows."""
    data = _load(name)
    parsed, mat, rows = _full_with_rows(data, 48, kind, kw)
    derived = _row_frames_from_parsed(
        parsed, kind, only_biggest_floor=bool(kw.get("only_biggest_floor")))
    assert mat.shape[0] == rows.shape[0]
    np.testing.assert_array_equal(derived, rows)


@pytest.mark.parametrize("name", ["stereo", "surround"])
@pytest.mark.parametrize("kind,kw", _KINDS[:1] + _KINDS[3:4],
                         ids=["floor", "residue"])
def test_range_rows_bit_exact(name, kind, kw):
    data = _load(name)
    _, full, rows = _full_with_rows(data, 64, kind, kw)
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    total = decode_bytes(data).pcm.shape[1]
    ranges = [(0, 1000), (total // 3, total // 3 + 5000),
              (total // 2, None), (max(0, total - 300), total + 999)]
    for s, e in ranges:
        r = get_features_range(data, 64, s, e, kind=kind, **kw)
        # the covered packets are a contiguous window of the stream's
        # audio packets, and the rows are that window's slice of the
        # full matrix, bit-for-bit
        mask = np.isin(rows, r.row_packets)
        np.testing.assert_array_equal(rows[mask], r.row_packets)
        np.testing.assert_array_equal(full[mask], r.features)
        if rows.size:  # surround+residue has 0 rows file-wide (last-
            # channel floor 2 is never the biggest — the extractor quirk)
            assert r.features.shape[0] > 0
            # first covered frame <= first row's packet (the first covered
            # frames may emit no rows, e.g. short-block floors that are
            # not the biggest under the residue kinds' last-channel rule)
            assert 0 <= r.first_packet <= int(r.row_packets.min())
        # the reported sample window covers the request (clamped)
        assert r.start_sample <= s
        if e is not None and e <= total:
            assert r.end_sample >= e
        assert r.sample_rate > 0


def test_range_composition_covers_every_emitting_frame():
    """Adjacent crops tile the stream: the union of their row sets is
    exactly the rows of every PCM-emitting packet (a stream's first frame
    emits no PCM, so no time range can select it)."""
    data = _load("stereo")
    parsed, full, rows = _full_with_rows(data, 64, "floor_final_ys", {})
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    total = decode_bytes(data).pcm.shape[1]
    cuts = [0, total // 4, total // 2, 3 * total // 4, total]
    covered = set()
    for s, e in zip(cuts[:-1], cuts[1:]):
        r = get_features_range(data, 64, s, e)
        # boundary packets appear in both adjacent crops; all occurrences
        # must agree bit-for-bit with the full matrix's rows
        mask = np.isin(rows, r.row_packets)
        np.testing.assert_array_equal(rows[mask], r.row_packets)
        np.testing.assert_array_equal(full[mask], r.features)
        covered.update(r.row_packets.tolist())
    # every packet that both emits PCM and has rows is covered; packet 0
    # (a stream's first frame emits no PCM) is not
    emitting = _emitting_packets(parsed)
    assert covered == (emitting & set(rows.tolist()))
    assert 0 not in covered and len(covered) > 10


def _emitting_packets(parsed):
    from types import SimpleNamespace

    from parseoggvorbis_tpu.runtime import device_decoder as dd

    shim = SimpleNamespace(num_frames=len(parsed.frame_n),
                           frame_n=parsed.frame_n, granules=parsed.granules)
    nums = dd._compute_emission_nums(shim, abs_base=0)
    return set(np.nonzero(nums > 0)[0].tolist())


def test_range_empty_and_validation():
    data = _load("mono")
    r = get_features_range(data, 64, 10**9, None)
    assert r.features.shape == (0, 64) and r.row_packets.shape == (0,)
    assert r.first_packet == -1
    with pytest.raises(ValueError):
        get_features_range(data, 64, 0, None, kind="nope")


@pytest.mark.parametrize("device", [False, True], ids=["host", "device"])
def test_batched_ranges(device):
    """ranges= through the host and device batch flows: each ranged blob
    returns exactly get_features_range's rows; None entries are untouched;
    an empty range yields 0 rows without poisoning batchmates."""
    stereo, mono = _load("stereo"), _load("mono")
    blobs = [stereo, mono, stereo, mono]
    ranges = [(20000, 50000), None, (10**9, None), (0, 25000)]
    outs = get_features_batched(blobs, 64, ranges=ranges, device=device)
    assert np.array_equal(
        outs[0], get_features_range(stereo, 64, 20000, 50000).features)
    assert np.array_equal(outs[1], get_features(mono, 64))
    assert outs[2].shape == (0, 64)
    assert np.array_equal(
        outs[3], get_features_range(mono, 64, 0, 25000).features)
    with pytest.raises(ValueError):
        get_features_batched(blobs, 64, ranges=ranges[:2], device=device)


def test_batched_ranges_mesh():
    from parseoggvorbis_tpu.parallel.mesh import make_mesh

    stereo, mono = _load("stereo"), _load("mono")
    mesh = make_mesh(8, model=1)
    blobs = [stereo, mono, stereo]
    ranges = [(20000, 50000), (5000, 30000), (10**9, None)]
    outs = get_features_batched(blobs, 64, ranges=ranges, device=True,
                                mesh=mesh, kind="residue_ys")
    for out, blob, rng in zip(outs[:2], blobs[:2], ranges[:2]):
        want = get_features_range(blob, 64, rng[0], rng[1],
                                  kind="residue_ys").features
        assert out.shape == want.shape
        np.testing.assert_allclose(out, want, atol=1e-5, rtol=0)
    assert outs[2].shape == (0, 64)


def test_range_rows_on_singlethread_host_path():
    """host_threads=1 exercises the serial ranged-host branch."""
    mono = _load("mono")
    outs = get_features_batched([mono, mono], 64, host_threads=1,
                                ranges=[(0, 20000), None])
    assert np.array_equal(
        outs[0], get_features_range(mono, 64, 0, 20000).features)
    assert np.array_equal(outs[1], get_features(mono, 64))


@pytest.mark.parametrize("kind", ["floor_final_ys", "residue_ys"])
def test_stream_features_from_offset(kind):
    """stream_features_device(start_sample=N): windowed streaming from
    mid-file — concatenated rows equal the ranged extraction's (which are
    bit-identical to the full extraction's), at O(window) startup cost."""
    from parseoggvorbis_tpu.features.device import stream_features_device

    data = _load("stereo")
    for s in (20000, 89000):
        st = stream_features_device(data, 48, kind, window_frames=16,
                                    start_sample=s)
        assert st.output_dim == 48  # StreamingFeatures-compatible facade
        got = st.read_all()
        # this file has no zero-emission tail frames, so the suffix
        # equals the open-ended ranged extraction
        want = get_features_range(data, 48, s, None, kind=kind).features
        assert got.shape == want.shape
        if not np.array_equal(got, want):
            assert float(np.abs(got - want).max()) <= 1e-5
    assert list(stream_features_device(data, 48, kind,
                                       start_sample=10**9)) == []

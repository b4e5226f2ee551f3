"""CropLoader (parseoggvorbis_tpu/data.py): deterministic batched random-
crop sampling over a corpus, built on the ranged decode/feature paths.

Crops decode through decode_corpus(ranges=...) — already proven bit-equal
to slicing full decodes (test_seek.py) — so these tests focus on the
loader's own contract: deterministic (seed, step) sampling independent of
prefetch, zero-padding policy, channel validation, device/mesh placement,
and clean thread shutdown.
"""

import numpy as np
import pytest

from conftest import MONO_OGG, STEREO_OGG

from parseoggvorbis_tpu.data import CropLoader
from parseoggvorbis_tpu.runtime.batch import decode_bytes

CROP, BATCH = 4096, 2  # one executable signature shared by every test


def test_validation():
    with pytest.raises(ValueError):
        CropLoader([STEREO_OGG, MONO_OGG], CROP, BATCH)  # mixed channels
    with pytest.raises(ValueError):
        CropLoader([], CROP, BATCH)
    with pytest.raises(ValueError):
        CropLoader([MONO_OGG], CROP, BATCH, out="wat")
    with pytest.raises(ValueError):
        CropLoader([MONO_OGG], 0, BATCH)
    with pytest.raises(ValueError):
        CropLoader([MONO_OGG], CROP, BATCH, mesh=object())  # needs device


def test_plan_is_pure_in_seed_and_step():
    a = CropLoader([STEREO_OGG] * 3, CROP, 8, seed=5)
    b = CropLoader([STEREO_OGG] * 3, CROP, 8, seed=5, prefetch=7,
                   weight_by_duration=True)
    assert a._plan_step(4) == b._plan_step(4)
    assert a._plan_step(4) != a._plan_step(5)
    c = CropLoader([STEREO_OGG] * 3, CROP, 8, seed=6)
    assert a._plan_step(4) != c._plan_step(4)
    # uniform weighting is a different (still deterministic) sequence
    u = CropLoader([STEREO_OGG] * 3, CROP, 8, seed=5,
                   weight_by_duration=False)
    assert u._plan_step(4) == u._plan_step(4)
    # every plan stays inside the stream
    total = a._sources[0].total
    for i, (s, e) in a._plan_step(11):
        assert 0 <= s and e == s + CROP and e <= total


def test_pcm_crops_match_full_decode():
    full = decode_bytes(open(STEREO_OGG, "rb").read()).pcm
    ld = CropLoader([STEREO_OGG] * 2, CROP, BATCH, seed=7, steps=2)
    plans = [ld._plan_step(i) for i in range(2)]
    batches = list(ld)
    assert len(batches) == 2
    for step, batch in enumerate(batches):
        assert batch.shape == (BATCH, 2, CROP)
        for b, (_, (s, e)) in enumerate(plans[step]):
            want = full[:, s:e]
            got = batch[b]
            if not np.array_equal(got, want):
                assert float(np.abs(got - want).max()) <= 2e-6


def test_deterministic_across_prefetch_and_resume():
    ld = CropLoader([STEREO_OGG], CROP, BATCH, seed=3, steps=3, prefetch=1)
    ref = list(ld)
    again = list(CropLoader([STEREO_OGG], CROP, BATCH, seed=3, steps=3,
                            prefetch=3))
    assert all(np.array_equal(x, y) for x, y in zip(ref, again))
    tail = list(CropLoader([STEREO_OGG], CROP, BATCH, seed=3, steps=1,
                           start_step=2))
    assert np.array_equal(tail[0], ref[2])


def test_short_stream_zero_pads():
    data = open(MONO_OGG, "rb").read()
    full = decode_bytes(data).pcm
    total = full.shape[1]
    ld = CropLoader([MONO_OGG], total + 5000, 1, seed=0, steps=1)
    assert ld._plan_step(0) == [(0, (0, None))]
    (batch,) = list(ld)
    assert batch.shape == (1, 1, total + 5000)
    got = batch[0, :, :total]
    if not np.array_equal(got, full):
        assert float(np.abs(got - full).max()) <= 2e-6
    assert not batch[0, :, total:].any()


def test_feature_crops():
    from parseoggvorbis_tpu.features.batched import get_features_range

    ld = CropLoader([STEREO_OGG] * 2, 8192, BATCH, seed=1, steps=1,
                    out="features", feature_dim=48,
                    feature_kind="residue_ys", crop_rows=40)
    plans = ld._plan_step(0)
    (batch,) = list(ld)
    assert batch.shape == (BATCH, 40, 48) and batch.dtype == np.float32
    for b, (i, (s, e)) in enumerate(plans):
        want = get_features_range(
            open(STEREO_OGG, "rb").read(), 48, s, e,
            kind="residue_ys").features
        r = min(want.shape[0], 40)
        np.testing.assert_array_equal(batch[b, :r], want[:r])
        assert not batch[b, r:].any()


def test_device_and_mesh_placement():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from parseoggvorbis_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, model=1)
    ld = CropLoader([MONO_OGG], CROP, 8, device=True, mesh=mesh)
    placed = ld._place(np.zeros((8, 1, 64), np.float32))
    assert isinstance(placed, jax.Array)
    assert placed.sharding == NamedSharding(mesh, P("data", None, None))
    ld2 = CropLoader([MONO_OGG], CROP, 8, device=True)
    assert isinstance(ld2._place(np.zeros((8, 1, 64), np.float32)),
                      jax.Array)
    # host default returns numpy untouched
    x = np.zeros((2, 1, 4), np.float32)
    assert CropLoader([MONO_OGG], CROP, 2)._place(x) is x


def test_take_and_early_stop():
    ld = CropLoader([STEREO_OGG], CROP, BATCH, seed=3)  # infinite
    got = list(ld.take(2))
    assert len(got) == 2
    it = iter(ld)
    next(it)
    it.close()  # generator close -> worker must stop, no deadlock


def test_close_releases_mmaps():
    with CropLoader([MONO_OGG], CROP, 1) as ld:
        assert ld._sources[0]._mmap is not None
    assert ld._closed


def test_bytes_sources_and_worker_error_surfaces():
    blob = open(MONO_OGG, "rb").read()
    # in-memory bytes sources work like paths
    ld = CropLoader([blob], CROP, 1, seed=2, steps=1)
    (b,) = list(ld)
    assert b.shape == (1, 1, CROP)
    ld.close()  # no mmap to release; close is a no-op + idempotent
    ld.close()
    # an exception inside the prefetch worker surfaces on the consumer
    bad = CropLoader([blob], CROP, 1, out="features", feature_kind="nope")
    with pytest.raises(Exception):
        next(iter(bad))
    # take() past the end yields only what exists
    short = CropLoader([blob], CROP, 1, seed=2, steps=1)
    assert len(list(short.take(5))) == 1

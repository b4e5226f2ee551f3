"""Targeted tests for the weakest-covered runtime branches (VERDICT r3
item 7): mesh fallback/enumeration branches, stacked-group and mesh-group
poison-retry paths, sequential granule-accounting errors, batcher run-loop
shutdown/failure branches, and the scalar convenience API."""

import threading
import warnings

import numpy as np
import pytest

from conftest import MONO_OGG, STEREO_OGG


# ------------------------------------------------------ convenience API --

def test_scalar_convenience_api_full_read(tmp_path):
    """parseoggvorbis_tpu.ogg_vorbis_full_read(_from_memory): the C++-style
    whole-file consumers (reference: ParseOggVorbis.hpp:1488-1494)."""
    import parseoggvorbis_tpu as pov

    class Count(pov.ParseCallbacks):
        def __init__(self):
            self.samples = 0
            self.eof = False

        def got_pcm_data(self, pcm):
            self.samples += pcm.shape[1]
            return True

        def got_eof(self):
            self.eof = True
            return True

    cb = Count()
    pov.ogg_vorbis_full_read(MONO_OGG, cb)
    assert cb.samples == 63488 and cb.eof

    cb2 = Count()
    pov.ogg_vorbis_full_read_from_memory(open(STEREO_OGG, "rb").read(), cb2)
    assert cb2.samples == 91136 and cb2.eof


# ------------------------------------------------------- mesh fallbacks --

def test_make_mesh_warns_when_default_backend_fails(monkeypatch):
    import jax

    from parseoggvorbis_tpu.parallel import mesh as mesh_mod

    cpu_devices = jax.devices("cpu")

    def broken_devices(*a):
        if a and a[0] == "cpu":
            return cpu_devices
        raise RuntimeError("simulated dead plugin")

    # request MORE than the forced count so the default-backend branch runs
    monkeypatch.setattr(mesh_mod.jax, "devices", broken_devices)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        m = mesh_mod.make_mesh(None)
    assert m.devices.flat[0].platform == "cpu"
    assert any("failed to initialize" in str(w.message) for w in caught)


def test_make_mesh_warns_on_small_default_backend(monkeypatch):
    """A default backend with fewer devices than requested falls back to
    CPU with a warning naming the platform (never silently)."""
    import jax

    from parseoggvorbis_tpu.parallel import mesh as mesh_mod

    cpu_devices = jax.devices("cpu")

    class FakeTpu:
        platform = "tpu"

    def fake_devices(*a):
        if a and a[0] == "cpu":
            return cpu_devices
        return [FakeTpu()]

    monkeypatch.setattr(mesh_mod.jax, "devices", fake_devices)
    monkeypatch.setattr(mesh_mod, "_forced_host_device_count", lambda: 0)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        m = mesh_mod.make_mesh(4)
    assert m.devices.flat[0].platform == "cpu"
    assert any("NOT multi-chip hardware" in str(w.message) for w in caught)


def test_make_mesh_raises_when_not_enough_devices(monkeypatch):
    from parseoggvorbis_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(mesh_mod, "_forced_host_device_count", lambda: 0)
    with pytest.raises(ValueError, match="need 99 devices"):
        mesh_mod.make_mesh(99)


def test_make_mesh_model_divisibility():
    from parseoggvorbis_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(8, model=3)


# --------------------------------------- poison-retry dispatch fallbacks --

def _raising_stacked_fn(*a, **k):
    def fn(*args):
        raise RuntimeError("simulated stacked-dispatch failure")
    return fn


def test_stacked_group_poison_retry(monkeypatch):
    """A failing stacked dispatch falls back to per-stream dispatches; the
    corpus still decodes correctly (device_decoder.launch_corpus_decode)."""
    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    blobs = [open(MONO_OGG, "rb").read()] * 3
    ref = decode_corpus(blobs, out_i16=True)
    monkeypatch.setattr(dd, "_GROUP_S", 4)
    monkeypatch.setattr(dd, "_get_stacked_fn", _raising_stacked_fn)
    got = decode_corpus(blobs, out_i16=True)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g.pcm, r.pcm)


def test_mesh_group_poison_retry(monkeypatch):
    """Same fallback on the mesh path (launch_corpus_decode_mesh)."""
    from parseoggvorbis_tpu.parallel.mesh import make_mesh
    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    blobs = [open(MONO_OGG, "rb").read()] * 2
    ref = decode_corpus(blobs, out_i16=True)
    monkeypatch.setattr(dd, "_get_stacked_fn", _raising_stacked_fn)
    got = decode_corpus(blobs, out_i16=True, mesh=make_mesh(8, model=1))
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g.pcm, r.pcm)


def test_mesh_stream_level_failure_isolated(monkeypatch):
    """A stream whose granule accounting fails at chunking time yields an
    error result on the mesh path without failing its batchmates."""
    from parseoggvorbis_tpu.parallel.mesh import make_mesh
    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime import batch as batch_mod

    good = open(MONO_OGG, "rb").read()
    orig = batch_mod.parse_streams

    def corrupting_parse(data, prefer_native=True):
        sfs = orig(data, prefer_native=prefer_native)
        if getattr(corrupting_parse, "armed", False):
            corrupting_parse.armed = False
            for sf in sfs:
                sf.granules = sf.granules.copy()
                sf.granules[5] = 1  # position already past this granule
        return sfs

    monkeypatch.setattr(batch_mod, "parse_streams", corrupting_parse)
    monkeypatch.setattr(dd, "_CHUNK_T", 16)  # force the chunked path
    corrupting_parse.armed = True
    out = batch_mod.decode_corpus([good, good], strict=False,
                                  mesh=make_mesh(8, model=1))
    oks = [o.ok for o in out]
    assert sorted(oks) == [False, True]
    bad = out[oks.index(False)]
    assert "granule" in bad.error
    good_out = out[oks.index(True)]
    assert good_out.num_samples == 63488


# --------------------------------------------- sequential granule errors --

def test_assemble_nums_sequential_branches():
    from parseoggvorbis_tpu.runtime.device_decoder import (
        _assemble_nums_sequential)

    # truncation at a mid-page granule (num > remaining)
    nums = _assemble_nums_sequential([10, 10, 10], [-1, 15, -1], 3)
    assert nums.tolist() == [10, 5, 10]
    with pytest.raises(ValueError, match="past granule"):
        _assemble_nums_sequential([10, 10], [10, 3], 2)
    with pytest.raises(ValueError, match="short frame"):
        _assemble_nums_sequential([10, 10], [99, -1], 2)
    # exact-match granule passes the end-of-page check
    nums = _assemble_nums_sequential([10, 10], [10, 20], 2)
    assert nums.tolist() == [10, 10]


# --------------------------------------------------- batcher run branches --

def test_batcher_none_wakeup_and_exit_drain():
    """The run loop ignores spurious None wakeups, and the exit drain fails
    pendings that raced past stop()."""
    from parseoggvorbis_tpu.serving import _Batcher, _Pending

    b = _Batcher(max_batch=4, max_wait_ms=10.0)
    b.start()
    b.q.put(None)  # spurious wakeup: loop must continue, not crash
    p1 = _Pending(open(MONO_OGG, "rb").read(), "decode", {"fmt": "i16"})
    b.submit(p1)
    assert p1.done.wait(timeout=120)
    assert p1.error is None
    b.stop()
    b.join(timeout=10)
    assert not b.is_alive()

    # exit drain, deterministically: a stopped batcher's run() must fail
    # anything that raced into the queue, without processing it
    b2 = _Batcher(max_batch=4, max_wait_ms=10.0)
    p2 = _Pending(b"x", "decode", {"fmt": "i16"})
    b2.q.put(p2)
    b2._stopping = True
    b2.run()  # synchronous: loop exits immediately, drain fails p2
    assert p2.done.wait(timeout=1)
    assert p2.error == "server shutting down"


def test_feature_group_failure_isolated_per_group():
    """An invalid feature kind fails ITS group only; a decode pending in the
    same admission batch still succeeds (serving._run_batch)."""
    from parseoggvorbis_tpu.serving import _Batcher, _Pending

    b = _Batcher(max_batch=4, max_wait_ms=10.0)
    blob = open(MONO_OGG, "rb").read()
    good = _Pending(blob, "decode", {"fmt": "i16"})
    bad = _Pending(blob, "features", {"dim": 8, "kind": "no_such_kind",
                                      "device": False})
    b._run_batch([good, bad])
    assert good.error is None and good.result is not None
    assert bad.error is not None and "no_such_kind" in bad.error


def test_malloc_tuning_idempotent():
    from parseoggvorbis_tpu.utils.malloc_tuning import tune_arena

    first = tune_arena()
    assert tune_arena() is True or first is False  # second call short-circuits


def test_native_autobuild_disabled_falls_back(monkeypatch, caplog):
    """POV_AUTOBUILD=0 with no built library: _load logs and returns None
    (pure-Python host path) without attempting a build."""
    import logging

    from parseoggvorbis_tpu.native import frontend as fe

    monkeypatch.setattr(fe, "_lib", None)
    monkeypatch.setattr(fe, "_LIB_PATH", "/nonexistent/pov/_libpov.so")
    monkeypatch.setenv("POV_AUTOBUILD", "0")
    with caplog.at_level(logging.INFO, "parseoggvorbis_tpu.native"):
        assert fe._load() is None
    assert any("POV_AUTOBUILD=0" in r.message for r in caplog.records)


def test_native_autobuild_failure_falls_back(monkeypatch, caplog):
    """A failing auto-build logs a warning and falls back to pure Python
    instead of raising."""
    import logging
    import subprocess

    from parseoggvorbis_tpu.native import frontend as fe

    monkeypatch.setattr(fe, "_lib", None)
    monkeypatch.setattr(fe, "_LIB_PATH", "/nonexistent/pov/_libpov.so")
    monkeypatch.delenv("POV_AUTOBUILD", raising=False)

    def boom(*a, **k):
        raise subprocess.SubprocessError("compiler exploded")

    monkeypatch.setattr(subprocess, "run", boom)
    with caplog.at_level(logging.WARNING, "parseoggvorbis_tpu.native"):
        assert fe._load() is None
    assert any("auto-build failed" in r.message for r in caplog.records)


def test_native_parse_requires_lib(monkeypatch):
    """parse_streams_native without a built library raises RuntimeError."""
    import pytest

    from parseoggvorbis_tpu.native import frontend as fe

    monkeypatch.setattr(fe, "_lib", None)
    monkeypatch.setattr(fe, "_LIB_PATH", "/nonexistent/pov/_libpov.so")
    monkeypatch.setenv("POV_AUTOBUILD", "0")
    with pytest.raises(RuntimeError, match="not built"):
        fe.parse_streams_native(b"OggS")


def test_per_stream_pipelined_flow_bit_equal(monkeypatch):
    """POV_GROUP_STREAMS=1 (per-stream pipelined parse->launch->prefetch)
    must be bit-equal to the stacked-group default path."""
    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    blobs = [open(MONO_OGG, "rb").read(), open(STEREO_OGG, "rb").read()]
    want = decode_corpus(blobs)
    monkeypatch.setattr(dd, "_GROUP_S", 1)
    got = decode_corpus(blobs)
    assert len(got) == len(want) == 2
    for a, b in zip(want, got):
        assert np.array_equal(a.pcm, b.pcm)


def test_per_stream_launch_error_isolated(monkeypatch):
    """Non-strict per-stream flow: a poisoned launch fails that stream
    alone; batchmates decode."""
    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    monkeypatch.setattr(dd, "_GROUP_S", 1)
    orig = dd.launch_stream_decode

    def boom(sf, out_i16=False):
        if sf.channels == 1:
            raise RuntimeError("poisoned launch")
        return orig(sf, out_i16=out_i16)

    monkeypatch.setattr(dd, "launch_stream_decode", boom)
    blobs = [open(MONO_OGG, "rb").read(), open(STEREO_OGG, "rb").read()]
    outs = decode_corpus(blobs, strict=False)
    assert not outs[0].ok and "poisoned" in outs[0].error
    assert outs[1].ok and outs[1].pcm.shape[1] > 0


def test_streaming_seek_near_page_skip():
    """A seek landing one sample before a page granule maximizes the
    leading-chunk trim (the incremental windows are page-granular, so the
    skip never exceeds the first chunk; the whole-chunk-drop arm in
    StreamingDecode.emit is defensive)."""
    from parseoggvorbis_tpu.ogg.seek import walk_pages
    from parseoggvorbis_tpu.runtime.batch import (
        decode_bytes, decode_bytes_streaming)

    data = open(STEREO_OGG, "rb").read()
    idx = walk_pages(data)
    gs = [p.granule for p in idx.audio_pages if p.granule >= 0]
    s = gs[len(gs) // 2] - 1  # skip ~= one full page of samples
    full = decode_bytes(data).pcm
    sd = decode_bytes_streaming(data, start_sample=s, chunk_frames=4)
    got = sd.read_all()
    assert np.array_equal(got.pcm, full[:, s:])


def test_emission_nums_midstream_truncation_then_consistent_granules():
    """A mid-stream truncating granule followed by granules consistent with
    the TRUNCATED timeline must decode (review finding: the vectorized
    pre-checks compared untruncated cumulative positions against the later
    granules and falsely rejected the stream the sequential replay — and
    the scalar reference path — accepts)."""
    from types import SimpleNamespace

    from parseoggvorbis_tpu.runtime import device_decoder as dd

    frame_n = np.array([2048, 2048, 2048, 256, 256, 256, 256], np.int64)
    # untruncated lengths: [0, 1024, 1024, 576, 128, 128, 128]
    granules = np.array([-1, -1, 1148, -1, -1, 1980, 2108], np.int64)
    shim = SimpleNamespace(num_frames=7, frame_n=frame_n, granules=granules)
    nums = dd._compute_emission_nums(shim)
    assert nums.tolist() == [0, 1024, 124, 576, 128, 128, 128]
    # and a genuinely inconsistent late granule still raises
    bad = granules.copy()
    bad[6] = 5  # behind the truncated timeline
    shim = SimpleNamespace(num_frames=7, frame_n=frame_n, granules=bad)
    with pytest.raises(ValueError, match="granule"):
        dd._compute_emission_nums(shim)

"""Bounded-memory streaming decode (round-2 VERDICT item 4).

The incremental native front-end + StreamingDecode must (a) produce the
same PCM as the whole-file path, and (b) hold host RSS at O(window) —
decode a synthetic >=10-minute file with a bounded peak-RSS delta, far
below the whole-file path's, where the round-2 batch path materialized the
entire stream's symbol product host-side (~2.5 GB/hour).

Equality note: different window sizes change the device matmul batch
shapes, and XLA's reduction tiling (hence f32 summation order) may differ
per shape — outputs agree within ~2e-7 (asserted atol 2e-6, well under the
project-wide 1e-5 eps), byte-equal whenever the executable shapes coincide.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import DATA_DIR, MONO_OGG, STEREO_OGG, REPO_ROOT


def _native_available():
    from parseoggvorbis_tpu.native.frontend import available

    return available()


@pytest.mark.parametrize("fname", ["test.mono44khz.ogg",
                                   "test.stereo44khz.ogg",
                                   "bench/lowrate8s.mono.8k.q_1.ogg"])
@pytest.mark.parametrize("chunk", [0, 48, 17])
def test_streaming_equals_whole(fname, chunk):
    from parseoggvorbis_tpu.runtime.batch import (decode_bytes,
                                                  decode_bytes_streaming)

    if not _native_available():
        pytest.skip("native front-end not built")
    path = os.path.join(DATA_DIR, fname)
    if not os.path.exists(path):
        pytest.skip("bench corpus not generated")
    data = open(path, "rb").read()
    whole = decode_bytes(data)
    got = decode_bytes_streaming(data, chunk_frames=chunk).read_all()
    assert got.pcm.shape == whole.pcm.shape
    assert got.sample_rate == whole.sample_rate
    np.testing.assert_allclose(got.pcm, whole.pcm, atol=2e-6, rtol=0)


def test_streaming_window_is_bounded():
    """Structural bound: the native window never holds more than
    chunk_frames + 1 frames regardless of stream length."""
    from parseoggvorbis_tpu.native.frontend import NativeIncremental

    if not _native_available():
        pytest.skip("native front-end not built")
    data = open(STEREO_OGG, "rb").read()
    inc = NativeIncremental(data)
    total = 0
    first = True
    while True:
        view, has_ctx = inc.next_window(16)
        if view is None:
            break
        assert has_ctx == (not first)
        first = False
        n = len(view.mode_idx)
        total += n - (1 if has_ctx else 0)
        # windows may overshoot to a page boundary, but only by one page's
        # worth of packets; they must never accumulate unboundedly
        assert n <= 16 + 1 + 64, n
    inc.close()
    from parseoggvorbis_tpu.runtime.batch import parse_stream

    assert total == parse_stream(data).num_frames


_SUBPROC = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

def hwm_mb():
    for line in open("/proc/self/status"):
        if line.startswith("VmHWM"):
            return int(line.split()[1]) / 1024.0
    return 0.0

def reset_hwm():
    # writing "5" to clear_refs resets VmHWM, so the measured peak excludes
    # warmup/compile spikes (falls back silently on kernels without it)
    try:
        with open("/proc/self/clear_refs", "w") as f:
            f.write("5")
        return True
    except OSError:
        return False

data = open(%(path)r, "rb").read()
mode = %(mode)r

# warm up jax + a small decode so the runtime's baseline allocations are
# inside `base` (VmHWM is monotonic: the delta then isolates the decode)
from parseoggvorbis_tpu.runtime.batch import decode_bytes, decode_bytes_streaming
warm = open(%(warm)r, "rb").read()
if mode == "stream":
    decode_bytes_streaming(warm).read_all()
    # compile the long file's window signature too: XLA's compile-arena
    # peak must land before the measured region
    next(iter(decode_bytes_streaming(data, chunk_frames=2048)))
else:
    decode_bytes(warm)
hwm_reset = reset_hwm()
base = hwm_mb()
n = 0
s1 = 0.0
s2 = 0.0
if mode == "stream":
    dec = decode_bytes_streaming(data, chunk_frames=2048)
    for chunk in dec:
        n += chunk.shape[1]
        s1 += float(np.abs(chunk, dtype=np.float64).sum())
        s2 += float((chunk.astype(np.float64) ** 2).sum())
else:
    out = decode_bytes(data)
    n = out.num_samples
    s1 = float(np.abs(out.pcm, dtype=np.float64).sum())
    s2 = float((out.pcm.astype(np.float64) ** 2).sum())
print(json.dumps({"n": n, "s1": s1, "s2": s2, "base_mb": base,
                  "peak_mb": hwm_mb(), "hwm_reset": hwm_reset}))
"""


@pytest.fixture(scope="module")
def long_ogg(tmp_path_factory):
    """Synthetic >=5-minute mono 44.1kHz ogg (cached across runs).

    305 s keeps the whole-vs-stream RSS separation wide (measured 839 vs
    131 MB delta — 6.4x against the asserted 2x) at half the suite cost
    of the original 610 s fixture; the O(window) claim is length-
    independent."""
    sys.path.insert(0, os.path.join(REPO_ROOT, "tests", "tools"))
    import vorbis_oracle

    if not vorbis_oracle.available():
        pytest.skip("system libvorbis not available")
    cache = "/tmp/parseoggvorbis_golden/long5min.mono.44k.ogg"
    if not os.path.exists(cache):
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        rate = 44100
        secs = 305
        t = np.arange(rate * secs, dtype=np.float64) / rate
        # tonal + noise content so frames stay non-trivial
        pcm = (0.3 * np.sin(2 * np.pi * 220 * t)
               * (1 + 0.5 * np.sin(2 * np.pi * 0.25 * t)))
        rng = np.random.RandomState(0)
        pcm += 0.05 * rng.randn(len(t))
        blob = vorbis_oracle.encode_ogg(
            pcm.astype(np.float32)[None, :], rate, quality=0.0)
        with open(cache + ".part", "wb") as f:
            f.write(blob)
        os.replace(cache + ".part", cache)
    return cache


def _run_sub(path, mode):
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROC % {"repo": REPO_ROOT, "path": path,
                                           "mode": mode, "warm": MONO_OGG}],
        capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_streaming_rss_bounded_5min(long_ogg):
    """Decode >=5 minutes of audio with bounded host memory: the
    streaming path's peak RSS stays under 500MB total and well under the
    whole-file path's, while both produce the same samples.

    RSS is a measurement, not a deterministic property: allocator and
    page-cache state shift peaks by tens of MB run-to-run (observed under
    full-suite load), so the memory bounds get one measured retry — a
    genuine unbounded-memory regression fails both attempts by hundreds
    of MB."""
    if not _native_available():
        pytest.skip("native front-end not built")
    whole = _run_sub(long_ogg, "whole")
    last_err = None
    for _ in range(2):
        stream = _run_sub(long_ogg, "stream")
        assert stream["n"] == whole["n"] >= 305 * 44100 - 44100
        # same audio (fp reassociation-level agreement)
        assert abs(stream["s1"] - whole["s1"]) / max(whole["s1"], 1) < 1e-6
        assert abs(stream["s2"] - whole["s2"]) / max(whole["s2"], 1) < 1e-6
        # the memory claim: O(window), far below the whole-stream product.
        # (CPU-as-device counts the jit's device buffers against host RSS
        # too, so these bounds are conservative for a real TPU host.)
        # With VmHWM resettable the peak excludes warmup/compile spikes.
        stream_delta = stream["peak_mb"] - stream["base_mb"]
        whole_delta = whole["peak_mb"] - whole["base_mb"]
        try:
            if stream.get("hwm_reset"):
                assert stream["peak_mb"] < 500, stream
            assert stream_delta < 300, (stream_delta, stream)
            assert whole_delta > 2 * max(stream_delta, 40), \
                (stream_delta, whole_delta)
            return
        except AssertionError as exc:
            last_err = exc
    raise last_err


def test_streaming_spanning_packets():
    """The incremental parser reassembles page-spanning packets across
    window boundaries exactly like the whole-file demux."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(REPO_ROOT, "tests", "tools"))
    from repaginate import repaginate

    from parseoggvorbis_tpu.runtime.batch import (decode_bytes,
                                                  decode_bytes_streaming)

    if not _native_available():
        pytest.skip("native front-end not built")
    data, nspans = repaginate(open(STEREO_OGG, "rb").read())
    assert nspans > 0
    whole = decode_bytes(data)
    got = decode_bytes_streaming(data, chunk_frames=9).read_all()
    assert got.pcm.shape == whole.pcm.shape
    np.testing.assert_allclose(got.pcm, whole.pcm, atol=2e-6, rtol=0)


def test_heterogeneous_corpus_batch():
    """One decode_corpus batch mixing every decode surface — golden files,
    synthetic 8192 blocks, floor0 (LSP), mixed floor0+floor1 stereo, and
    residue type 0 — each stream bit-equal to its per-file decode."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(REPO_ROOT, "tests", "tools"))
    from make_synth_vorbis import (SynthStream, make_8192_stream,
                                   make_floor0_stream)

    from parseoggvorbis_tpu.runtime.batch import decode_bytes, decode_corpus

    blobs = [
        open(MONO_OGG, "rb").read(),
        make_8192_stream(seed=1, num_frames=10),
        make_floor0_stream(seed=1, num_frames=10),
        SynthStream(bs0=512, bs1=2048, seed=0,
                    floor_kind="mixed").make(num_frames=10),
        SynthStream(bs0=512, bs1=2048, seed=0,
                    residue_type=0).make(num_frames=10),
        open(STEREO_OGG, "rb").read(),
    ]
    refs = [decode_bytes(b) for b in blobs]
    outs = decode_corpus(blobs)
    assert len(outs) == len(blobs)
    for o, r in zip(outs, refs):
        assert o.ok
        np.testing.assert_array_equal(o.pcm, r.pcm)

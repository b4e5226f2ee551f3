"""Device pipeline tests: batched JAX path vs the oracle-validated scalar
path, the OLA scan vs the streaming decode state, and multi-chip sharding on
the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def _scalar_pcm(path):
    from parseoggvorbis_tpu.runtime.decoder import OggReader, ParseCallbacks

    class Collect(ParseCallbacks):
        def __init__(self):
            self.chunks = []

        def got_pcm_data(self, pcm):
            self.chunks.append(pcm.copy())
            return True

    cb = Collect()
    OggReader(cb).full_read(path)
    return np.concatenate(cb.chunks, axis=1)


@pytest.mark.parametrize("which", ["mono", "stereo"])
def test_batched_matches_scalar(which, mono_ogg, stereo_ogg):
    from parseoggvorbis_tpu.runtime.batch import decode_file

    path = {"mono": mono_ogg, "stereo": stereo_ogg}[which]
    scalar = _scalar_pcm(path)
    out = decode_file(path)
    assert out.pcm.shape == scalar.shape
    assert out.sample_rate == 44100
    err = np.max(np.abs(out.pcm - scalar))
    assert err < 2e-6, err


def test_ola_scan_matches_decode_state():
    """Device OLA scan == streaming DecodeState on a mixed-blocksize stream."""
    from parseoggvorbis_tpu.runtime.jax_backend import ola_scan
    from parseoggvorbis_tpu.runtime.state import DecodeState

    from parseoggvorbis_tpu.vorbis.mode import make_window

    rng = np.random.RandomState(7)
    max_n = 256
    c = 2
    sizes = [256, 256, 64, 64, 256, 64, 256, 256]
    frames = []
    padded = np.zeros((len(sizes), c, max_n), dtype=np.float32)
    for t, n in enumerate(sizes):
        # real Vorbis transition windows: slope sizes follow the neighbors
        # (frames are zero outside the lapped region, which the scan's
        # single-frame carry relies on)
        prev_n = sizes[t - 1] if t > 0 else n
        next_n = sizes[t + 1] if t + 1 < len(sizes) else n
        win = make_window(n, min(n, prev_n) // 2, min(n, next_n) // 2)
        f = (rng.randn(c, n) * win).astype(np.float32)
        frames.append(f)
        padded[t, :, :n] = f

    # streaming reference
    state = DecodeState(c)
    emitted_ref = []
    for t, n in enumerate(sizes):
        state.begin_frame(n)
        off = state.frame_pos - state.buf_start
        state.buf[:, off : off + n] += frames[t]
        out = state.ready_pcm()
        emitted_ref.append(out if out is not None else np.zeros((c, 0), np.float32))

    n_half = np.array([n // 2 for n in sizes], dtype=np.int32)
    emitted, lengths = ola_scan(
        np.asarray(padded), np.asarray(n_half), max_n
    )
    emitted = np.asarray(emitted)
    lengths = np.asarray(lengths)
    for t in range(len(sizes)):
        ref = emitted_ref[t]
        assert lengths[t] == ref.shape[1], (t, lengths[t], ref.shape)
        got = emitted[t, :, : lengths[t]]
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_dryrun_multichip_virtual8():
    from parseoggvorbis_tpu.parallel.mesh import dryrun_multichip

    assert len(jax.devices("cpu")) >= 8
    dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape == (16, 2, 2048)


def test_chunked_long_stream_decode(stereo_ogg, monkeypatch):
    """Chunked decode (bounded device memory for long files) must equal the
    single-shot decode exactly."""
    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime.batch import parse_stream
    from parseoggvorbis_tpu.runtime.device_decoder import launch_stream_decode

    data = open(stereo_ogg, "rb").read()
    sf = parse_stream(data)
    ref_pend = launch_stream_decode(sf)
    ref = ref_pend.fetch()

    monkeypatch.setattr(dd, "_CHUNK_T", 16)
    pend = launch_stream_decode(sf)
    assert isinstance(pend, dd._ChunkedPending)
    assert len(pend.futures) == 6
    got = pend.fetch()
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)

    # corpus path routes long streams through chunking too
    from parseoggvorbis_tpu.runtime.device_decoder import launch_corpus_decode

    pends = launch_corpus_decode([sf, sf])
    for p in pends:
        np.testing.assert_array_equal(p.fetch(), ref)


def test_sharded_mesh_decode_vs_scalar():
    """The data-parallel mesh decode step must reproduce the single-device
    pipeline exactly on an 8-device mesh with real-shaped inputs."""
    import jax.numpy as jnp
    from parseoggvorbis_tpu.dsp.imdct import imdct, inverse_coupling
    from parseoggvorbis_tpu.dsp.tables import INVERSE_DB_TABLE
    from parseoggvorbis_tpu.parallel.mesh import make_mesh, sharded_decode_step
    from parseoggvorbis_tpu.vorbis.mode import make_window

    mesh = make_mesh(8, model=2)
    s, t, c, n = 8, 6, 2, 512
    half = n // 2
    rng = np.random.RandomState(11)
    residue = rng.randn(s, t, c, half).astype(np.float32)
    curve = rng.randint(0, 256, (s, t, c, half)).astype(np.int32)
    decoded = np.ones((s, t, c), bool)
    used = decoded
    win_sel = np.zeros((s, t), np.int32)
    n_half = np.full((s, t), half, np.int32)

    with mesh:
        step = sharded_decode_step(mesh, n, c, couplings=((0, 1),))
        emitted, lengths = step(residue, curve, decoded, used, win_sel, n_half)
    emitted = np.asarray(emitted)
    lengths = np.asarray(lengths)

    # single-device reference via numpy
    win = make_window(n, half, half)
    for si in range(s):
        frames = []
        for tt in range(t):
            res = residue[si, tt].copy()
            res[0], res[1] = inverse_coupling(res[0], res[1])
            spec = res * INVERSE_DB_TABLE[curve[si, tt]]
            frames.append(imdct(spec) * win)
        # manual overlap-add emission
        for tt in range(1, t):
            expect = frames[tt - 1][:, half:] + frames[tt][:, :half]
            assert lengths[si, tt] == half
            np.testing.assert_allclose(
                emitted[si, tt], expect, atol=2e-5 * max(1, np.abs(expect).max())
            )
        assert lengths[si, 0] == 0


def test_stacked_group_path_equals_per_stream(stereo_ogg, mono_ogg, monkeypatch):
    """POV_GROUP_STREAMS>1 (vmapped same-signature stacking, the dense-link
    configuration) must produce identical PCM to the default per-stream
    dispatches."""
    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    blobs = [open(stereo_ogg, "rb").read()] * 3 + [open(mono_ogg, "rb").read()]
    ref = decode_corpus(blobs, out_i16=True)
    monkeypatch.setattr(dd, "_GROUP_S", 4)
    got = decode_corpus(blobs, out_i16=True)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g.pcm, r.pcm)


def test_ola_emit_bit_equals_ola_scan():
    """The vectorized OLA stencil (kept as an oracle; production uses
    ola_emit_static) must stay bit-identical to ola_scan."""
    import jax.numpy as jnp

    from parseoggvorbis_tpu.runtime.jax_backend import ola_emit, ola_scan

    rng = np.random.RandomState(0)
    for _ in range(4):
        t, c, bs1 = rng.randint(2, 30), rng.randint(1, 7), 2048
        halves = rng.choice([128, 1024], t).astype(np.int32)
        w = rng.randn(t, c, bs1).astype(np.float32)
        for i in range(t):
            w[i, :, 2 * halves[i]:] = 0
        e1, l1 = ola_scan(jnp.asarray(w), jnp.asarray(halves), bs1)
        e2, l2 = ola_emit(jnp.asarray(w), jnp.asarray(halves), bs1)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_ola_emit_static_bit_equals_ola_scan():
    """The production static-slice OLA must stay bit-identical to the
    ola_scan oracle on mixed, single-size, and truncation-shaped inputs."""
    import jax.numpy as jnp

    from parseoggvorbis_tpu.runtime.jax_backend import ola_emit_static, ola_scan

    rng = np.random.RandomState(1)
    cases = [((128, 1024), 2048), ((1024,), 2048), ((128,), 2048),
             ((512, 4096), 8192)]
    for halves_set, bs1 in cases:
        for _ in range(3):
            t, c = rng.randint(2, 30), rng.randint(1, 7)
            halves = rng.choice(list(halves_set), t).astype(np.int32)
            w = rng.randn(t, c, bs1).astype(np.float32)
            for i in range(t):
                w[i, :, 2 * halves[i]:] = 0
            e1, l1 = ola_scan(jnp.asarray(w), jnp.asarray(halves), bs1)
            e2, l2 = ola_emit_static(jnp.asarray(w), jnp.asarray(halves),
                                     bs1, halves_set)
            np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_table_lookup_onehot_bit_equals_gather(monkeypatch):
    """The MXU one-hot formulation (TPU path) must be bit-identical to the
    element gather (CPU path) for 1-D and 2-D tables."""
    import jax.numpy as jnp

    from parseoggvorbis_tpu.runtime import jax_backend as jb

    rng = np.random.RandomState(2)
    for table_shape in [(256,), (181,), (256, 4)]:
        table = jnp.asarray(rng.randn(*table_shape).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, table_shape[0], (5, 3, 17)))
        monkeypatch.delenv("POV_FORCE_ONEHOT", raising=False)
        via_gather = np.asarray(jb.table_lookup_f32(idx, table))
        monkeypatch.setenv("POV_FORCE_ONEHOT", "1")
        via_onehot = np.asarray(jb.table_lookup_f32(idx, table))
        np.testing.assert_array_equal(via_gather, via_onehot)
        np.testing.assert_array_equal(
            via_gather, np.asarray(table)[np.asarray(idx)])


def test_slab_decode_onehot_bit_equals_gather(monkeypatch):
    """_decode_slab_codes' batched one-hot einsum (TPU) must match the
    slab-offset gather (CPU) bitwise, including batch-axis padding."""
    import jax.numpy as jnp

    from parseoggvorbis_tpu.runtime import device_decoder as dd

    rng = np.random.RandomState(3)
    w = 8
    for b in (1, dd._DICT_SLAB, dd._DICT_SLAB + 3, 2 * dd._DICT_SLAB - 1):
        nslabs = -(-b // dd._DICT_SLAB)
        res_dict = jnp.asarray(
            rng.randn(nslabs * (1 << w)).astype(np.float32))
        # "g8" = no unpack: feed 8-bit codes directly
        codes = jnp.asarray(
            rng.randint(0, 1 << w, (b, 2, 24)).astype(np.uint8))
        monkeypatch.delenv("POV_FORCE_ONEHOT", raising=False)
        via_gather = np.asarray(
            dd._decode_slab_codes("g8", codes, res_dict, 24))
        monkeypatch.setenv("POV_FORCE_ONEHOT", "1")
        via_onehot = np.asarray(
            dd._decode_slab_codes("g8", codes, res_dict, 24))
        np.testing.assert_array_equal(via_gather, via_onehot)


def test_floor_render_select_chain_bit_equals_gather(monkeypatch):
    """render_floor_curve_int's TPU select-chain formulation must stay
    bit-identical to the gather formulation (CPU path)."""
    import jax.numpy as jnp

    from parseoggvorbis_tpu.runtime.jax_backend import render_floor_curve_int

    rng = np.random.RandomState(7)
    for _ in range(4):
        p = rng.randint(4, 66)
        half = int(rng.choice([128, 1024]))
        xs = np.sort(
            rng.choice(np.arange(0, 4096), p, replace=False)).astype(np.int32)
        xs[0] = 0
        b = 23
        ys = rng.randint(0, 256, (b, p)).astype(np.uint8)
        flags = (rng.rand(b, p) < 0.6).astype(np.uint8)
        flags[:, 0] = 1
        flags[:, 1] = 1
        pmap = np.clip(
            np.searchsorted(xs, np.arange(half), side="right") - 1,
            0, p - 1).astype(np.int32)
        kw = dict(xs_sorted=jnp.asarray(xs),
                  sorted_idx=jnp.asarray(np.arange(p, dtype=np.int32)),
                  pmap=jnp.asarray(pmap), multiplier=int(rng.randint(1, 5)))
        monkeypatch.delenv("POV_FORCE_ONEHOT", raising=False)
        via_gather = np.asarray(render_floor_curve_int(
            jnp.asarray(ys), jnp.asarray(flags), **kw))
        monkeypatch.setenv("POV_FORCE_ONEHOT", "1")
        via_chain = np.asarray(render_floor_curve_int(
            jnp.asarray(ys), jnp.asarray(flags), **kw))
        np.testing.assert_array_equal(via_gather, via_chain)


def test_dense_scatter_assembly_bit_equals_gather(stereo_ogg, mono_ogg,
                                                  monkeypatch):
    """The default scatter-add dense PCM assembly must be bit-identical to
    the blocked-gather formulation (POV_DENSE_GATHER=1) on real streams."""
    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    blobs = [open(stereo_ogg, "rb").read(), open(mono_ogg, "rb").read()]
    monkeypatch.setattr(dd, "_DENSE_GATHER", False)
    dd._get_stream_fn.cache_clear()
    via_scatter = decode_corpus(blobs, out_i16=True)
    monkeypatch.setattr(dd, "_DENSE_GATHER", True)
    dd._get_stream_fn.cache_clear()
    via_gather = decode_corpus(blobs, out_i16=True)
    dd._get_stream_fn.cache_clear()
    for a, b in zip(via_scatter, via_gather):
        np.testing.assert_array_equal(a.pcm, b.pcm)

"""Multi-chip decode: device-mesh sharding for corpus-scale batches.

Design (scaling-book recipe: pick a mesh, annotate shardings, let XLA insert
collectives):

* mesh axes ``('data', 'model')``;
* **data parallelism**: the stream/frame batch axis is sharded over 'data'
  (corpus decode is embarrassingly parallel across streams — the reference's
  only scale path was a 10-thread file pool, demo_live_extract.py:576-586);
* **tensor parallelism**: the IMDCT cosine matrix is column-sharded over
  'model', so each device computes a column slice of every frame's time
  output; the windowed result is re-gathered (XLA inserts the all-gather on
  the ICI) before the overlap-add scan, which is sequential in time but
  independent across streams and channels.

No collective sits on the per-sample critical path; the only cross-device
traffic is the output-column all-gather, which scales with the matmul output
and rides ICI.
"""

from __future__ import annotations

import warnings
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dsp.imdct import imdct_matrix_f32
from ..dsp.tables import INVERSE_DB_TABLE
from ..vorbis.mode import make_window
from ..runtime.jax_backend import frame_pipeline, ola_scan


def _replicated(mesh: Mesh, x) -> jax.Array:
    """Place a host constant on the mesh, replicated over every device.

    Hermeticity rule: nothing in the sharded path may touch the *default*
    backend — when the mesh is a CPU-fallback mesh on a host whose default
    (TPU) runtime is absent or broken, an uncommitted ``jnp.asarray`` would
    crash the dry run (this was MULTICHIP_r01's failure mode).
    """
    return jax.device_put(np.asarray(x), NamedSharding(mesh, P()))


def _forced_host_device_count() -> int:
    """Virtual CPU device count from XLA_FLAGS, or 0 if not forced.

    Read from the environment (no jax call) so the answer is available
    *before* any backend initializes.
    """
    import os
    import re

    m = re.search(r"--xla_force_host_platform_device_count=(\d+)",
                  os.environ.get("XLA_FLAGS", ""))
    return int(m.group(1)) if m else 0


def _cpu_devices_hermetic():
    """CPU devices without ever initializing the default (TPU) backend.

    jax 0.9 initializes *every* registered plugin on the first
    ``jax.devices(...)`` call — including a TPU plugin whose init can hang on
    a dead link (MULTICHIP_r03's failure class).  The only way to keep the
    default backend untouched is to restrict the platform list to cpu
    *before* that first call.  If backends are already up, ``devices("cpu")``
    is a cached lookup and cannot re-initialize anything.
    """
    from jax._src import xla_bridge

    if not xla_bridge._backends and jax.config.jax_platforms != "cpu":
        # Locks this process to the cpu backend; acceptable because the
        # caller explicitly forced a virtual host device count, which only
        # ever means "validate sharding on CPU".  Overrides the TPU plugin's
        # import-time 'axon,cpu' platform list — with that list in place,
        # backends() would initialize the (possibly hanging) TPU plugin too.
        jax.config.update("jax_platforms", "cpu")
    return jax.devices("cpu")


def make_mesh(n_devices: Optional[int] = None, model: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over the first *n_devices* devices.

    Device selection is CPU-first when a virtual CPU mesh can satisfy the
    request: if ``--xla_force_host_platform_device_count`` provides at least
    *n_devices*, the mesh is built from the CPU backend WITHOUT initializing
    the default (TPU) backend at all — device enumeration itself must stay
    hermetic, because a TPU plugin stalling on a dead tunnel would otherwise
    hang the dry run before any fallback could trigger.

    Otherwise falls back to the CPU backend when the default backend has
    fewer devices than requested (or fails to initialize).  The fallback is
    reported with a warning so a CPU-mesh run can never masquerade as TPU
    validation.
    """
    if n_devices is not None and 0 < n_devices <= _forced_host_device_count():
        devices = _cpu_devices_hermetic()
    else:
        try:
            devices = jax.devices()
        except Exception as exc:  # default backend failed to initialize
            warnings.warn(
                "default jax backend failed to initialize (%s); building the "
                "mesh on the CPU backend" % (exc,))
            devices = jax.devices("cpu")
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices and devices[0].platform != "cpu":
        warnings.warn(
            "default backend (%s) has %d device(s) < %d requested; building "
            "the mesh on the virtual CPU backend — this validates sharding "
            "semantics, NOT multi-chip hardware"
            % (devices[0].platform, len(devices), n_devices))
        devices = jax.devices("cpu")
    if len(devices) < n_devices:
        raise ValueError(
            "need %d devices, have %d (set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=%d for a "
            "virtual mesh)" % (n_devices, len(devices), n_devices)
        )
    devices = devices[:n_devices]
    if n_devices % model != 0:
        raise ValueError("n_devices %d not divisible by model=%d" % (n_devices, model))
    arr = np.array(devices).reshape(n_devices // model, model)
    return Mesh(arr, ("data", "model"))


def sharded_decode_step(
    mesh: Mesh,
    n: int,
    num_channels: int,
    couplings: Tuple[Tuple[int, int], ...] = (),
    num_windows: int = 1,
    tp: bool = False,
):
    """Build the jitted multi-chip decode step: [S, T, ...] batch -> PCM chunks.

    Inputs (S = streams sharded over 'data', T = frames per stream):
      residue       [S, T, C, n/2] f32
      floor_curve   [S, T, C, n/2] i32
      floor_decoded [S, T, C] bool
      floor_used    [S, T, C] bool
      win_sel       [S, T] i32
      n_half        [S, T] i32   (per-frame half blocksize, for mixed blocks)

    Returns (emitted [S, T, C, n/2], lengths [S, T]) — the overlap-added PCM
    region per frame with its valid length (left-aligned padding).

    ``tp=True`` column-shards the IMDCT matrix over the mesh's 'model' axis:
    XLA partitions the matmul by output columns (each column's reduction
    stays whole, so the result is BITWISE equal to the replicated layout)
    and all-gathers the windowed columns on the ICI before the OLA scan.
    The production corpus path applies the same layout automatically when
    the mesh has a 'model' axis (device_decoder._mesh_consts).

    The matrix enters the jitted step as a real ARGUMENT with its sharding
    declared (exactly like the production path, which passes _mesh_consts'
    arrays into the stacked fn) — a closed-over constant would let XLA
    materialize it per-device at compile time and silently drop the
    tensor parallelism.  The returned callable has it pre-bound
    (functools.partial), so call it with the six batch inputs; the
    underlying jit + bound operand are reachable via .func/.args for HLO
    inspection (dryrun_multichip asserts the collective structure there).
    """
    half = n // 2
    mat_spec = P(None, "model") if tp else P()
    imdct_m = jax.device_put(imdct_matrix_f32(n), NamedSharding(mesh, mat_spec))
    inverse_db = _replicated(mesh, INVERSE_DB_TABLE)
    windows = _replicated(
        mesh, np.stack([make_window(n, half, half)] * num_windows)
    )

    def step(imdct_m, residue, floor_curve, floor_decoded, floor_used,
             win_sel, n_half):
        s, t = residue.shape[:2]
        flat = lambda x: x.reshape((s * t,) + x.shape[2:])
        windowed = frame_pipeline(
            flat(residue), flat(floor_curve), flat(floor_decoded),
            flat(floor_used), flat(win_sel),
            imdct_m=imdct_m, windows=windows, inverse_db=inverse_db,
            couplings=couplings,
        ).reshape(s, t, num_channels, n)
        # per-stream overlap-add scan over the frame axis
        emitted, lengths = jax.vmap(lambda w, nh: ola_scan(w, nh, n))(
            windowed, n_half
        )
        return emitted, lengths

    import functools

    shard3 = NamedSharding(mesh, P("data", None, None, None))
    shard2 = NamedSharding(mesh, P("data", None, None))
    shard1 = NamedSharding(mesh, P("data", None))
    jfn = jax.jit(
        step,
        in_shardings=(NamedSharding(mesh, mat_spec),
                      shard3, shard3, shard2, shard2, shard1, shard1),
        out_shardings=(shard3, shard1),
    )
    return functools.partial(jfn, imdct_m)


def dryrun_multichip(n_devices: int) -> None:
    """Compile + execute the full multi-chip decode step on tiny shapes.

    Exercises both data parallelism (streams over 'data') and tensor
    parallelism (IMDCT columns over 'model') on an *n_devices* mesh.

    Hermetic by construction: every constant and every input is explicitly
    committed to the mesh's devices, so a broken/absent default (TPU)
    backend on the host cannot be touched when the mesh falls back to
    virtual CPU devices.
    """
    model = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    mesh = make_mesh(n_devices, model=model)
    print("dryrun_multichip: mesh backend=%s devices=%d (data=%d, model=%d)"
          % (mesh.devices.flat[0].platform, mesh.size,
             mesh.shape["data"], mesh.shape["model"]))
    n, c = 128, 2
    s = mesh.shape["data"] * 2  # 2 streams per data shard
    t = 4
    half = n // 2
    rng = np.random.RandomState(0)
    shard3 = NamedSharding(mesh, P("data", None, None, None))
    shard2 = NamedSharding(mesh, P("data", None, None))
    shard1 = NamedSharding(mesh, P("data", None))
    residue = jax.device_put(rng.randn(s, t, c, half).astype(np.float32), shard3)
    curve = jax.device_put(
        rng.randint(0, 256, size=(s, t, c, half)).astype(np.int32), shard3)
    decoded = jax.device_put(np.ones((s, t, c), dtype=bool), shard2)
    used = jax.device_put(np.ones((s, t, c), dtype=bool), shard2)
    win_sel = jax.device_put(np.zeros((s, t), dtype=np.int32), shard1)
    n_half = jax.device_put(np.full((s, t), half, dtype=np.int32), shard1)

    with mesh:
        step = sharded_decode_step(mesh, n, c, couplings=((0, 1),))
        emitted, lengths = step(residue, curve, decoded, used, win_sel, n_half)
        jax.block_until_ready((emitted, lengths))
        assert emitted.shape == (s, t, c, half)

        # tensor-parallel layout: same pipeline, IMDCT column-sharded over
        # 'model' — column sharding keeps each output column's reduction
        # whole, so dp and dp+tp must agree BITWISE
        step_tp = sharded_decode_step(mesh, n, c, couplings=((0, 1),), tp=True)
        emitted2, lengths2 = step_tp(residue, curve, decoded, used, win_sel,
                                     n_half)
        jax.block_until_ready((emitted2, lengths2))
        assert emitted2.shape == (s, t, c, half)

        # -- parallelism-structure assertions: the record must demonstrate
        # the sharding itself, not just a green exit --

        # (a) per-device shard shapes: the stream axis is split over 'data'
        # (each device owns s/data streams) and replicated over 'model'
        # (every device holds a shard), for inputs AND outputs.
        data_n = mesh.shape["data"]
        for arr, name in ((residue, "residue[in]"), (emitted, "emitted[out]"),
                          (emitted2, "emitted[tp out]")):
            shards = arr.addressable_shards
            assert len({sh.device for sh in shards}) == mesh.size, name
            for sh in shards:
                assert sh.data.shape == (s // data_n,) + arr.shape[1:], (
                    name, sh.data.shape)
        print("dryrun_multichip: per-device shards OK (%d streams/device "
              "over data=%d, replicated over model=%d)"
              % (s // data_n, data_n, mesh.shape["model"]))

        # (b) the compiled HLO carries the expected collective structure:
        # dp-only has NO collective on the decode path (streams are
        # independent); tp>1 column-shards the IMDCT matmul and must
        # reassemble the column shards across 'model' before the
        # overlap-add scan — XLA emits that re-gather either as a literal
        # all-gather or as its pad+all-reduce formulation (same bytes on
        # the ICI), so accept either spelling.
        hlo_args = (residue, curve, decoded, used, win_sel, n_half)
        hlo_dp = step.func.lower(*step.args, *hlo_args).compile().as_text()
        assert "all-gather" not in hlo_dp and "all-reduce" not in hlo_dp, (
            "dp-only decode must carry no collective")
        if mesh.shape["model"] > 1:
            hlo_tp = step_tp.func.lower(*step_tp.args,
                                        *hlo_args).compile().as_text()
            found = [op for op in ("all-gather", "all-reduce")
                     if op in hlo_tp]
            assert found, "tp>1 IMDCT must re-gather its column shards"
            print("dryrun_multichip: HLO collectives OK (dp: none; "
                  "tp=%d column re-gather: %s)"
                  % (mesh.shape["model"], "+".join(found)))
    np.testing.assert_array_equal(np.asarray(emitted), np.asarray(emitted2))
    np.testing.assert_array_equal(np.asarray(lengths), np.asarray(lengths2))

    # (c) per-device work scales with the mesh: the same batch on an
    # all-data mesh (model=1 -> data=n_devices) halves/shrinks each
    # device's stream count by exactly data2/data_n.
    if model > 1:
        mesh_dp = make_mesh(n_devices, model=1)
        data2 = mesh_dp.shape["data"]
        residue_dp = jax.device_put(
            np.asarray(residue), NamedSharding(mesh_dp,
                                               P("data", None, None, None)))
        per_dev = {sh.data.shape[0] for sh in residue_dp.addressable_shards}
        assert per_dev == {s // data2}
        assert s // data2 == (s // data_n) * data_n // data2
        print("dryrun_multichip: per-device work scaling OK "
              "(%d streams/device at data=%d -> %d at data=%d)"
              % (s // data_n, data_n, s // data2, data2))

    # The production path: full corpus decode (real golden file, python host
    # front-end, mixed blocksizes, device floors, dense PCM assembly)
    # data-parallel over the same mesh.  Hermetic: every device array in
    # launch_corpus_decode_mesh is committed to the mesh.
    import os

    mono = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "tests", "data", "test.mono44khz.ogg")
    if os.path.exists(mono):
        from ..runtime.batch import decode_corpus

        data = open(mono, "rb").read()
        audios = decode_corpus([data] * 2, prefer_native=False, mesh=mesh)
        assert [a.num_samples for a in audios] == [63488, 63488]
        assert all(np.isfinite(a.pcm).all() for a in audios)
        print("dryrun_multichip: mesh corpus decode OK "
              "(2 streams x 63488 samples)")

        # random access through the same mesh path (r4): per-blob sample
        # ranges splice via the seek planner and decode data-parallel,
        # sample-exact vs slicing the full mesh decode
        ranged = decode_corpus([data] * 2, prefer_native=False, mesh=mesh,
                               ranges=[(1000, 3000), (60000, None)])
        assert ranged[0].pcm.shape[1] == 2000
        assert ranged[1].pcm.shape[1] == 63488 - 60000
        full = audios[0].pcm
        assert np.allclose(ranged[0].pcm, full[:, 1000:3000], atol=2e-6)
        assert np.allclose(ranged[1].pcm, full[:, 60000:], atol=2e-6)
        print("dryrun_multichip: mesh ranged decode OK")

        # the ML headline path sharded the same way: same-plan feature
        # stacks over 'data' (python front-end keeps this hermetic too)
        from ..features.device import launch_features_mesh
        from ..runtime.batch import parse_stream_python

        parsed = [parse_stream_python(data) for _ in range(2)]
        mats = [p.fetch() for p in launch_features_mesh(
            parsed, 32, mesh, kind="floor_final_ys")]
        assert mats[0].shape == mats[1].shape and mats[0].shape[1] == 32
        assert np.array_equal(mats[0], mats[1])
        print("dryrun_multichip: mesh feature extraction OK %s"
              % (mats[0].shape,))

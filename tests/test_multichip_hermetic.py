"""Regression tests for MULTICHIP_r01/r03: the dryrun must be hermetic.

The driver validates multi-chip sharding by running ``dryrun_multichip(8)``
in an environment with 8 *virtual CPU* devices forced via XLA_FLAGS while the
host's default (TPU) backend may be present but broken — r01 failed with a
libtpu mismatch when an uncommitted constant hit the default backend; r03
failed the same way from ``entry()`` state in the driver process; and device
*enumeration* itself can hang when the TPU plugin's init stalls on a dead
tunnel.

Hermeticity therefore has two layers, both tested here:

1. ``make_mesh`` is CPU-first: with a forced host device count that satisfies
   the request, the default (TPU) backend is never initialized at all.
2. ``__graft_entry__.dryrun_multichip`` runs in a subprocess with
   JAX_PLATFORMS=cpu, so no parent-process backend state can leak in.
"""

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import os, sys
sys.path.insert(0, %(repo)r)
import jax
from parseoggvorbis_tpu.parallel.mesh import dryrun_multichip

dryrun_multichip(8)

from jax._src import xla_bridge
inited = sorted(xla_bridge._backends)
assert inited == ["cpu"], "non-cpu backend was initialized: %%r" %% (inited,)
bad = []
for arr in jax.live_arrays():
    platforms = {d.platform for d in arr.devices()}
    if platforms != {"cpu"}:
        bad.append((arr.shape, sorted(platforms)))
assert not bad, "arrays escaped to non-cpu devices: %%r" %% (bad,)
print("HERMETIC_OK")
"""


def test_dryrun_multichip_hermetic_without_forced_cpu_platform():
    """Driver-like env (JAX_PLATFORMS unset, host devices forced): the dryrun
    must complete WITHOUT ever initializing the default (TPU) backend —
    make_mesh's CPU-first enumeration, not a post-init fallback."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _SCRIPT % {"repo": REPO_ROOT}],
            capture_output=True, text=True, timeout=240, env=env,
        )
    except subprocess.TimeoutExpired:
        # Two possible causes: (a) make_mesh regressed and touched the
        # default (tunneled TPU) backend, or (b) this environment's
        # sitecustomize dialed the stalled tunnel at interpreter startup,
        # BEFORE any code of ours ran (observed in-session: bare
        # ``import jax`` blocked >120 s).  Disambiguate by rerunning with
        # the sitecustomize register gate cleared: if the axon-free run is
        # hermetic-clean, the timeout was the tunnel's, not ours.
        env2 = dict(env)
        env2["PALLAS_AXON_POOL_IPS"] = ""
        try:
            proc2 = subprocess.run(
                [sys.executable, "-c", _SCRIPT % {"repo": REPO_ROOT}],
                capture_output=True, text=True, timeout=240, env=env2,
            )
        except subprocess.TimeoutExpired:
            pytest.fail("dryrun subprocess exceeded 240s even axon-free — "
                        "the dryrun itself regressed")
        if proc2.returncode == 0 and "HERMETIC_OK" in proc2.stdout:
            pytest.skip("tunneled backend stalled at interpreter startup "
                        "(sitecustomize register); axon-free rerun was "
                        "hermetic-clean, so make_mesh's CPU-first path is "
                        "intact")
        pytest.fail(
            "dryrun subprocess exceeded 240s and the axon-free rerun "
            "failed:\n%s\n%s" % (proc2.stdout[-2000:], proc2.stderr[-4000:]))
    if proc.returncode != 0:
        pytest.fail("dryrun subprocess failed:\n%s\n%s"
                    % (proc.stdout[-2000:], proc.stderr[-4000:]))
    assert "HERMETIC_OK" in proc.stdout
    assert "mesh backend=cpu" in proc.stdout


def test_graft_entry_dryrun_subprocess_isolated():
    """__graft_entry__.dryrun_multichip self-isolates: it must succeed even
    when the calling process's env points jax at a non-existent platform."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "no_such_platform"  # parent env is poison
    # keep the OUTER wrapper interpreter off the tunnel too (sitecustomize
    # register gate); the wrapper's own subprocess clears it regardless
    env["PALLAS_AXON_POOL_IPS"] = ""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__ as ge\n"
        "ge.dryrun_multichip(2)\n"
        "print('WRAPPER_OK')\n" % REPO_ROOT
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=240, env=env,
    )
    if proc.returncode != 0:
        pytest.fail("wrapper subprocess failed:\n%s\n%s"
                    % (proc.stdout[-2000:], proc.stderr[-4000:]))
    assert "WRAPPER_OK" in proc.stdout
    assert "DRYRUN_OK" in proc.stdout


def test_make_mesh_cpu_first_skips_default_backend():
    """In-process: forced-count satisfiable request never calls jax.devices()."""
    from parseoggvorbis_tpu.parallel import mesh as mesh_mod

    assert mesh_mod._forced_host_device_count() == 8  # conftest forces 8

    import jax

    called = []
    orig = jax.devices

    def spy(*a, **k):
        called.append(a)
        return orig(*a, **k)

    jax.devices = spy
    try:
        m = mesh_mod.make_mesh(8, model=2)
    finally:
        jax.devices = orig
    assert m.devices.flat[0].platform == "cpu"
    assert m.shape == {"data": 4, "model": 2}
    # only the explicit cpu enumeration, never the default-backend call
    assert all(a and a[0] == "cpu" for a in called), called


def test_make_mesh_warns_on_cpu_fallback():
    """A CPU-fallback mesh is never silent (ADVICE item)."""
    import warnings

    from parseoggvorbis_tpu.parallel.mesh import make_mesh

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        mesh = make_mesh(8, model=2)
    assert mesh.devices.flat[0].platform == "cpu"
    assert mesh.shape == {"data": 4, "model": 2}
    # cpu default backend -> requested count available -> no spurious warning
    assert not [w for w in caught if "CPU backend" in str(w.message)]

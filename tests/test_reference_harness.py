"""CI pin of the reference's OWN differential harness (VERDICT r3 item 6).

The suite otherwise verifies dump compatibility via tests/util_compare.py —
a reimplementation.  These tests execute the reference's *unmodified*
``tests/compare-debug-out.py`` (reference: compare-debug-out.py:433-565)
against fresh dumps produced by BOTH of our front-ends (Python CLI and
native ``pov_decode``) vs the golden libvorbis oracle dumps, so any drift
in the binary dump format (Callbacks.cpp:146-199 contract), tap names, or
numerics fails CI with the reference's own assertions
(compare-debug-out.py:90-108, 507-515) — not with ours.
"""

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_HARNESS = "/root/reference/tests/compare-debug-out.py"
BIN = os.path.join(REPO_ROOT, "parseoggvorbis_tpu", "native", "pov_decode")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_HARNESS), reason="reference checkout not present"
)

_EXPECTED = {"mono": (67, 63488), "stereo": (94, 91136)}


def _stub_dir(tmp_path):
    """The harness imports better_exchook (not installed); stub it."""
    d = tmp_path / "stub"
    d.mkdir(exist_ok=True)
    (d / "better_exchook.py").write_text(
        "def install():\n    pass\n"
        "def better_exchook(*a, **k):\n"
        "    import traceback\n"
        "    traceback.print_exception(*a[:3])\n"
    )
    return str(d)


def _run_harness(tmp_path, our_dump, oracle_dump, which):
    env = dict(os.environ)
    env["PYTHONPATH"] = _stub_dir(tmp_path)
    proc = subprocess.run(
        [sys.executable, REF_HARNESS,
         "--ourout", our_dump, "--libvorbisout", oracle_dump],
        capture_output=True, text=True, timeout=300, env=env,
    )
    if proc.returncode != 0:
        pytest.fail("reference harness rejected the dump:\n%s\n%s"
                    % (proc.stdout[-3000:], proc.stderr[-3000:]))
    packets, samples = _EXPECTED[which]
    assert "Finished." in proc.stdout
    assert ("Num audio packets: %d" % packets) in proc.stdout
    assert ("%d" % samples) in proc.stdout


@pytest.mark.parametrize("which", ["mono", "stereo"])
def test_reference_harness_accepts_python_cli_dump(
        tmp_path, golden_dumps, which, mono_ogg, stereo_ogg):
    ogg = {"mono": mono_ogg, "stereo": stereo_ogg}[which]
    dump = str(tmp_path / ("cli.%s.dump" % which))
    proc = subprocess.run(
        [sys.executable, "-m", "parseoggvorbis_tpu.cli",
         "--in", ogg, "--debug_out", dump],
        capture_output=True, text=True, timeout=300, cwd=REPO_ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    _run_harness(tmp_path, dump, golden_dumps[("libvorbis", which)], which)


@pytest.mark.parametrize("which", ["mono", "stereo"])
def test_reference_harness_accepts_native_binary_dump(
        tmp_path, golden_dumps, which, mono_ogg, stereo_ogg):
    if not os.path.exists(BIN):
        pytest.skip("pov_decode binary not built")
    ogg = {"mono": mono_ogg, "stereo": stereo_ogg}[which]
    dump = str(tmp_path / ("native.%s.dump" % which))
    proc = subprocess.run(
        [BIN, "--in", ogg, "--debug_out", dump],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    _run_harness(tmp_path, dump, golden_dumps[("libvorbis", which)], which)

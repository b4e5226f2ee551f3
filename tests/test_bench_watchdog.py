"""bench.py must emit its one JSON line even when the device path hangs.

The tunneled TPU backend in this environment has moods where any backend
call — including bare ``jax.devices()`` — blocks forever (observed
in-session).  The round record is whatever bench.py prints; a silent hang
would lose it.  Two independent guards, both exercised here in
subprocesses:

* the bounded preflight probe (a child ``jax.devices()`` the parent can
  kill) routes straight to the native-host fallback record, and
* the post-preflight watchdog emits the same record if the main flow
  stalls mid-run (simulated via the POV_BENCH_TEST_HANG hook).

Both fallbacks measure only subprocess-run binaries (our pov_decode vs
the reference), so they cannot themselves touch the accelerator link.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _native_binary_available():
    return os.path.exists(os.path.join(
        REPO, "parseoggvorbis_tpu", "native", "pov_decode"))


def _run_bench(env_overrides, timeout=240, detail_path=None):
    env = dict(os.environ)
    # Keep the bench subprocess (and its preflight child) off the tunnel
    # entirely: this environment's sitecustomize registers the tunneled
    # PJRT plugin in every python process when PALLAS_AXON_POOL_IPS is
    # set, and a stalled tunnel then hangs interpreter STARTUP — which
    # would make these tests flake with the tunnel's mood.  Axon-free,
    # JAX_PLATFORMS=cpu resolves instantly and the hooks below simulate
    # the stalls deterministically.
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["POV_BENCH_PREFLIGHT_RETRIES"] = "1"  # no retry pauses in tests
    if detail_path is not None:
        env["POV_BENCH_DETAIL"] = detail_path
    env.update(env_overrides)
    # the fallback path must not need a live backend of any kind
    p = subprocess.run(
        [sys.executable, BENCH, "--reference-rtf", "250"],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, (
        "expected exactly one JSON line, got %r\nstderr:\n%s"
        % (p.stdout, p.stderr[-2000:]))
    # the round-4 record was lost because the headline outgrew the
    # driver's 2000-char output tail; the compact-headline contract is
    # load-bearing for the round record, so enforce it on every path
    assert len(lines[0]) < 1500, (
        "headline JSON must stay under the driver's output tail: %d chars"
        % len(lines[0]))
    return json.loads(lines[0]), p


@pytest.mark.skipif(not _native_binary_available(),
                    reason="native pov_decode not built")
def test_preflight_failure_emits_native_fallback(tmp_path):
    """An unusable backend (here: a nonexistent platform, standing in for
    a tunnel whose enumeration fails) must yield the fallback record, not
    a crash or a hang."""
    detail_path = str(tmp_path / "detail.json")
    result, p = _run_bench({"JAX_PLATFORMS": "no_such_platform",
                            "POV_BENCH_PREFLIGHT": "120"},
                           detail_path=detail_path)
    assert result["metric"] == "realtime_factor_varied_corpus_per_chip"
    assert result["path"] == "native_host_cpu_fallback"
    assert result["device_unreachable"].startswith("preflight:")
    assert result["value"] > 0          # real native measurement
    assert result["vs_baseline"] > 0
    assert result["route"] == "native"
    # the forensic record moved to the detail file (headline compactness)
    assert result["detail"] == "detail.json"
    detail = json.load(open(detail_path))
    assert detail["native_host"]["rtf"] > 0
    assert detail["headline"]["value"] == result["value"]


@pytest.mark.skipif(not _native_binary_available(),
                    reason="native pov_decode not built")
def test_watchdog_emits_fallback_when_main_stalls(tmp_path):
    """A stall AFTER a healthy preflight (tunnel dies mid-run) must hit
    the watchdog deadline and still emit the fallback record."""
    result, p = _run_bench({"JAX_PLATFORMS": "cpu",
                            "POV_BENCH_TEST_HANG": "600",
                            "POV_BENCH_DEADLINE": "3",
                            "POV_BENCH_PREFLIGHT": "120"},
                           detail_path=str(tmp_path / "detail.json"))
    assert result["path"] == "native_host_cpu_fallback"
    assert "stalled" in result["device_unreachable"]
    assert result["value"] > 0
    assert "watchdog" in p.stderr


@pytest.mark.skipif(not _native_binary_available(),
                    reason="native pov_decode not built")
def test_device_path_exception_emits_fallback(tmp_path):
    """A device path that RAISES (OOM, RST mid-transfer, compile error)
    must also yield the fallback record — the watchdog only covers hangs."""
    result, p = _run_bench({"JAX_PLATFORMS": "cpu",
                            "POV_BENCH_TEST_RAISE": "simulated device OOM",
                            "POV_BENCH_PREFLIGHT": "120"},
                           detail_path=str(tmp_path / "detail.json"))
    assert result["path"] == "native_host_cpu_fallback"
    assert "simulated device OOM" in result["device_unreachable"]
    assert result["value"] > 0
    assert "RuntimeError" in p.stderr  # traceback preserved for debugging


def test_audio_seconds_pure_scan_matches_full_parse():
    """measure_reference.audio_seconds is a pure-stdlib page scan (so the
    fallback path can never trigger jax backend init); its values must
    equal the full parse's emitted-sample accounting on every bench file."""
    import glob

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from measure_reference import audio_seconds

    from parseoggvorbis_tpu.runtime.batch import parse_stream

    files = sorted(glob.glob(os.path.join(REPO, "tests", "data", "bench",
                                          "*.ogg")))
    files += [os.path.join(REPO, "tests", "data", f)
              for f in ("test.mono44khz.ogg", "test.stereo44khz.ogg")]
    assert files
    for path in files:
        sf = parse_stream(open(path, "rb").read())
        full = min(int(sf.granules[-1]),
                   int(sum(sf.frame_n)) // 2) / sf.sample_rate
        assert audio_seconds(path) == full, path

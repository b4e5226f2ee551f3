import lzma
import os
import sys

# Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
# without TPU hardware).  XLA_FLAGS must be set before jax initializes; the
# platform is forced to cpu via jax.config because this environment's TPU
# plugin overrides the JAX_PLATFORMS env var at import time.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

DATA_DIR = os.path.join(REPO_ROOT, "tests", "data")
GOLDEN_DIR = os.path.join(REPO_ROOT, "tests", "golden")

import pytest


MONO_OGG = os.path.join(DATA_DIR, "test.mono44khz.ogg")
STEREO_OGG = os.path.join(DATA_DIR, "test.stereo44khz.ogg")


def _decompress_golden(name: str) -> str:
    """Decompress tests/golden/<name>.xz into a cached tmp file."""
    src = os.path.join(GOLDEN_DIR, name + ".xz")
    dst = os.path.join("/tmp", "parseoggvorbis_golden", name)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if not os.path.exists(dst) or os.path.getmtime(dst) < os.path.getmtime(src):
        with lzma.open(src, "rb") as f:
            data = f.read()
        with open(dst + ".part", "wb") as f:
            f.write(data)
        os.replace(dst + ".part", dst)
    return dst


@pytest.fixture(scope="session")
def golden_dumps():
    """Paths of the golden oracle dumps, keyed by (decoder, file)."""
    return {
        ("ours", "mono"): _decompress_golden("ours.mono.dump"),
        ("ours", "stereo"): _decompress_golden("ours.stereo.dump"),
        ("libvorbis", "mono"): _decompress_golden("libvorbis.mono.dump"),
        ("libvorbis", "stereo"): _decompress_golden("libvorbis.stereo.dump"),
    }


@pytest.fixture(scope="session")
def mono_ogg():
    return MONO_OGG


@pytest.fixture(scope="session")
def stereo_ogg():
    return STEREO_OGG

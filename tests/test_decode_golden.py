"""End-to-end differential tests against the golden oracle dumps.

The goldens were produced by the reference decoder (``ours.*``) and the
patched libvorbis (``libvorbis.*``) from /root/reference (see
tests/tools/make_golden.py).  This is the reference project's own test
strategy: diff every intermediate decode stage.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from util_compare import compare_dumps

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _decode_to_dump(ogg_path, dump_path):
    from parseoggvorbis_tpu.callbacks import registry
    from parseoggvorbis_tpu.runtime.decoder import OggReader, ParseCallbacks

    registry.set_data_output_file(dump_path)
    reader = OggReader(ParseCallbacks())
    reader.full_read(ogg_path)
    return reader


@pytest.fixture(scope="module")
def my_dumps(tmp_path_factory, mono_ogg, stereo_ogg):
    d = tmp_path_factory.mktemp("dumps")
    out = {}
    for name, ogg in (("mono", mono_ogg), ("stereo", stereo_ogg)):
        path = str(d / ("mine.%s.dump" % name))
        _decode_to_dump(ogg, path)
        out[name] = path
    return out


@pytest.mark.parametrize("which", ["mono", "stereo"])
def test_vs_reference_decoder(my_dumps, golden_dumps, which):
    """Stage-by-stage diff vs the reference C++ decoder's dump.

    Integer stages must be exact; float stages differ only by our
    higher-precision IMDCT (float64 accumulate vs Xiph float32 split-radix),
    so the tolerance here is much tighter than the libvorbis one.
    """
    n = compare_dumps(my_dumps[which], golden_dumps[("ours", which)], eps=1e-6)
    assert n == {"mono": 67, "stereo": 94}[which]


@pytest.mark.parametrize("which", ["mono", "stereo"])
def test_vs_libvorbis(my_dumps, golden_dumps, which):
    """Differential test vs ground-truth patched libvorbis (eps=1e-5,
    the reference harness's tolerance)."""
    n = compare_dumps(my_dumps[which], golden_dumps[("libvorbis", which)], eps=1e-5)
    assert n == {"mono": 67, "stereo": 94}[which]


def test_pcm_accuracy_vs_libvorbis(my_dumps, golden_dumps):
    """Quantify final PCM error vs libvorbis (north-star target: <= 1e-6)."""
    from util_compare import DumpStream

    for which in ("mono", "stereo"):
        s1 = DumpStream(my_dumps[which])
        s2 = DumpStream(golden_dumps[("libvorbis", which)])
        s1.read_setup(), s2.read_setup()
        while s1.read_audio_packet() is not None:
            pass
        while s2.read_audio_packet() is not None:
            pass
        for ch in s1.pcm:
            pcm1 = np.concatenate(s1.pcm[ch])
            pcm2 = np.concatenate(s2.pcm[ch])
            assert len(pcm1) == len(pcm2)
            err = np.max(np.abs(pcm1 - pcm2))
            assert err <= 1.1e-6, "%s ch%d pcm err %g" % (which, ch, err)


def test_cli_sample_counts(stereo_ogg):
    out = subprocess.run(
        [sys.executable, "-m", "parseoggvorbis_tpu.cli", "--in", stereo_ogg],
        capture_output=True, text=True, cwd=REPO_ROOT, check=True,
    ).stdout
    assert "sample count: 91136" in out
    assert "Ogg total packets count: 97" in out

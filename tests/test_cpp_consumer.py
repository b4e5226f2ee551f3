"""Public C++ consumer API (native/pov.hpp): compile + drive in CI.

The reference is an embeddable C++ library: a consumer subclasses
ParseCallbacks (/root/reference/src/ParseOggVorbis.hpp:966-973) and
drives OggReader::full_read (:1385-1485) to receive per-packet PCM
in-process.  pov.hpp is that surface for this framework; these tests
compile the committed example consumer (native/example_consumer.cpp)
with the system g++ against the same sources the library builds from,
run it on the golden oggs, and check the callback contract: header/
comment/setup content, total PCM sample counts (the decode-proven
numbers), the clean return-false early stop, and error reporting.
"""
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")
DATA = os.path.join(REPO, "tests", "data")


pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="g++ not available")


@pytest.fixture(scope="module")
def consumer_bin(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cpp_consumer") / "consumer_example")
    subprocess.run(
        ["g++", "-std=c++17", "-O2", "-Wall", "-Wextra", "-Werror",
         os.path.join(NATIVE, "example_consumer.cpp"),
         os.path.join(NATIVE, "pov_capi.cpp"), "-o", out],
        check=True, capture_output=True, text=True)
    return out


def _run(consumer_bin, *args):
    return subprocess.run([consumer_bin, *args], capture_output=True,
                          text=True, timeout=120)


def test_full_read_stereo_callback_stream(consumer_bin):
    p = _run(consumer_bin, os.path.join(DATA, "test.stereo44khz.ogg"))
    assert p.returncode == 0, p.stderr
    lines = p.stdout.splitlines()
    assert lines[0].startswith("header: 2 ch, 44100 Hz, blocksizes 256/2048")
    assert lines[1].startswith("comments: vendor ")
    assert "setup:" in lines[2] and "floors" in lines[2]
    assert "eof" in lines
    # 91136 = the CLI/differential-harness-proven stereo sample count
    assert lines[-1].startswith("pcm: 91136 samples per channel in ")


def test_full_read_mono_sample_count(consumer_bin):
    p = _run(consumer_bin, os.path.join(DATA, "test.mono44khz.ogg"))
    assert p.returncode == 0, p.stderr
    assert "header: 1 ch, 44100 Hz" in p.stdout
    assert "pcm: 63488 samples per channel" in p.stdout


def test_return_false_stops_cleanly(consumer_bin):
    """A consumer returning false mid-stream gets a clean success with
    only the samples delivered before the stop (pov.hpp contract; the
    Python ParseCallbacks behaves identically)."""
    p = _run(consumer_bin, os.path.join(DATA, "test.stereo44khz.ogg"),
             "1000")
    assert p.returncode == 0, p.stderr
    count = int(p.stdout.splitlines()[-1].split()[1])
    assert 1000 <= count < 91136
    assert "eof" not in p.stdout  # stopped before the EOS page


def test_parse_error_reported_as_message(consumer_bin, tmp_path):
    """Strict reference semantics: a corrupted page fails the read with
    the error message, not a crash."""
    data = bytearray(open(os.path.join(DATA,
                                       "test.mono44khz.ogg"), "rb").read())
    data[len(data) // 2] ^= 0xFF  # flip one payload byte -> CRC mismatch
    bad = tmp_path / "bad.ogg"
    bad.write_bytes(bytes(data))
    p = _run(consumer_bin, str(bad))
    assert p.returncode == 1
    assert "error:" in p.stderr and "CRC" in p.stderr


def test_missing_file_reported(consumer_bin):
    p = _run(consumer_bin, "/nonexistent/nope.ogg")
    assert p.returncode == 1
    assert "cannot open" in p.stderr

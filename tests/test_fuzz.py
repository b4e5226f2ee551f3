"""Parser fuzzing: random/mutated inputs must fail cleanly (ParseError),
never crash, hang, or silently succeed with garbage."""

import numpy as np
import pytest

from parseoggvorbis_tpu.runtime.batch import parse_stream, parse_stream_python
from parseoggvorbis_tpu.utils.bitreader import BitReader
from parseoggvorbis_tpu.utils.errors import ParseError
from parseoggvorbis_tpu.vorbis.codebook import Codebook


def test_random_bytes_rejected():
    rng = np.random.RandomState(0)
    for _ in range(20):
        blob = rng.bytes(rng.randint(1, 4096))
        with pytest.raises((ParseError, ValueError)):
            parse_stream_python(blob)


def test_mutated_setup_packets(stereo_ogg):
    """Flip bytes in the setup region; decoder must reject or decode, never
    crash. CRC catches most; disable-CRC-style mutations are simulated by
    re-checksumming is out of scope (the reference rejects on CRC too)."""
    data = bytearray(open(stereo_ogg, "rb").read())
    rng = np.random.RandomState(1)
    for _ in range(30):
        mutated = bytearray(data)
        # container/header region only for the (slow) python path — a flipped
        # codebook-count bit can legally imply a multi-million-entry parse,
        # which the C++ front-end shrugs off but python crawls through;
        # the native fuzz test below covers the whole file
        pos = rng.randint(0, 120)
        mutated[pos] ^= 1 << rng.randint(0, 8)
        try:
            parse_stream_python(bytes(mutated))
        except (ParseError, ValueError, AssertionError):
            pass  # clean rejection


def test_random_codebook_bits():
    rng = np.random.RandomState(2)
    ok = 0
    # valid sync + small dims/entries (so the python parse stays bounded),
    # then noise for the length/VQ sections
    header = b"\x42\x43\x56" + b"\x04\x00" + b"\x40\x00\x00"
    for _ in range(50):
        blob = rng.bytes(64)
        br = BitReader(header + blob)
        try:
            Codebook.parse(br)
            ok += 1
        except (ParseError, ValueError):
            pass
    # noise essentially never forms a valid canonical codebook
    assert ok <= 2


def test_native_fuzz_rejects(stereo_ogg):
    from parseoggvorbis_tpu.native.frontend import available, parse_stream_native

    if not available():
        pytest.skip("native front-end not built")
    rng = np.random.RandomState(3)
    data = bytearray(open(stereo_ogg, "rb").read())
    for _ in range(30):
        mutated = bytearray(data)
        pos = rng.randint(0, len(data))
        mutated[pos] ^= 1 << rng.randint(0, 8)
        try:
            parse_stream_native(bytes(mutated))
        except ParseError:
            pass

    # python and native front-ends agree on accept/reject for truncations
    for cut in (100, 5000, 20000):
        py_err = nat_err = None
        try:
            parse_stream_python(bytes(data[:cut]))
        except Exception as e:
            py_err = type(e).__name__
        try:
            parse_stream_native(bytes(data[:cut]))
        except Exception as e:
            nat_err = type(e).__name__
        assert (py_err is None) == (nat_err is None)

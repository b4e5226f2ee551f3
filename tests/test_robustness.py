"""Robustness: corrupt-input handling, per-stream isolation, chained streams."""

import numpy as np
import pytest

from parseoggvorbis_tpu.runtime.batch import decode_corpus
from parseoggvorbis_tpu.runtime.decoder import OggReader, ParseCallbacks
from parseoggvorbis_tpu.utils.errors import ParseError


@pytest.fixture(scope="module")
def blobs(mono_ogg, stereo_ogg):
    return {
        "mono": open(mono_ogg, "rb").read(),
        "stereo": open(stereo_ogg, "rb").read(),
    }


def test_crc_corruption_detected(blobs):
    data = bytearray(blobs["stereo"])
    data[5000] ^= 0xFF
    with pytest.raises(ParseError, match="CRC"):
        decode_corpus([bytes(data)])


def test_truncation_detected(blobs):
    with pytest.raises(ParseError):
        decode_corpus([blobs["stereo"][:20000]])


def test_per_stream_error_isolation(blobs):
    corrupt = bytearray(blobs["stereo"])
    corrupt[5000] ^= 0xFF
    outs = decode_corpus(
        [blobs["mono"], bytes(corrupt), blobs["stereo"], b"garbage"],
        strict=False,
    )
    assert outs[0].ok and outs[0].num_samples == 63488
    assert not outs[1].ok and "CRC" in outs[1].error
    assert outs[2].ok and outs[2].num_samples == 91136
    assert not outs[3].ok


def test_chained_streams(blobs):
    """Two complete Ogg streams back to back (chained), distinct serials.

    The reference handles this via per-serial stream demux
    (ParseOggVorbis.hpp:1385-1485); our streaming decoder must too.
    """
    chained = blobs["mono"] + blobs["stereo"]

    class Collect(ParseCallbacks):
        def __init__(self):
            self.headers = []
            self.samples = {}
            self.eofs = 0

        def got_header(self, header):
            self.headers.append((header.audio_channels, header.audio_sample_rate))
            return True

        def got_pcm_data(self, pcm):
            key = pcm.shape[0]
            self.samples[key] = self.samples.get(key, 0) + pcm.shape[1]
            return True

        def got_eof(self):
            self.eofs += 1
            return True

    cb = Collect()
    OggReader(cb).full_read_from_memory(chained)
    assert cb.headers == [(1, 44100), (2, 44100)]
    assert cb.samples == {1: 63488, 2: 91136}
    assert cb.eofs == 2


def test_early_stop_callback(blobs):
    class StopAfterHeader(ParseCallbacks):
        def __init__(self):
            self.got = False

        def got_header(self, header):
            self.got = True
            return False  # stop parsing

        def got_pcm_data(self, pcm):
            raise AssertionError("should not decode audio after stop")

    cb = StopAfterHeader()
    OggReader(cb).full_read_from_memory(blobs["stereo"])
    assert cb.got

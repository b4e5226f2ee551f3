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


def test_granule_validation_errors():
    """DecodeState.ready_pcm enforces the reference's granule-position
    rules (ParseOggVorbis.hpp:1019-1059): position past the granule and
    granule-implied mid-stream short frames are both stream errors."""
    import numpy as np
    import pytest

    from parseoggvorbis_tpu.runtime.state import DecodeState

    def advance(st, frames):
        for _ in range(frames):
            st.begin_frame(256)
            st.add_pcm_frame(0, np.zeros(256, np.float32),
                             np.zeros(256, np.float32))
            st.ready_pcm()

    st = DecodeState(1)
    advance(st, 3)  # abs_total_pos = 256
    assert st.abs_total_pos == 256
    st.set_expected_ending_pos(50)  # already past
    st.begin_frame(256)
    with pytest.raises(ValueError, match="past granule position"):
        st.ready_pcm()

    st = DecodeState(1)
    advance(st, 3)
    st.set_expected_ending_pos(10_000)  # this emission cannot reach it
    st.begin_frame(256)
    with pytest.raises(ValueError, match="mid-stream short frame"):
        st.ready_pcm()

    # the legal case: granule truncates the final emission exactly
    st = DecodeState(1)
    advance(st, 3)
    st.set_expected_ending_pos(256 + 100)
    st.begin_frame(256)
    out = st.ready_pcm()
    assert out.shape == (1, 100)
    assert st.abs_total_pos == 356


def test_make_mesh_errors():
    from parseoggvorbis_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="need 1000 devices"):
        make_mesh(1000)
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(8, model=3)


def test_phase_summary_interval_merge():
    """phase_summary reduces the event timeline to per-phase wall
    occupancy: busy = union length of intervals (overlaps merged), bytes
    summed, effective MB/s = bytes/busy.  bench.py embeds this; the math
    is what makes the 'link-bound' claim quantitative."""
    from parseoggvorbis_tpu.runtime.device_decoder import _TransferStats

    st = _TransferStats()
    assert st.phase_summary() == {}
    # two overlapping fetches (1.0-3.0 merged) + one disjoint (4.0-5.0)
    st.event("fetch", 1.0, 2.5, 10_000_000)
    st.event("fetch", 2.0, 3.0, 10_000_000)
    st.event("fetch", 4.0, 5.0, 10_000_000)
    st.event("dispatch", 0.0, 0.5, 3_000_000)
    s = st.phase_summary()
    assert s["wall_span"] == 5.0
    f = s["fetch"]
    assert f["count"] == 3
    assert abs(f["busy_s"] - 3.0) < 1e-9  # 2.0 merged + 1.0 disjoint
    assert f["span_s"] == 4.0
    assert f["bytes"] == 30_000_000
    assert abs(f["mb_per_s"] - 10.0) < 1e-6
    assert s["dispatch"]["count"] == 1
    assert "parse" not in s  # no parse events recorded
    st.clear_events()
    assert st.phase_summary() == {}
    # counters are independent of the event timeline
    st.add(100, 200)
    snap = st.snapshot()
    assert (snap["bytes_in"], snap["bytes_out"], snap["dispatches"]) == (100, 200, 1)
    st.reset()
    assert st.snapshot()["dispatches"] == 0


@pytest.mark.parametrize("stage", ["got_comments", "got_setup",
                                   "got_pcm_data", "got_eof"])
def test_early_stop_at_every_callback_stage(blobs, stage):
    """Returning False from ANY ParseCallbacks hook stops the parse there
    (reference ParseCallbacks contract, ParseOggVorbis.hpp:966-973) — no
    later-stage callback fires."""
    order = ["got_header", "got_comments", "got_setup", "got_pcm_data",
             "got_eof"]

    class StopAt(ParseCallbacks):
        def __init__(self):
            self.seen = []

    def make_hook(name):
        def hook(self, *a):
            if name not in self.seen:
                self.seen.append(name)
            return name != stage
        return hook

    for name in order:
        setattr(StopAt, name, make_hook(name))
    cb = StopAt()
    OggReader(cb).full_read_from_memory(blobs["stereo"])
    idx = order.index(stage)
    later = set(order[idx + 1:]) - {"got_pcm_data"} if stage != "got_pcm_data" \
        else set(order[idx + 1:])
    assert stage in cb.seen
    assert not (set(cb.seen) & later), cb.seen


def test_zero_audio_frame_stream():
    """A legal stream with headers but no audio packets decodes to an
    empty PCM result on every path — no warnings, no errors."""
    import sys as _sys
    import warnings

    from conftest import REPO_ROOT

    _sys.path.insert(0, REPO_ROOT + "/tests/tools")
    from make_synth_vorbis import SynthStream

    from parseoggvorbis_tpu.runtime.batch import (decode_bytes,
                                                  decode_bytes_streaming)

    blob = SynthStream(bs0=512, bs1=2048, seed=0).make(num_frames=0)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = decode_bytes(blob)
        assert out.pcm.shape == (1, 0) and out.num_samples == 0
        py = decode_bytes(blob, prefer_native=False)
        assert py.pcm.shape == (1, 0)
        got = decode_bytes_streaming(blob).read_all()
        assert got.pcm.shape == (1, 0)


def test_invalid_floor_type_rejected():
    from parseoggvorbis_tpu.utils.bitreader import BitReader
    from parseoggvorbis_tpu.utils.errors import ParseError
    from parseoggvorbis_tpu.vorbis.floor import Floor

    with pytest.raises(ParseError, match="invalid floor type 2"):
        Floor.parse(BitReader(b"\x02\x00" + b"\x00" * 16), 0)

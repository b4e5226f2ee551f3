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


class _ParseBudget:
    """SIGALRM-based wall-clock budget for one parse attempt.

    A flipped codebook-count bit can legally imply a multi-million-entry
    setup parse — bounded work the C++ front-end shrugs off but Python
    crawls through.  The budget distinguishes 'slow but bounded' from a
    hang/crash; budget hits must still be clean rejections natively.
    """

    class Timeout(Exception):
        pass

    def __init__(self, seconds: float):
        self.seconds = seconds

    def __enter__(self):
        import signal

        def _fire(signum, frame):
            raise _ParseBudget.Timeout()

        self._old = signal.signal(signal.SIGALRM, _fire)
        signal.setitimer(signal.ITIMER_REAL, self.seconds)
        return self

    def __exit__(self, *exc):
        import signal

        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, self._old)
        return False


def test_mutated_whole_file_python(stereo_ogg):
    """Flip one random bit anywhere in the file; the python front-end must
    reject cleanly or decode, never crash or hang (10s budget per parse)."""
    data = bytearray(open(stereo_ogg, "rb").read())
    rng = np.random.RandomState(1)
    budget_hits = 0
    for _ in range(60):
        mutated = bytearray(data)
        pos = rng.randint(0, len(data))
        mutated[pos] ^= 1 << rng.randint(0, 8)
        try:
            with _ParseBudget(10.0):
                parse_stream_python(bytes(mutated))
        except (ParseError, ValueError, AssertionError):
            pass  # clean rejection
        except _ParseBudget.Timeout:
            budget_hits += 1
    # legally-huge setup tables are rare under single-bit flips; anything
    # more smells like an accidental quadratic blowup (threshold is loose:
    # this host's single core is throttled unpredictably)
    assert budget_hits <= 10, budget_hits


def test_truncation_sweep_every_page_boundary(stereo_ogg, mono_ogg):
    """Truncate at (and one byte around) every page boundary; python and
    native front-ends must agree on accept/reject at every cut."""
    from parseoggvorbis_tpu.native.frontend import available, parse_streams_native
    from parseoggvorbis_tpu.ogg.page import read_page

    if not available():
        pytest.skip("native front-end not built")
    for path in (stereo_ogg, mono_ogg):
        data = open(path, "rb").read()
        boundaries = [0]
        off = 0
        while True:
            page, off = read_page(data, off)
            if page is None:
                break
            boundaries.append(off)
        assert len(boundaries) > 3
        cuts = sorted({max(0, b + d) for b in boundaries for d in (-1, 0, 1)})
        for cut in cuts:
            blob = data[:cut]
            py_err = nat_err = None
            try:
                parse_stream_python(blob)
            except Exception as e:
                py_err = type(e).__name__
            try:
                parse_streams_native(blob)
            except Exception as e:
                nat_err = type(e).__name__
            assert (py_err is None) == (nat_err is None), (
                path, cut, py_err, nat_err)


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


def test_roundtrip_differential_vs_system_libvorbis():
    """Seeded mini-campaign of tools/fuzz_roundtrip.py: random audio ->
    system libvorbisenc -> decode ours vs system libvorbisfile.  This is
    the harness that caught the multichannel residue-order bug the
    reference itself has (see vorbis/residue.py NOTE)."""
    import os
    import sys

    from conftest import REPO_ROOT

    sys.path.insert(0, os.path.join(REPO_ROOT, "tests", "tools"))
    sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
    import vorbis_oracle

    if not vorbis_oracle.available():
        pytest.skip("system libvorbis not installed")
    import fuzz_roundtrip

    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    rng = np.random.RandomState(7)
    worst = 0.0
    for i in range(8):
        pcm, rate = fuzz_roundtrip.random_audio(rng)
        q = float(rng.uniform(-0.1, 1.0))
        try:
            ogg = vorbis_oracle.encode_ogg(pcm, rate, q, serial=i)
        except RuntimeError:
            continue
        ours = decode_bytes(ogg)
        ref, ref_rate = vorbis_oracle.decode_ogg(ogg)
        assert ours.sample_rate == ref_rate
        assert ours.pcm.shape == ref.shape
        worst = max(worst, float(np.abs(ours.pcm - ref).max()))
    assert worst <= 1e-6, worst


def test_mutated_floor0_stream(tmp_path):
    """Bit flips on a synthetic floor0 stream: clean rejection or decode,
    and python/native front-ends agree on accept/reject."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tools"))
    from make_synth_vorbis import make_floor0_stream
    from parseoggvorbis_tpu.native.frontend import available, parse_stream_native

    data = bytearray(make_floor0_stream(seed=0, num_frames=8))
    rng = np.random.RandomState(3)
    native = available()
    for _ in range(40):
        mutated = bytearray(data)
        pos = rng.randint(0, len(data))
        mutated[pos] ^= 1 << rng.randint(0, 8)
        blob = bytes(mutated)
        py_ok = True
        try:
            with _ParseBudget(10.0):
                parse_stream_python(blob)
        except (ParseError, ValueError, AssertionError):
            py_ok = False
        except _ParseBudget.Timeout:
            continue
        if native:
            nat_ok = True
            try:
                parse_stream_native(blob)
            except (ParseError, ValueError, RuntimeError):
                nat_ok = False
            assert nat_ok == py_ok, "front-end accept/reject disagreement"


@pytest.mark.parametrize("kind", ["bs8192", "residue0", "mixed", "golden"])
def test_mutated_streams_full_decode(kind, stereo_ogg):
    """Bit flips on the synthetic decode surfaces (8192 blocks, residue
    type 0, mixed floor0+floor1), pushed through the FULL decode — not
    just the parse.  A mutation that still parses must decode to a result
    or raise a clean error; the planner/device pipeline must never crash
    on legal-but-weird symbol values (budget 30s per decode)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tools"))
    from make_synth_vorbis import SynthStream, make_8192_stream

    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    if kind == "bs8192":
        data = bytearray(make_8192_stream(seed=0, num_frames=6))
    elif kind == "residue0":
        data = bytearray(SynthStream(bs0=512, bs1=2048, seed=0,
                                     residue_type=0).make(num_frames=8))
    elif kind == "mixed":
        data = bytearray(SynthStream(bs0=512, bs1=2048, seed=0,
                                     floor_kind="mixed").make(num_frames=8))
    else:
        data = bytearray(open(stereo_ogg, "rb").read())
    # flips target page payloads with the page CRC re-sealed, so the
    # mutation survives demux and reaches the codec layers
    from page_mutate import flip_payload_bit, page_spans

    data = bytes(data)
    spans = page_spans(data)
    rng = np.random.RandomState(11)
    decoded = 0
    for _ in range(30):
        blob = flip_payload_bit(data, rng, spans=spans)
        try:
            with _ParseBudget(30.0):
                out = decode_bytes(blob)
        except (ParseError, ValueError, AssertionError, RuntimeError):
            continue  # clean rejection anywhere in the stack
        except _ParseBudget.Timeout:
            continue  # bounded-but-slow legal setup parse
        # decoded garbage is fine (wrong VQ values -> wrong audio, possibly
        # inf via a blown floor amplitude) -- crashing is not
        assert out.pcm.shape[0] >= 1
        decoded += 1
    # most flips land in audio-packet payloads and still decode; if nearly
    # everything is rejected the mutation loop isn't exercising the decoder
    assert decoded >= 5, decoded


def test_incremental_truncation_agreement(stereo_ogg):
    """Truncating at page boundaries: the incremental parser must agree
    with the whole-file native parse — same total frames when accepted,
    an error somewhere when rejected, never a crash or silent divergence."""
    from parseoggvorbis_tpu.native.frontend import (NativeIncremental,
                                                    available,
                                                    parse_stream_native)
    from parseoggvorbis_tpu.ogg.page import read_page

    if not available():
        pytest.skip("native front-end not built")
    data = open(stereo_ogg, "rb").read()
    bounds = []
    off = 0
    while True:
        page, off2 = read_page(data, off)
        if page is None:
            break
        bounds.append(off2)
        off = off2
    for cut in bounds[1:] + [b - 1 for b in bounds[2:]]:
        blob = data[:cut]
        whole_frames = None
        try:
            p = parse_stream_native(blob)
            whole_frames = len(p.mode_idx)
        except (ParseError, RuntimeError):
            pass
        inc_frames = 0
        inc_err = False
        try:
            inc = NativeIncremental(blob)
            first = True
            while True:
                view, has_ctx = inc.next_window(16)
                if view is None:
                    break
                inc_frames += len(view.mode_idx) - (0 if first else 1)
                first = False
            inc.close()
        except (ParseError, RuntimeError):
            inc_err = True
        if whole_frames is None:
            assert inc_err, "incremental accepted what whole-parse rejects"
        else:
            assert not inc_err and inc_frames == whole_frames, cut

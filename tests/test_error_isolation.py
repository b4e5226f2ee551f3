"""Uniform per-stream error isolation across all dispatch paths.

A poison stream (valid Ogg framing, impossible granule accounting — the
device launcher rejects it at prepare time) must fail ONLY itself:
- per-stream path (default)
- stacked-group path (POV_GROUP_STREAMS > 1)
- multi-chip mesh path
while strict=True still raises.  Round-2 VERDICT item 6: previously the
stacked/mesh paths shared launch-phase failures by construction.
"""

import os
import sys

import numpy as np
import pytest

from conftest import MONO_OGG, STEREO_OGG

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools"))
from repaginate import demux_packets, _emit_page, _lacings  # noqa: E402


@pytest.fixture(scope="module")
def poison_ogg():
    """Golden mono file with a mid-stream granule rewound to 1: parses
    clean, but emission accounting raises ('granule implies mid-stream
    short frame') when the decode launches."""
    data = open(MONO_OGG, "rb").read()
    serial, packets = demux_packets(data)
    granuled = [i for i, (_, g) in enumerate(packets) if g >= 0 and i > 3]
    poison_at = granuled[len(granuled) // 2]
    out = bytearray()
    for i, (pkt, granule) in enumerate(packets):
        bos = 0x02 if i == 0 else 0
        eos = 0x04 if i == len(packets) - 1 else 0
        g = granule if granule >= 0 else (0 if i < 3 else -1)
        if i == poison_at:
            g = 1
        _emit_page(out, serial, i, g, bos | eos,
                   _lacings(len(pkt), terminated=True), pkt)
    return bytes(out)


@pytest.fixture(scope="module")
def blobs(poison_ogg):
    return [open(MONO_OGG, "rb").read(), poison_ogg,
            open(STEREO_OGG, "rb").read()]


def _check_isolated(outs, blobs):
    assert len(outs) == len(blobs)
    assert outs[0].ok and outs[2].ok
    assert not outs[1].ok
    assert "granule" in outs[1].error
    assert outs[0].num_samples == 63488
    assert outs[2].num_samples == 91136


def test_poison_parses_but_fails_decode(poison_ogg):
    from parseoggvorbis_tpu.runtime.batch import decode_bytes, parse_stream

    parse_stream(poison_ogg)  # the host pass itself accepts the framing
    with pytest.raises(Exception, match="granule"):
        decode_bytes(poison_ogg)


def test_isolation_per_stream_path(blobs):
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    _check_isolated(decode_corpus(blobs, strict=False), blobs)


def test_isolation_stacked_group_path(blobs, monkeypatch):
    from parseoggvorbis_tpu.runtime import device_decoder as dd
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    monkeypatch.setattr(dd, "_GROUP_S", 8)
    _check_isolated(decode_corpus(blobs, strict=False), blobs)
    with pytest.raises(Exception, match="granule"):
        decode_corpus(blobs, strict=True)


def test_isolation_mesh_path(blobs):
    from parseoggvorbis_tpu.parallel.mesh import make_mesh
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    mesh = make_mesh(8, model=1)
    outs = decode_corpus(blobs * 2, mesh=mesh, strict=False)
    _check_isolated(outs[:3], blobs)
    _check_isolated(outs[3:], blobs)
    # healthy streams must decode identically to the per-stream path
    ref = decode_corpus([blobs[0], blobs[2]])
    np.testing.assert_array_equal(outs[0].pcm, ref[0].pcm)
    np.testing.assert_array_equal(outs[2].pcm, ref[1].pcm)
    with pytest.raises(Exception, match="granule"):
        decode_corpus(blobs, mesh=mesh, strict=True)

"""Callbacks registry + dump reader API surfaces.

Covers the reference-parity pieces the end-to-end tests don't reach
directly: the ``--debug_stdout`` short renderer (Callbacks.cpp:292-315),
null-sink reset, decoder aliases (register_decoder_alias), and the dump
reader's malformed-input rejections.
"""

import io

import numpy as np
import pytest

from conftest import MONO_OGG

from parseoggvorbis_tpu.callbacks import registry
from parseoggvorbis_tpu.callbacks.format import (MAGIC, DT_FLOAT32, DT_UINT8,
                                                 DT_UINT32, pack_record,
                                                 pack_typed)
from parseoggvorbis_tpu.callbacks.reader import DumpReader


def test_debug_stdout_renderer(capsys):
    """The short-stdout sink prints one line per tap with the reference's
    field layout; a data filter restricts which taps render."""
    from parseoggvorbis_tpu.runtime.decoder import OggReader, ParseCallbacks

    registry.set_data_output_short_stdout()
    registry.set_data_filter(["floor1 ys", "finish_audio_packet"])
    OggReader(ParseCallbacks()).full_read(MONO_OGG)
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    assert lines
    assert all(l.startswith("decoder=") for l in lines)
    ys = [l for l in lines if "name='floor1 ys'" in l]
    markers = [l for l in lines if "name='finish_audio_packet'" in l]
    assert ys and markers
    assert all("data=NULL" in l for l in markers)  # marker taps carry no data
    assert any("..." in l for l in ys)  # >10 values elide
    assert not any("name='after_residue'" in l for l in lines)  # filtered out


def test_stdout_f32_formatting(capsys):
    """f32 values render via repr(float), ints via str — the same split the
    reference's stdout renderer makes."""
    ref = object()
    registry.set_data_output_short_stdout()
    taps = registry.register_decoder(ref, "t", 1, 1)
    taps.push("x", 0, np.array([0.5, 1.25], dtype=np.float32))
    taps.push("y", -1, np.array([7], dtype=np.uint32))
    registry.unregister_decoder(ref)
    out = capsys.readouterr().out
    assert "data=f32{0.5 1.25} len=2" in out
    assert "channel=-1 data=u32{7} len=1" in out


def test_set_data_output_null_resets():
    registry.set_data_output_short_stdout()
    registry.set_data_output_null()
    ref = object()
    taps = registry.register_decoder(ref, "t", 1, 1)
    assert not taps.enabled
    registry.unregister_decoder(ref)


def test_decoder_alias():
    """An alias ref resolves to the original decoder's taps and can also
    unregister it (the reference's decoder_alias_map contract)."""
    orig, alias = object(), object()
    buf = io.BytesIO()
    registry.set_data_output_fileobj(buf)
    taps = registry.register_decoder(orig, "t", 44100, 2)
    registry.register_decoder_alias(orig, alias)
    assert registry.get_decoder(alias) is taps
    assert registry.get_decoder(orig) is taps
    registry.unregister_decoder(alias)
    assert registry.get_decoder(orig) is None


def test_dump_reader_roundtrip_from_bytes():
    """Write taps through the registry into a BytesIO, read them back from
    raw bytes (the reader accepts bytes, file objects, and paths)."""
    ref = object()
    buf = io.BytesIO()
    registry.set_data_output_fileobj(buf)
    taps = registry.register_decoder(ref, "mydec", 48000, 2)
    taps.push("a", 0, np.array([1.0, 2.0], dtype=np.float32))
    taps.push("mark", -1, None)
    taps.push("big", 1, np.arange(32, dtype=np.uint32))
    registry.unregister_decoder(ref)

    r = DumpReader(buf.getvalue())
    assert r.decoder_name == "mydec"
    assert r.decoder_sample_rate == 48000
    assert r.decoder_num_channels == 2
    got = list(r.entries())
    assert [(n, c, len(v)) for n, c, v in got] == [
        ("a", 0, 2), ("mark", None, 0), ("big", 1, 32)]
    np.testing.assert_array_equal(got[0][2], [1.0, 2.0])
    r.dump_entry(*got[2])  # human-readable line formatter (>10 elides)


def _header(name=b"d", rate=1, ch=1):
    return (pack_record(MAGIC)
            + pack_typed("decoder-name", DT_UINT8, name)
            + pack_typed("decoder-sample-rate", DT_UINT32,
                         np.array([rate], "<u4").tobytes())
            + pack_typed("decoder-num-channels", DT_UINT8, bytes([ch])))


def test_dump_reader_rejects_malformed():
    with pytest.raises(ValueError, match="bad dump magic"):
        DumpReader(pack_record(b"not-the-magic") + b"\x00" * 8)
    # truncated record: length prefix promises more bytes than exist
    with pytest.raises(ValueError, match="truncated record"):
        DumpReader(pack_record(MAGIC)[:20])
    # wrong header key
    bad = pack_record(MAGIC) + pack_typed("wrong-key", DT_UINT8, b"d")
    with pytest.raises(ValueError, match="expected key"):
        DumpReader(bad)
    # an entry whose elem_size record disagrees with its type id
    evil = (pack_record(b"k") + pack_record(bytes([DT_FLOAT32]))
            + pack_record(bytes([1])) + pack_record(b"\x00\x00\x00\x00"))
    with pytest.raises(ValueError, match="element size mismatch"):
        DumpReader(_header() + evil).read()
    # entry missing its entry-data record
    noent = _header() + pack_typed("entry-name", DT_UINT8, b"t") + \
        pack_typed("something-else", DT_UINT8, b"z")
    with pytest.raises(ValueError, match="expected entry-data"):
        DumpReader(noent).read_entry()

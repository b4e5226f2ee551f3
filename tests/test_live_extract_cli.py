"""CLI tests for tools/live_extract — every mode of the reference's
demo_live_extract.py CLI contract (reference: demo_live_extract.py:508-599),
including the ZIP corpus sweep and --multi_threaded.

Round-1 regression: the default --mode dump crashed with AttributeError
(dump_entry missing on the reader).
"""

import os
import zipfile

import pytest

from parseoggvorbis_tpu.tools.live_extract import main

from conftest import MONO_OGG, STEREO_OGG


@pytest.fixture(scope="module")
def corpus_zip(tmp_path_factory):
    path = tmp_path_factory.mktemp("corpus") / "corpus.zip"
    with zipfile.ZipFile(path, "w") as z:
        z.write(MONO_OGG, "a/mono.ogg")
        z.write(STEREO_OGG, "b/stereo.ogg")
        z.writestr("notes.txt", "not an ogg")
    return str(path)


def test_mode_dump_default(capsys):
    assert main([MONO_OGG]) == 0
    out = capsys.readouterr().out
    # one rendered line per tap, reference line format
    assert "Decoder 'ParseOggVorbis' name='floor1_unpack multiplier' " \
           "channel=None data=[4] len=1" in out
    assert "name='finish_setup' channel=None data=[] len=0" in out
    # 67 mono audio packets -> 67 finish_audio_packet markers
    assert "Entry name counts:" in out
    assert "'finish_audio_packet': 67" in out
    assert out.rstrip().endswith("Finished")


def test_mode_dump_truncates_long_entries(capsys):
    assert main([MONO_OGG, "--filter", "floor1_unpack xs"]) == 0
    out = capsys.readouterr().out
    assert "]... len=29" in out  # >10 values render first 10 + ellipsis


def test_mode_floor_ys(capsys):
    assert main([MONO_OGG, "--mode", "floor_ys", "--output_dim", "32"]) == 0
    out = capsys.readouterr().out
    # 67 mono packets; the first frame emits no floor row (66 rows)
    assert "res shape: (66, 32)" in out
    assert out.rstrip().endswith("Finished")


def test_mode_residue_ys(capsys):
    rc = main([
        MONO_OGG, "--mode", "residue_ys", "--output_dim", "32",
        "--scale", "0.5", "--clip_abs_max", "1.0",
        "--filter", "floor1_unpack multiplier", "floor1_unpack xs",
        "finish_setup", "floor_number", "after_residue",
        "finish_audio_packet",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "res shape: (" in out
    assert out.rstrip().endswith("Finished")


def test_mode_floor_ys_device(capsys):
    """--device computes the matrices on the TPU path, same values."""
    from parseoggvorbis_tpu.native.frontend import available

    if not available():
        import pytest

        pytest.skip("native front-end not built")
    assert main([MONO_OGG, "--mode", "floor_ys", "--output_dim", "32",
                 "--device"]) == 0
    dev_out = capsys.readouterr().out
    assert main([MONO_OGG, "--mode", "floor_ys", "--output_dim", "32"]) == 0
    host_out = capsys.readouterr().out
    assert dev_out.splitlines()[0] == host_out.splitlines()[0]  # res shape


def test_invalid_mode_raises():
    with pytest.raises(Exception, match="invalid mode"):
        main([MONO_OGG, "--mode", "bogus"])


def test_zip_sweep(corpus_zip, capsys):
    assert main([corpus_zip]) == 0
    out = capsys.readouterr().out
    assert "Got a ZIP file" in out
    assert "a/mono.ogg" in out and "b/stereo.ogg" in out
    assert "'finish_audio_packet': 67" in out   # mono
    assert "'finish_audio_packet': 94" in out   # stereo
    assert "Found 3 OGG files." in out  # reference quirk: counts all members


def test_zip_sweep_multi_threaded(corpus_zip, capsys):
    assert main([corpus_zip, "--multi_threaded", "--mode", "floor_ys",
                 "--output_dim", "32"]) == 0
    out = capsys.readouterr().out
    assert "res shape: (66, 32)" in out   # mono
    assert "res shape: (186, 32)" in out  # stereo: 2 rows/frame (per channel)

"""In-process CLI + comparator contract tests.

The CLI and the dump comparator are otherwise exercised only through
subprocesses (tools/compare_corpus.py, the verify recipe), which keeps
their lines invisible to in-process coverage and slower to test.  These
run the same contracts directly: reference-parity output lines, usage
errors, the --ogg/--ourout/--zip comparator modes.
"""

import os
import zipfile

import pytest

from conftest import MONO_OGG, STEREO_OGG, REPO_ROOT

from parseoggvorbis_tpu import cli
from parseoggvorbis_tpu.tools import compare


def test_cli_decode_contract(capsys):
    assert cli.main(["cli", "--in", MONO_OGG]) == 0
    out = capsys.readouterr().out
    assert "got eof. sample count: 63488" in out
    assert "Ogg total packets count: 70" in out
    assert cli.main(["cli", "--in", STEREO_OGG]) == 0
    out = capsys.readouterr().out
    assert "got eof. sample count: 91136" in out
    assert "Ogg total packets count: 97" in out
    assert "Header: vorbis version: 0, channels: 2, sample rate: 44100" in out


def test_cli_usage_errors(capsys):
    assert cli.main(["cli"]) == 1
    assert "need to provide --in" in capsys.readouterr().err
    assert cli.main(["cli", "--frobnicate"]) == 1
    assert "unexpected arg" in capsys.readouterr().err
    assert cli.main(["cli", "--in"]) == 1
    assert "missing arg after --in" in capsys.readouterr().err
    assert cli.main(["cli", "--help"]) == 1
    assert cli.main(["cli", "--in", "/nonexistent.ogg"]) == 1
    assert "error:" in capsys.readouterr().err


def test_cli_dump_compares_against_golden(golden_dumps, tmp_path, capsys):
    dump = str(tmp_path / "mine.dump")
    assert cli.main(["cli", "--in", STEREO_OGG, "--debug_out", dump]) == 0
    assert os.path.getsize(dump) > 100000
    capsys.readouterr()
    rc = compare.main(["--ourout", dump,
                       "--libvorbisout", golden_dumps[("libvorbis", "stereo")]])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Finished." in out
    assert "Num audio packets: 94" in out


def test_compare_ogg_mode(golden_dumps, capsys):
    rc = compare.main(["--ogg", MONO_OGG,
                       "--libvorbisout", golden_dumps[("libvorbis", "mono")]])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Finished." in out


def test_compare_zip_sweep(golden_dumps, tmp_path, capsys):
    """--zip mode with the native pov_decode as the oracle executable:
    every member is decoded by BOTH pipelines (python dump vs native dump)
    and compared stage-by-stage — a cross-implementation sweep."""
    from parseoggvorbis_tpu.native.frontend import available

    if not available():
        pytest.skip("native front-end not built")
    exe = os.path.join(REPO_ROOT, "parseoggvorbis_tpu", "native", "pov_decode")
    if not os.path.exists(exe):
        pytest.skip("pov_decode binary not built")
    zpath = str(tmp_path / "sweep.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(MONO_OGG, "a/mono.ogg")
        z.write(STEREO_OGG, "b/stereo.ogg")
        z.writestr("notes.txt", "not an ogg")
    rc = compare.main(["--zip", zpath, "--oracleexec", exe])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Compared 2 OGG files." in out

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


def test_to_wav_tool(tmp_path):
    """to_wav: full decode, seek range, and recover all produce valid WAVs
    whose samples equal the library decode's."""
    import wave

    import numpy as np

    from conftest import STEREO_OGG
    from parseoggvorbis_tpu.ogg.seek import walk_pages
    from parseoggvorbis_tpu.runtime.batch import decode_bytes
    from parseoggvorbis_tpu.tools.to_wav import main as to_wav

    data = open(STEREO_OGG, "rb").read()
    full = decode_bytes(data, out_i16=True).pcm

    def read_wav(p):
        with wave.open(str(p), "rb") as w:
            c, n, rate = w.getnchannels(), w.getnframes(), w.getframerate()
            pcm = np.frombuffer(w.readframes(n), np.int16)
        return pcm.reshape(n, c).T, rate

    out = tmp_path / "full.wav"
    assert to_wav([STEREO_OGG, str(out)]) == 0
    pcm, rate = read_wav(out)
    assert rate == 44100
    np.testing.assert_array_equal(pcm, full)

    out = tmp_path / "range.wav"
    assert to_wav([STEREO_OGG, str(out), "--start", "1000",
                   "--end", "5000"]) == 0
    pcm, _ = read_wav(out)
    np.testing.assert_array_equal(pcm, full[:, 1000:5000])

    out = tmp_path / "sec.wav"
    assert to_wav([STEREO_OGG, str(out), "--seconds", "--start", "0.25",
                   "--end", "0.5"]) == 0
    pcm, _ = read_wav(out)
    assert pcm.shape == (2, 11025)

    # recover a damaged copy
    v = walk_pages(data).audio_pages[2]
    bad = bytearray(data)
    bad[v.offset + 99] ^= 0x40
    src = tmp_path / "damaged.ogg"
    src.write_bytes(bytes(bad))
    out = tmp_path / "rec.wav"
    assert to_wav([str(src), str(out), "--recover"]) == 0
    pcm, _ = read_wav(out)
    assert pcm.shape == full.shape

    # native route
    out = tmp_path / "native.wav"
    assert to_wav([STEREO_OGG, str(out), "--route", "native"]) == 0
    pcm, _ = read_wav(out)
    assert int(np.abs(pcm.astype(np.int32)
                      - full.astype(np.int32)).max()) <= 1

    # recover composes with sample ranges (windowed recovery)
    out = tmp_path / "recrange.wav"
    assert to_wav([str(src), str(out), "--recover", "--start", "1000",
                   "--end", "5000"]) == 0
    pcm, _ = read_wav(out)
    np.testing.assert_array_equal(pcm, full[:, 1000:5000])
    with pytest.raises(SystemExit):
        to_wav([STEREO_OGG, str(out), "--recover", "--seconds",
                "--start", "1"])


def test_to_wav_rejects_fractional_samples(tmp_path):
    from parseoggvorbis_tpu.tools.to_wav import main as to_wav

    from conftest import STEREO_OGG

    out = tmp_path / "x.wav"
    with pytest.raises(SystemExit):
        to_wav([STEREO_OGG, str(out), "--start", "44100.9"])
    # the same value is fine as seconds
    assert to_wav([STEREO_OGG, str(out), "--seconds", "--start", "1.5"]) == 0

"""The RETURNN import-point module (reference: returnn_import.py).

Must be importable standalone (vendored-at-RETURNN/extern layout), expose
the singleton lib, and map all five feature kinds 1:1 to the reference's
(returnn_import.py:77-117) — outputs already validated bit-exact against
the reference's golden matrices in test_features.py via the shared
extractors.
"""

import subprocess
import sys

import numpy as np
import pytest

from conftest import MONO_OGG, REPO_ROOT

sys.path.insert(0, REPO_ROOT)

import returnn_import


def test_singleton():
    lib = returnn_import.ParseOggVorbisLib.get_instance()
    assert lib is returnn_import.ParseOggVorbisLib.get_instance()


def test_kinds_match_reference():
    assert set(returnn_import.FEATURE_KINDS) == {
        "floor_final_ys", "floor_final_ys_rendered",
        "floor_final_ys_rendered_concat_residue", "residue_ys",
        "residue_ys_with_floor",
    }


@pytest.mark.parametrize("kind,dim", [
    ("floor_final_ys", 32),
    ("floor_final_ys_rendered", 32),
    ("floor_final_ys_rendered_concat_residue", 64),
    ("residue_ys", 32),
    ("residue_ys_with_floor", 32),
])
def test_get_features_all_kinds(kind, dim):
    lib = returnn_import.ParseOggVorbisLib.get_instance()
    raw = open(MONO_OGG, "rb").read()
    feats = lib.get_features_from_raw_bytes(raw, output_dim=dim, kind=kind)
    assert feats.dtype == np.float32
    assert feats.ndim == 2 and feats.shape[1] == dim and feats.shape[0] > 0


def test_invalid_kind():
    lib = returnn_import.ParseOggVorbisLib.get_instance()
    with pytest.raises(ValueError, match="invalid kind"):
        lib.get_features_from_raw_bytes(b"", output_dim=8, kind="nope")


def test_demo_cli_standalone():
    """The module runs as a script from an arbitrary cwd (vendor layout)."""
    proc = subprocess.run(
        [sys.executable, REPO_ROOT + "/returnn_import.py",
         "--ogg", MONO_OGG, "--kind", "residue_ys", "--dim", "32",
         "--no_plot"],
        capture_output=True, text=True, timeout=300, cwd="/tmp",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Features shape: (63, 32)" in proc.stdout

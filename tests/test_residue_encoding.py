"""Residue link-compression roundtrip: every encoder branch must decode
losslessly on device (the PCM and feature pipelines both ride on it)."""

import numpy as np
import pytest

from parseoggvorbis_tpu.runtime import device_decoder as dd


def _decode(enc, data, d, cols):
    import jax.numpy as jnp

    if enc == "f32":
        return np.asarray(data)
    codes = jnp.asarray(data)
    res_dict = jnp.asarray(d)
    if enc.startswith("g"):
        return np.asarray(dd._decode_slab_codes(enc, codes, res_dict, cols))
    if enc == "p4":
        codes = dd._unpack4(codes, cols)
    elif enc == "p6":
        codes = dd._unpack6(codes, cols)
    return np.asarray(jnp.take(res_dict, codes.astype(jnp.int32), axis=0))


def _roundtrip(residue):
    enc, data, d, cols = dd._encode_residue(residue)
    b = residue.shape[0]
    # encoder pads rows to _pad32(b); pad the same way before decoding
    padded = np.zeros((dd._pad32(b),) + data.shape[1:], dtype=data.dtype)
    padded[:b] = data
    out = _decode(enc, padded, d, cols)[:b]
    np.testing.assert_array_equal(out, residue[:, :, :cols])
    tail = residue[:, :, cols:]
    assert not tail.any(), "trailing-zero trim dropped nonzeros"
    return enc


@pytest.mark.parametrize("nvals,want_enc", [
    (9, "p4"), (50, "p6"), (200, "u8"),
])
def test_streamwide_dict(nvals, want_enc):
    rng = np.random.RandomState(nvals)
    vocab = rng.randn(nvals).astype(np.float32)
    res = vocab[rng.randint(0, nvals, (40, 2, 256))]
    res[:, :, 200:] = 0.0
    assert _roundtrip(res) == want_enc


@pytest.mark.parametrize("per_slab,want_enc", [
    (220, "g8"), (600, "g10"), (2500, "g12"),
])
def test_slab_dict_bitpack(per_slab, want_enc):
    """Stream-wide vocabulary too big, but each 64-frame slab stays narrow:
    per-slab dictionaries with bucket-uniform bit-packed codes."""
    rng = np.random.RandomState(per_slab)
    slabs = []
    for s in range(3):  # 3 slabs x 64 frames
        vocab = rng.randn(per_slab).astype(np.float32)
        slabs.append(vocab[rng.randint(0, per_slab, (64, 2, 128))])
    res = np.concatenate(slabs, axis=0)
    assert _roundtrip(res) == want_enc


def test_slab_too_wide_falls_back_to_u16():
    rng = np.random.RandomState(7)
    res = rng.randn(64, 1, 8192).astype(np.float32)  # ~8k uniques in a slab
    enc = _roundtrip(res)
    assert enc in ("u16", "f32")


def test_all_zero():
    res = np.zeros((8, 2, 512), dtype=np.float32)
    enc, data, d, cols = dd._encode_residue(res)
    assert cols == 64  # minimum slab
    _roundtrip(res)

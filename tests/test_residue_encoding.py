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


# ------------------------------------------------ native factorize parity --

def _native_factorize_available():
    from parseoggvorbis_tpu.native import frontend as nf

    return nf.available()


@pytest.mark.skipif(not _native_factorize_available(),
                    reason="native front-end not built")
class TestNativeFactorize:
    """pov_factorize_f32 must match numpy's unique+searchsorted pair
    (device_decoder cites it as the numpy path's O(n) replacement)."""

    def _check(self, arr, cap=65536):
        from parseoggvorbis_tpu.native import frontend as nf

        r = nf.factorize_f32(arr, cap)
        u = np.unique(arr)
        if len(u) > cap:
            assert r == nf.OVERFLOW
            return
        uniq, codes = r
        np.testing.assert_array_equal(np.abs(uniq), np.abs(u))  # +-0.0 rep
        # ranks must reproduce every element exactly (== semantics)
        np.testing.assert_array_equal(uniq[codes.astype(np.int64)], arr)
        assert codes.shape == arr.shape and codes.dtype == np.uint16

    def test_basic(self):
        rng = np.random.RandomState(3)
        vocab = rng.randn(500).astype(np.float32)
        self._check(vocab[rng.randint(0, 500, (37, 2, 129))])

    def test_negative_zero_collapses(self):
        from parseoggvorbis_tpu.native import frontend as nf

        arr = np.array([[-0.0, 0.0, 1.5, -0.0]], dtype=np.float32)
        uniq, codes = nf.factorize_f32(arr, 16)
        assert len(uniq) == 2  # single zero representative, like np.unique
        np.testing.assert_array_equal(uniq[codes.astype(int)], arr)

    def test_empty_and_single(self):
        from parseoggvorbis_tpu.native import frontend as nf

        uniq, codes = nf.factorize_f32(np.zeros((0,), np.float32), 16)
        assert len(uniq) == 0 and codes.size == 0
        self._check(np.full((5, 3), 2.25, dtype=np.float32))

    def test_overflow_sentinel(self):
        from parseoggvorbis_tpu.native import frontend as nf

        arr = np.arange(100, dtype=np.float32)
        assert nf.factorize_f32(arr, 64) == nf.OVERFLOW
        self._check(arr, cap=100)  # exactly at cap fits

    def test_encode_residue_paths_agree(self, monkeypatch):
        """Every encoder branch picks the same encoding and decodes to the
        same values through the native and numpy dictionary builds."""
        rng = np.random.RandomState(11)
        cases = []
        for nvals in (9, 50, 200):  # p4/p6/u8
            vocab = rng.randn(nvals).astype(np.float32)
            r = vocab[rng.randint(0, nvals, (40, 2, 256))]
            r[:, :, 200:] = 0.0
            cases.append(r)
        slabs = []  # g10
        for s in range(3):
            vocab = rng.randn(600).astype(np.float32)
            slabs.append(vocab[rng.randint(0, 600, (64, 2, 128))])
        cases.append(np.concatenate(slabs, axis=0))
        cases.append(rng.randn(64, 1, 8192).astype(np.float32))  # u16/f32
        for res in cases:
            e_nat = dd._encode_residue(res)
            monkeypatch.setenv("POV_NATIVE_FACTORIZE", "0")
            e_np = dd._encode_residue(res)
            monkeypatch.delenv("POV_NATIVE_FACTORIZE")
            assert e_nat[0] == e_np[0] and e_nat[3] == e_np[3]
            b = res.shape[0]
            padded = np.zeros((dd._pad32(b),) + e_nat[1].shape[1:],
                              dtype=e_nat[1].dtype)
            padded[:b] = e_nat[1]
            out = _decode(e_nat[0], padded, e_nat[2], e_nat[3])[:b]
            np.testing.assert_array_equal(out, res[:, :, :e_nat[3]])

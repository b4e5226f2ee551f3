"""TPU device-side corpus feature extraction.

The reference's headline ML use case is corpus-scale feature extraction
(reference: demo_live_extract.py:262-505 ``read_floor_ys``/``read_residue_ys``,
returnn_import.py:77-117 ``get_features_from_raw_bytes``).  The host
extractors in features/extract.py replay a per-tap-entry state machine; this
module computes the identical (time, output_dim) matrices on the TPU:

  host   native parse (bit-serial, C++) + vectorized emission metadata —
         row order, static floor-xs selections, the concat-residue
         offset/target state machine — all small integer arrays;
  device one fused jit per stream signature: floor-curve evaluation at the
         selected xs positions (integer-exact Bresenham, shared with the
         PCM pipeline), normalization through exact value tables, residue
         log1p / spline-zoom (as a precomputed linear matrix on the MXU) /
         floor-base weighting, and gather/scatter row assembly.

Only the packed floor Y values (u8), dictionary-coded residues, and the
(rows, output_dim) float32 result cross the host<->device link — about two
orders of magnitude less traffic than PCM decode.

Exactness: the floor kinds (``floor_final_ys``, ``floor_final_ys_rendered``)
are bit-exact with the host extractors (all-integer curve math + exact
normalization tables).  The residue-touching kinds run log1p/exp/zoom in
float32 on device where the host runs float64/float32 numpy; the difference
is bounded by ~1e-6 (documented; asserted <=1e-5 in tests, the project-wide
eps).  Unsupported corners (floor0 slots in the floor list) raise
``DeviceFeaturesUnsupported`` and callers fall back to the host extractors.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..runtime.device_decoder import (
    _CONSTS,
    _encode_residue,
    _pad32,
    _unpack4,
    _unpack6,
    _DICT_SLAB,
    TRANSFER_STATS,
    setup_jax,
)
from ..runtime.jax_backend import render_floor_curve_int

_HIGHEST = jax.lax.Precision.HIGHEST

# Output rows pad to a multiple of this (bounds executable-shape variety
# while keeping transfer padding small).
_ROW_BUCKET = 512


class DeviceFeaturesUnsupported(Exception):
    """Raised when a stream/option combo needs the host extractor path."""


# ---------------------------------------------------- accurate f32 transcend --
#
# TPU transcendentals are hardware approximations (measured ~1e-5 relative
# for log/exp on the v5e) while the host extractors use numpy's correctly-
# rounded libm.  f32 add/mul/div ARE IEEE on the VPU, so evaluating log1p
# and exp from exponent-bit manipulation + short polynomials reproduces
# numpy to a few ulps (~1e-7 relative) at negligible cost on these small
# feature tensors.

# ln 2 split so that integer * _LN2_HI is exact in f32 (12-bit mantissa)
_LN2_HI = np.float32(0.693359375)
_LN2_LO = np.float32(-2.12194440054690580e-4)


def _log_poly(s: jnp.ndarray) -> jnp.ndarray:
    """2*atanh(s) via its odd Taylor series; |s| <= (sqrt(2)-1)/(sqrt(2)+1)."""
    s2 = s * s
    p = np.float32(2 / 11.0)
    for c in (2 / 9.0, 2 / 7.0, 2 / 5.0, 2 / 3.0, 2.0):
        p = p * s2 + np.float32(c)
    return p * s


def accurate_log1p(x: jnp.ndarray) -> jnp.ndarray:
    """log1p for x >= 0, matching numpy within a few f32 ulps."""
    # the barrier stops XLA's excess-precision simplifier from folding
    # (1 + x) - 1 -> x, which would defeat the rounding correction below
    u = jax.lax.optimization_barrier(1.0 + x)
    bits = jax.lax.bitcast_convert_type(u, jnp.int32)
    # center the mantissa on [sqrt(1/2), sqrt(2)) so |s| stays small
    adj = ((bits + 0x3504f3) >> 23) - 127        # exponent of u, rounded
    m = jax.lax.bitcast_convert_type(
        bits - (adj << 23), jnp.float32)          # u / 2^adj in [0.707, 1.414)
    e = adj.astype(jnp.float32)
    s = (m - 1.0) / (m + 1.0)
    log_u = e * _LN2_HI + (_log_poly(s) + e * _LN2_LO)
    # undo the rounding of 1+x: log1p(x) = log(u) * x / (u - 1)
    um1 = u - 1.0
    corr = jnp.where(um1 > 0, x / jnp.where(um1 > 0, um1, 1.0), 1.0)
    return jnp.where(u == 1.0, x, log_u * corr)


def accurate_exp(y: jnp.ndarray) -> jnp.ndarray:
    """exp matching numpy within a few f32 ulps (|y| < ~80)."""
    k = jax.lax.optimization_barrier(
        jnp.round(y * np.float32(1.4426950408889634)))
    r = (y - k * _LN2_HI) - k * _LN2_LO
    # degree-7 Taylor on |r| <= ln2/2: max term r^7/5040 ~ 2e-7 * next
    p = np.float32(1 / 5040.0)
    for c in (1 / 720.0, 1 / 120.0, 1 / 24.0, 1 / 6.0, 0.5, 1.0, 1.0):
        p = p * r + np.float32(c)
    two_k = jax.lax.bitcast_convert_type(
        (jnp.clip(k.astype(jnp.int32), -126, 127) + 127) << 23, jnp.float32)
    return p * two_k


# ------------------------------------------------------------ exact tables --

@functools.lru_cache(maxsize=None)
def _norm_table(positive: bool) -> np.ndarray:
    """normalize(v) for every reachable integer value v in [0, 1020].

    The host extractors normalize integer-valued float32 arrays
    ((v - 127.5) / 127.5 or v / 255.0, extract.py:86-89); evaluating the
    same numpy expression over all possible inputs once makes the device
    gather bit-exact regardless of the accelerator's division rounding.
    """
    v = np.arange(1021, dtype=np.float32)
    if positive:
        return (v / 255.0).astype(np.float32)
    return ((v - np.float32(127.5)) / np.float32(127.5)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _zoom_matrix_np(in_len: int) -> np.ndarray:
    """scipy.ndimage.zoom(v, 0.5, order=3) as a linear map Z [out, in].

    Cubic-spline zoom is linear in its input (the spline prefilter is a
    linear IIR filter and the interpolation is a weighted sum), so applying
    it to the identity matrix column-wise yields the full operator.  The
    reference extractor zooms the log1p'd residue row this way
    (demo_live_extract.py:408-415); on device the zoom becomes one MXU
    matmul per frame batch.
    """
    import scipy.ndimage

    eye = np.eye(in_len, dtype=np.float64)
    z = scipy.ndimage.zoom(eye, (0.5, 1.0), order=3)
    return np.ascontiguousarray(z, dtype=np.float32)


def _zoom_matrix_folded(in_len: int, factor: int) -> np.ndarray:
    """Zoom matrix with the ``idxs // factor`` gather folded in.

    The extractor reads data[arange(len) // factor] before zooming
    (extract.py:159-165); gather-then-linear-map equals multiplying by the
    column-summed matrix Z'[:, j] = sum_{p: p//factor == j} Z[:, p].
    """
    z = _zoom_matrix_np(in_len)
    if factor <= 1:
        return z
    src = np.arange(in_len) // factor
    folded = np.zeros((z.shape[0], in_len), dtype=np.float64)
    np.add.at(folded.T, src, z.T.astype(np.float64))
    return folded.astype(np.float32)


# ------------------------------------------------------- host-side planning --

@dataclass(frozen=True)
class _ChanSig:
    l: int            # emitted value count for this channel's rows
    mult: int         # floor multiplier (final_ys kind re-multiplies)
    col0: float       # floor-number column value (0.0 when excluded)
    rendered: bool    # values come from the rendered curve (vs raw ys)
    pts_off: int      # offset of this channel's ys in the packed [B, pts] row
    pts: int          # this channel's floor point count
    col0_code: int = 0  # raw floor number (u16-code output)


@dataclass(frozen=True)
class _BucketSig:
    n: int
    b_pad: int
    total_pts: int
    chans: Tuple[_ChanSig, ...]
    # residue payload (concat / residue kinds)
    res_enc: str = ""
    dict_size: int = 0
    res_cols: int = 0
    res_chans: int = 0
    zoom_l: int = 0      # concat: zoom output length
    gated: bool = True   # residue kinds: last-channel floor == biggest
    sel_l: int = 0       # residue kinds: selected index count
    base_cand: Tuple[int, ...] = ()  # channels rendering floor_base


@dataclass(frozen=True)
class _FeatSig:
    family: str          # "floor" | "concat" | "residue"
    out: int
    r_pad: int
    t_pad: int
    include: bool
    positive: bool
    buckets: Tuple[_BucketSig, ...]
    # residue-kind options
    log1p: bool = False
    scale: float = 1.0
    clip: float = 0.0    # 0 = off
    base_factor: float = 0.0  # 0 = no floor_base weighting
    base_l: int = 0
    codes: bool = False  # u16 value-table codes instead of f32 rows
    # streaming (windowed) extraction: basearr carries a cross-window
    # floor_base row and the jit returns (rows, end_base)
    carry: bool = False


def _floor_setup(p, sorted_xs: bool, upscale: int):
    """Mirror of FeatureExtractorMixin._read_setup_floors (extract.py:35-62)."""
    infos = p.floor1_info()
    if any(i is None for i in infos):
        # a floor0 slot would shift the extractor's floor indexing; the
        # host path has the identical quirk but is the validated one
        raise DeviceFeaturesUnsupported("floor0 slot in floor list")
    multipliers = [int(i[0]) for i in infos]
    # the decoder's curve is rendered over the TRUE entry-order xs; the
    # extractor options (sorted_xs, upscale) only affect the xs list used
    # for value selection
    floor_xs_raw = [np.asarray(i[1]).astype(np.int64) for i in infos]
    floor_xs = list(floor_xs_raw)
    if sorted_xs:
        floor_xs = [np.sort(xs) for xs in floor_xs]
    floor_xs_up = []
    if upscale != 1:
        import scipy.ndimage

        for xs in floor_xs:
            up = scipy.ndimage.zoom(np.array(xs, dtype="float32"),
                                    zoom=upscale, order=1, mode="nearest")
            floor_xs_up.append(np.round(up).astype("int32").astype(np.int64))
    if not multipliers:
        raise AssertionError("no floor1 in stream")
    return multipliers, floor_xs, floor_xs_up, floor_xs_raw


class _BucketPlan:
    """Host-side per-mode-bucket working state (not hashable; sig is)."""

    def __init__(self):
        self.ids = None          # [B] frame indices
        self.pos = None          # frame -> position in bucket
        self.args = None         # device input arrays
        self.consts = []         # per channel device-const keys
        self.sig = None


def _placement_realm():
    """Cache-key component for the active default device.

    launch_features_mesh plans under jax.default_device(mesh device) so the
    planning constants never touch the (possibly broken) default backend —
    the realm keeps those entries from being served to normal-path calls,
    whose jit would reject mixed-device committed arguments."""
    d = jax.config.jax_default_device
    return None if d is None else str(d)


def _render_consts(xs_key: tuple, sel: np.ndarray):
    """Device-resident (xs_sorted, sorted_idx, pmap, x_pos) for rendering a
    floor at the selected positions only."""
    key = ("feat-render", xs_key, tuple(int(x) for x in sel),
           _placement_realm())

    def build():
        xs = np.array(xs_key, dtype=np.int64)
        order = np.argsort(xs, kind="stable")
        xs_sorted = xs[order]
        pmap = np.searchsorted(xs_sorted, sel, side="right") - 1
        return jax.device_put((xs_sorted.astype(np.int32),
                               order.astype(np.int32),
                               pmap.astype(np.int32),
                               sel.astype(np.int32)))

    return _CONSTS.cached(key, build)


def _cached_table(positive: bool):
    return _CONSTS.cached(("feat-normtable", positive, _placement_realm()),
                          lambda: jax.device_put(_norm_table(positive)))


def _cached_zoom(in_len: int, factor: int, cols: int):
    return _CONSTS.cached(
        ("feat-zoom", in_len, factor, cols, _placement_realm()),
        lambda: jax.device_put(
            np.ascontiguousarray(_zoom_matrix_folded(in_len, factor)[:, :cols].T)),
    )


def _cached_i32(tag: str, values: np.ndarray):
    key = (tag,) + tuple(int(v) for v in values) + (_placement_realm(),)
    return _CONSTS.cached(key, lambda: jax.device_put(values.astype(np.int32)))


def _encode_bucket_residue(residue: np.ndarray):
    """(enc, padded_codes_or_f32, dict, cols) via the PCM path's compactor."""
    enc, data, d, cols = _encode_residue(residue)
    b = residue.shape[0]
    b_pad = _pad32(b)
    out = np.zeros((b_pad,) + data.shape[1:], dtype=data.dtype)
    out[:b] = data
    return enc, out, d, cols


def _decode_residue_device(bsig: _BucketSig, res_arg):
    """Undo _encode_residue on device -> [B_pad, C_r, cols] f32."""
    if bsig.res_enc == "f32":
        return res_arg
    codes, res_dict = res_arg
    if bsig.res_enc.startswith("g"):
        from ..runtime.device_decoder import _decode_slab_codes

        return _decode_slab_codes(bsig.res_enc, codes, res_dict,
                                  bsig.res_cols)
    if bsig.res_enc == "p4":
        codes = _unpack4(codes, bsig.res_cols)
    elif bsig.res_enc == "p6":
        codes = _unpack6(codes, bsig.res_cols)
    # one-hot matmul on TPU, element gather on CPU (bit-identical; TPU
    # element gathers run ~100x below memory bandwidth — see
    # jax_backend.table_lookup_f32)
    from ..runtime.jax_backend import table_lookup_f32

    return table_lookup_f32(codes.astype(jnp.int32), res_dict)


# ------------------------------------------------------------- device impl --

def _rows_floor_bucket(bsig: _BucketSig, ys, flags, consts, table,
                       include: bool, out: int, codes: bool):
    """One bucket's candidate rows [B_pad * C, out] for the floor kinds.

    ``codes=True`` emits u16 value-table codes instead of float32 (0 = 0.0,
    1 + v = normalize(v), 1022 + f = floor f's number column) — every value
    of a pure floor-kind row is one of <=1278 possibilities, so shipping
    codes halves the device->host transfer and the host's np.take decode
    stays bit-exact.
    """
    rows_ch = []
    b = ys.shape[0]
    for ch, cs in enumerate(bsig.chans):
        ys_ch = jax.lax.dynamic_slice_in_dim(ys, cs.pts_off, cs.pts, axis=1)
        if cs.rendered:
            xs_sorted, sorted_idx, pmap, x_pos = consts[ch]
            fl_ch = jax.lax.dynamic_slice_in_dim(flags, cs.pts_off, cs.pts,
                                                 axis=1)
            vals = render_floor_curve_int(
                ys_ch, fl_ch, xs_sorted=xs_sorted, sorted_idx=sorted_idx,
                pmap=pmap, multiplier=cs.mult, x_pos=x_pos,
            )[:, : cs.l]
        else:
            vals = ys_ch.astype(jnp.int32)[:, : cs.l] * cs.mult
        vals = jnp.clip(vals, 0, 1020)
        if codes:
            vals_f = vals + 1
            c0 = jnp.full((b, 1), np.int32(1022 + cs.col0_code), jnp.int32)
            zero = jnp.zeros((b, 1), jnp.int32)
        else:
            from ..runtime.jax_backend import table_lookup_f32

            vals_f = table_lookup_f32(vals, table)
            c0 = jnp.full((b, 1), np.float32(cs.col0), jnp.float32)
            zero = jnp.zeros((b, 1), jnp.float32)
        pieces = []
        if include:
            pieces.append(c0)
        pieces.append(vals_f)
        pad = out - (1 if include else 0) - cs.l
        if pad:
            pieces.append(jnp.broadcast_to(zero, (b, pad)))
        rows_ch.append(jnp.concatenate(pieces, axis=1))
    rows = jnp.stack(rows_ch, axis=1).reshape(b * len(bsig.chans), out)
    return rows.astype(jnp.uint16) if codes else rows


def _feat_impl(sig: _FeatSig, bucket_args, bucket_consts, row_src, table,
               extra):
    out = sig.out
    if sig.family in ("floor", "concat"):
        allrows = [
            _rows_floor_bucket(bsig, args[0], args[1], consts, table,
                               sig.include, out, sig.codes)
            for bsig, args, consts in zip(sig.buckets, bucket_args,
                                          bucket_consts)
        ]
        allrows.append(jnp.zeros((1, out),
                                 jnp.uint16 if sig.codes else jnp.float32))
        rows = jnp.concatenate(allrows, axis=0)[row_src]  # [R_pad + 1, out]
        if sig.family == "concat":
            # after_residue append: log1p(|res0|)*0.1 -> zoom(0.5) -> shifted
            # assignment into the frame's last emitted row
            # (extract.py:151-168).  Formulated as a per-row GATHER (each row
            # has at most one appending frame, host-precomputed) — a
            # scatter-add here trips an XLA:TPU fusion-emitter check.
            row_vsrc, row_off, row_zl = extra[-1]
            zmax = max(b.zoom_l for b in sig.buckets)
            vals_all = []
            for bsig, args, (zoom_t,) in zip(sig.buckets, bucket_args,
                                             extra[:-1]):
                res = _decode_residue_device(bsig, args[2])[:, 0, :]
                l = accurate_log1p(jnp.abs(res)) * np.float32(0.1)
                vals = jnp.matmul(l, zoom_t, precision=_HIGHEST)  # [B, zoom_l]
                if bsig.zoom_l < zmax:
                    vals = jnp.pad(vals, ((0, 0), (0, zmax - bsig.zoom_l)))
                vals_all.append(vals)
            vals_all.append(jnp.zeros((1, zmax), jnp.float32))
            vals_all = jnp.concatenate(vals_all, axis=0)
            v = vals_all[row_vsrc]                       # [R_pad + 1, zmax]
            k = jnp.arange(out, dtype=jnp.int32)[None, :]
            j = k - row_off[:, None]
            valid = (j >= 0) & (j < row_zl[:, None])
            contrib = jnp.where(
                valid,
                jnp.take_along_axis(v, jnp.clip(j, 0, zmax - 1), axis=1),
                0.0,
            )
            rows = rows + contrib
        return rows[: sig.r_pad]

    # residue family
    base = None
    if sig.base_factor != 0.0 and sig.base_l:
        # rows: per-frame sources, then [t_pad] = trash (no base, masked),
        # then optionally [t_pad+1] = the carried base (streaming windows)
        rows_n = sig.t_pad + (2 if sig.carry else 1)
        basearr = jnp.zeros((rows_n, sig.base_l), jnp.float32)
        if sig.carry:
            carry_vec, _end_src = extra[-1]
            basearr = basearr.at[sig.t_pad + 1].set(carry_vec)
        for bsig, args, consts, ex in zip(sig.buckets, bucket_args,
                                          bucket_consts, extra):
            cand = bsig.base_cand
            if not cand:
                continue
            ys, flags = args[0], args[1]
            winner, frame_ids = ex["base_winner"], ex["base_frames"]
            curves = []
            for ch in cand:
                cs = bsig.chans[ch]
                xs_sorted, sorted_idx, pmap, x_pos = consts[ch]
                ys_ch = jax.lax.dynamic_slice_in_dim(ys, cs.pts_off, cs.pts, 1)
                fl_ch = jax.lax.dynamic_slice_in_dim(flags, cs.pts_off, cs.pts,
                                                     1)
                c = render_floor_curve_int(
                    ys_ch, fl_ch, xs_sorted=xs_sorted, sorted_idx=sorted_idx,
                    pmap=pmap, multiplier=cs.mult, x_pos=x_pos)
                from ..runtime.jax_backend import table_lookup_f32

                curves.append(table_lookup_f32(
                    jnp.clip(c, 0, table.shape[0] - 1), table))
            stacked = jnp.stack(curves, axis=1)  # [B, K, L]
            win = jnp.take_along_axis(
                stacked, jnp.maximum(winner, 0)[:, None, None], axis=1
            )[:, 0, :]
            basearr = basearr.at[frame_ids].set(win)
        base = basearr

    out_rows = [jnp.zeros((1, out), jnp.float32)]
    for bsig, args, consts, ex in zip(sig.buckets, bucket_args, bucket_consts,
                                      extra):
        if not bsig.gated:
            continue
        res = _decode_residue_device(bsig, args[2])  # [B, C, cols]
        b, c, cols = res.shape
        res = jnp.concatenate([res, jnp.zeros((b, c, 1), res.dtype)], axis=2)
        sel = ex["sel"]  # [L] clipped to cols sentinel
        selected = res[:, :, sel]  # [B, C, L]
        if sig.log1p:
            selected = accurate_log1p(jnp.abs(selected))
        if base is not None:
            fb = base[ex["src_frame"]]  # [B, L]
            has = (ex["src_frame"] != sig.t_pad)[:, None, None]
            if sig.log1p:
                weighted = selected + (fb * np.float32(sig.base_factor))[:, None, :]
            else:
                weighted = selected * accurate_exp(
                    (fb - 1.0) * np.float32(sig.base_factor))[:, None, :]
            selected = jnp.where(has, weighted, selected)
        if sig.scale != 1.0:
            selected = selected * np.float32(sig.scale)
        if sig.clip:
            selected = jnp.clip(selected, -np.float32(sig.clip),
                                np.float32(sig.clip))
        pad = out - selected.shape[2]
        if pad:
            selected = jnp.pad(selected, ((0, 0), (0, 0), (0, pad)))
        out_rows.append(selected.reshape(b * c, out))
    rows = jnp.concatenate(out_rows, axis=0)[row_src]
    if sig.carry:
        _carry_vec, end_src = extra[-1]
        end_base = (base[end_src] if base is not None
                    else jnp.zeros(max(sig.base_l, 1), jnp.float32))
        return rows[: sig.r_pad], end_base
    return rows[: sig.r_pad]


@functools.lru_cache(maxsize=256)
def _get_feat_fn(sig: _FeatSig):
    setup_jax()

    def fn(bucket_args, bucket_consts, row_src, table, extra):
        return _feat_impl(sig, bucket_args, bucket_consts, row_src, table,
                          extra)

    return jax.jit(fn)


# ------------------------------------------------------------- the planner --

_FLOOR_KINDS = ("floor_final_ys", "floor_final_ys_rendered",
                "floor_final_ys_rendered_concat_residue")
_RESIDUE_KINDS = ("residue_ys", "residue_ys_with_floor")


def _plan_floor(p, output_dim: int, kind: str, include_floor_number,
                only_biggest_floor, sorted_xs, upscale_xs_factor,
                xs_from_biggest_floor, floor_always_positive, verbose=0,
                skip_first_frame=False, concat_carry=None):
    """Build the device plan for the read_floor_ys kinds.

    Mirrors extract.py:64-169 exactly; every branch cites the matching host
    extractor behavior.
    """
    if only_biggest_floor:
        assert include_floor_number in (None, False)
        include_floor_number = False
    if include_floor_number is None:
        include_floor_number = True
    multipliers, floor_xs, floor_xs_up, floor_xs_raw = _floor_setup(
        p, sorted_xs, upscale_xs_factor)
    num_floors = len(floor_xs)
    biggest = max(range(num_floors), key=lambda i: len(floor_xs[i]))
    dim = output_dim - (1 if include_floor_number else 0)
    rendered = kind in ("floor_final_ys_rendered",
                        "floor_final_ys_rendered_concat_residue")
    concat = kind == "floor_final_ys_rendered_concat_residue"
    xs_list = floor_xs_up if floor_xs_up else floor_xs

    t_total = len(p.mode_idx)
    c = p.channels
    mode_ids = sorted(set(p.mode_idx.tolist()))
    buckets: Dict[int, _BucketPlan] = {}
    decoded_global = np.zeros((t_total, c), dtype=bool)
    pos_global = np.zeros(t_total, dtype=np.int64)
    mode_off: Dict[int, int] = {}
    mode_fnums: Dict[int, np.ndarray] = {}
    off_acc = 0

    for m in mode_ids:
        bp = _BucketPlan()
        ids = np.nonzero(p.mode_idx == m)[0]
        n = int(p.frame_n[ids[0]])
        half = n // 2
        fnums = p.mode_floor_numbers(m)
        mode_fnums[m] = fnums
        for f in fnums:
            assert 0 <= int(f) < num_floors  # extract.py:105 parity
        pts = [len(floor_xs[int(f)]) for f in fnums]
        total_pts = int(sum(pts))
        b = len(ids)
        b_pad = _pad32(b)

        decoded, _used = p.export_flags(ids)
        decoded_global[ids] = decoded
        pos_global[ids] = np.arange(b)
        mode_off[m] = off_acc
        off_acc += b_pad * c

        ys, flags = p.export_floor_ys_flags(ids, total_pts)
        ys_p = np.zeros((b_pad, total_pts), dtype=np.uint8)
        ys_p[:b] = ys
        fl_p = np.zeros((b_pad, total_pts), dtype=np.uint8)
        fl_p[:b] = flags

        chans = []
        consts = []
        poff = 0
        for ch in range(c):
            fnum = int(fnums[ch])
            mult = multipliers[fnum]
            col0 = float(np.float32((fnum + 1.0) / num_floors - 0.5))
            if rendered:
                # the "floor1 floor" tap is the FULL-window rendered curve
                # (length n, reference ParseOggVorbis.hpp:574-585), so the
                # host extractor's len(data) here is n, not n/2
                if xs_from_biggest_floor:
                    xs = xs_list[biggest]
                    if biggest != fnum:
                        factor = int(round(float(max(floor_xs[biggest]))
                                           / float(max(floor_xs[fnum]))))
                        xs = xs // factor
                    # host quirk: clips against the current entry's length
                    xs = np.clip(xs, 0, n - 1)
                else:
                    xs = xs_list[fnum]
                    if len(xs) and int(xs.max()) >= n:
                        # numpy fancy-index parity (extract.py:141)
                        raise IndexError(
                            "floor xs %d out of bounds for rendered curve "
                            "of length %d" % (int(xs.max()), n))
                sel = xs[:dim].astype(np.int64)
                l = len(sel)
                consts.append(_render_consts(
                    tuple(int(x) for x in floor_xs_raw[fnum]), sel))
            else:
                l = min(pts[ch], dim)
                consts.append(None)
            chans.append(_ChanSig(l=l, mult=mult, col0=col0,
                                  rendered=rendered, pts_off=poff,
                                  pts=pts[ch], col0_code=fnum))
            poff += pts[ch]

        bsig_kwargs = {}
        bargs = [ys_p, fl_p]
        if concat:
            res0 = p.export_residues(ids, n, 0, 1)
            enc, data, d, cols = _encode_bucket_residue(res0)
            # recent at after_residue time = last channel's floor number
            recent_after = int(fnums[c - 1])
            factor = 1
            if xs_from_biggest_floor and biggest != recent_after:
                factor = int(round(float(max(floor_xs[biggest]))
                                   / float(max(floor_xs[recent_after]))))
            zoom_l = _zoom_matrix_np(half).shape[0]
            bsig_kwargs = dict(res_enc=enc, dict_size=0 if d is None else len(d),
                               res_cols=cols, res_chans=1, zoom_l=zoom_l)
            bargs.append((data, d) if d is not None else data)
            bp.zoom_t = _cached_zoom(half, factor, cols)
            bp.recent_after = recent_after
        bp.sig = _BucketSig(n=n, b_pad=b_pad, total_pts=total_pts,
                            chans=tuple(chans), **bsig_kwargs)
        bp.ids = ids
        bp.args = tuple(bargs)
        bp.consts = tuple(consts)
        buckets[m] = bp

    # emission mask + global row order (frame-major, channel-minor)
    fnum_arr = np.zeros((t_total, c), dtype=np.int64)
    for m in mode_ids:
        fnum_arr[buckets[m].ids] = mode_fnums[m]
    emit = decoded_global.copy()
    if only_biggest_floor:
        emit &= fnum_arr == biggest
    if skip_first_frame and t_total:
        # windowed extraction: frame 0 is the previous window's context
        # frame — its rows were already emitted there
        emit[0, :] = False
    flat_emit = emit.reshape(-1)
    emit_tc = np.nonzero(flat_emit)[0]
    r = len(emit_tc)
    r_pad = max(_ROW_BUCKET, -(-r // _ROW_BUCKET) * _ROW_BUCKET)
    trash_src = off_acc
    row_src = np.full(r_pad + 1, trash_src, dtype=np.int64)
    ts, chs = emit_tc // c, emit_tc % c
    mode_off_arr = np.zeros(max(mode_ids) + 1, dtype=np.int64)
    for m in mode_ids:
        mode_off_arr[m] = mode_off[m]
    row_src[:r] = mode_off_arr[p.mode_idx[ts]] + pos_global[ts] * c + chs

    extra: List = [None] * len(mode_ids)
    if concat:
        # offset/target state machine (extract.py:151-168): rendered rows set
        # offset_dim = base + L; the first after_residue entry with a live
        # offset appends to the last emitted row and zeroes the offset.
        # Encoded per ROW (each row has at most one appending frame) so the
        # device applies it as a gather.
        base_col = 1 if include_floor_number else 0
        voff = {}
        acc = 0
        for m in mode_ids:
            voff[m] = acc
            acc += buckets[m].sig.b_pad
        row_vsrc = np.full(r_pad + 1, acc, dtype=np.int64)  # acc = trash
        row_off = np.zeros(r_pad + 1, dtype=np.int64)
        row_zl = np.zeros(r_pad + 1, dtype=np.int64)
        last_row = -1
        off = concat_carry["off"] if concat_carry else 0
        back_appends = []  # appends targeting the PREVIOUS window's rows
        l_by_mode = {m: np.array([cs.l for cs in buckets[m].sig.chans])
                     for m in mode_ids}
        t_start = 1 if skip_first_frame else 0
        for t in range(t_start, t_total):
            m = int(p.mode_idx[t])
            em = emit[t]
            if em.any():
                last_row += int(em.sum())
                last_ch = int(np.nonzero(em)[0][-1])
                off = base_col + int(l_by_mode[m][last_ch])
            gate = ((not only_biggest_floor)
                    or buckets[m].recent_after == biggest)
            if gate and off != 0:
                assert output_dim >= off  # extract.py:156 parity
                if last_row < 0:
                    # the pending offset came in from the previous window
                    # and no row has been emitted yet here: the append
                    # lands in the PREVIOUS window's final row.  Defensive:
                    # reaching this needs a mode whose emission and gate
                    # conditions disagree across a window boundary (multi-
                    # submap floor layouts); handled host-side in f64 by
                    # the streaming driver
                    back_appends.append((int(t), int(m), int(off)))
                else:
                    row_vsrc[last_row] = voff[m] + int(pos_global[t])
                    row_off[last_row] = off
                    row_zl[last_row] = buckets[m].sig.zoom_l
                off = 0
        carry_out = {"off": off, "back_appends": back_appends}
        extra = [(buckets[m].zoom_t,) for m in mode_ids]
        extra.append((row_vsrc.astype(np.int32), row_off.astype(np.int32),
                      row_zl.astype(np.int32)))

    sig = _FeatSig(
        family="concat" if concat else "floor", out=output_dim, r_pad=r_pad,
        t_pad=0, include=include_floor_number,
        positive=bool(floor_always_positive),
        buckets=tuple(buckets[m].sig for m in mode_ids),
        codes=not concat,
    )
    ext = None
    if sig.codes:
        col0s = np.array([(f + 1.0) / num_floors - 0.5
                          for f in range(num_floors)], dtype=np.float32)
        ext = np.concatenate([np.zeros(1, np.float32),
                              _norm_table(bool(floor_always_positive)),
                              col0s])
    if not concat:
        carry_out = None
    return (sig, tuple(buckets[m].args for m in mode_ids),
            tuple(buckets[m].consts for m in mode_ids),
            row_src.astype(np.int32), tuple(extra), r, ext, carry_out)


def _plan_residue(p, output_dim: int, kind: str, scale, clip_abs_max,
                  log1p_abs_space, sorted_xs, ignore_xs, floor_base_factor,
                  skip_first_frame=False, base_carry=None, streaming=False):
    """Device plan for read_residue_ys (extract.py:171-230)."""
    multipliers, floor_xs, _, floor_xs_raw = _floor_setup(p, sorted_xs, 1)
    floor_xs = [xs.astype(np.int64) for xs in floor_xs]
    num_floors = len(floor_xs)
    biggest = max(range(num_floors), key=lambda i: len(floor_xs[i]))
    with_floor = kind == "residue_ys_with_floor" and floor_base_factor != 0

    t_total = len(p.mode_idx)
    c = p.channels
    t_pad = _pad32(t_total)
    mode_ids = sorted(set(p.mode_idx.tolist()))
    buckets: Dict[int, _BucketPlan] = {}
    mode_off: Dict[int, int] = {}
    off_acc = 1  # row 0 of the concat is the trash row
    pos_global = np.zeros(t_total, dtype=np.int64)
    gate_by_mode: Dict[int, bool] = {}
    base_l = None
    winner_global = np.full(t_total, -1, dtype=np.int64)

    for m in mode_ids:
        bp = _BucketPlan()
        ids = np.nonzero(p.mode_idx == m)[0]
        n = int(p.frame_n[ids[0]])
        half = n // 2
        fnums = p.mode_floor_numbers(m)
        for f in fnums:
            assert 0 <= int(f) < num_floors
        b = len(ids)
        b_pad = _pad32(b)
        pos_global[ids] = np.arange(b)

        recent = int(fnums[c - 1])  # floor_number state at after_residue time
        gate = recent == biggest
        gate_by_mode[m] = gate

        if ignore_xs:
            idxs = np.arange(half, dtype=np.int64)[:output_dim]
        else:
            idxs = np.clip(floor_xs[recent][:output_dim], 0, half - 1)
            if gate:
                # extract.py:210 parity: selected must cover the floor's xs
                assert len(idxs) == len(floor_xs[recent])
        l = len(idxs)

        res = p.export_residues(ids, n)
        enc, data, d, cols = _encode_bucket_residue(res)
        sel = np.minimum(idxs, cols)  # col `cols` is the appended zero column
        pts = [len(floor_xs[int(f)]) for f in fnums]
        total_pts = int(sum(pts))
        ys, flags = p.export_floor_ys_flags(ids, total_pts)
        ys_p = np.zeros((b_pad, total_pts), dtype=np.uint8)
        ys_p[:b] = ys
        fl_p = np.zeros((b_pad, total_pts), dtype=np.uint8)
        fl_p[:b] = flags

        chans = []
        consts = []
        poff = 0
        base_cand = []
        for ch in range(c):
            fnum = int(fnums[ch])
            chans.append(_ChanSig(l=l, mult=multipliers[fnum], col0=0.0,
                                  rendered=True, pts_off=poff, pts=pts[ch]))
            if with_floor and fnum == biggest:
                base_cand.append(ch)
                # "floor1 floor" entries are full-window curves (length n),
                # so the host extractor's idxs at those entries clip
                # against n (ignore_xs: the first output_dim bins of the
                # full-window curve, extract.py:195)
                if ignore_xs:
                    base_pos = np.arange(min(n, output_dim), dtype=np.int64)
                else:
                    base_pos = np.clip(floor_xs[biggest][:output_dim],
                                       0, n - 1)
                consts.append(_render_consts(
                    tuple(int(x) for x in floor_xs_raw[fnum]), base_pos))
            else:
                consts.append(None)
            poff += pts[ch]

        ex = {"sel": _cached_i32("feat-sel", sel)}
        if with_floor and base_cand:
            bl = len(base_pos)
            decoded, _ = p.export_flags(ids)
            cand_dec = decoded[:, base_cand]  # [B, K]
            has = cand_dec.any(axis=1)
            winner = np.where(
                has, cand_dec.shape[1] - 1 - np.argmax(cand_dec[:, ::-1],
                                                       axis=1), -1)
            winner_global[ids[has]] = ids[has]
            win_p = np.full(b_pad, -1, dtype=np.int64)
            win_p[:b] = winner
            frames_p = np.full(b_pad, t_pad, dtype=np.int64)
            frames_p[:b] = np.where(winner >= 0, ids, t_pad)
            ex["base_winner"] = win_p.astype(np.int32)
            ex["base_frames"] = frames_p.astype(np.int32)
            # the carried base vector must have one length stream-wide;
            # with ignore_xs it is min(n, output_dim), which can differ
            # between modes (the host extractor broadcast-errors on such
            # streams — the fallback reproduces that behavior)
            if base_l is None:
                base_l = bl
            elif base_l != bl:
                raise DeviceFeaturesUnsupported(
                    "mixed floor_base lengths across modes")
            if gate and bl != l:
                # host: selected (len l) + base (len bl) broadcast-errors
                # (only gated buckets emit weighted rows)
                raise DeviceFeaturesUnsupported(
                    "floor_base length differs from selection length")
        bp.sig = _BucketSig(n=n, b_pad=b_pad, total_pts=total_pts,
                            chans=tuple(chans), res_enc=enc,
                            dict_size=0 if d is None else len(d),
                            res_cols=cols, res_chans=c, gated=gate, sel_l=l,
                            base_cand=tuple(base_cand)
                            if (with_floor and base_cand) else ())
        bp.ids = ids
        bp.args = (ys_p, fl_p, (data, d) if d is not None else data)
        bp.consts = tuple(consts)
        bp.extra = ex
        if gate:
            mode_off[m] = off_acc
            off_acc += b_pad * c
        buckets[m] = bp

    # the no-source sentinel: t_pad = zeros+unweighted; t_pad+1 = the
    # carried base from the previous window (streaming)
    none_idx = (t_pad + 1) if (base_carry is not None) else t_pad
    if with_floor and base_l is not None:
        # floor_base carries across frames (extract.py:183-219): weight each
        # frame with the most recent frame that produced a base
        src = np.maximum.accumulate(winner_global)
        for m in mode_ids:
            if not gate_by_mode[m]:
                continue
            ids = buckets[m].ids
            s = src[ids]
            s_p = np.full(buckets[m].sig.b_pad, t_pad, dtype=np.int64)
            s_p[: len(ids)] = np.where(s >= 0, s, none_idx)
            buckets[m].extra["src_frame"] = s_p.astype(np.int32)
    else:
        base_l = 0
        with_floor = False

    # row order: gated frames emit one row per channel, (t asc, ch asc)
    gate_t = np.array([gate_by_mode[int(p.mode_idx[t])]
                       for t in range(t_total)], dtype=bool)
    if skip_first_frame and t_total:
        gate_t[0] = False  # context frame: rows emitted last window
    ts = np.nonzero(gate_t)[0]
    r = len(ts) * c
    r_pad = max(_ROW_BUCKET, -(-r // _ROW_BUCKET) * _ROW_BUCKET)
    row_src = np.zeros(r_pad + 1, dtype=np.int64)  # 0 = trash row
    if r:
        mode_off_arr = np.zeros(max(mode_ids) + 1, dtype=np.int64)
        for m in mode_off:
            mode_off_arr[m] = mode_off[m]
        src = mode_off_arr[p.mode_idx[ts]]
        base_idx = (src + pos_global[ts] * c)[:, None] + np.arange(c)[None, :]
        row_src[:r] = base_idx.reshape(-1)

    carry_enabled = streaming and with_floor
    sig = _FeatSig(
        family="residue", out=output_dim, r_pad=r_pad, t_pad=t_pad,
        include=False, positive=False,
        buckets=tuple(buckets[m].sig for m in mode_ids),
        log1p=bool(log1p_abs_space), scale=float(scale),
        clip=float(clip_abs_max or 0.0),
        base_factor=float(floor_base_factor) if with_floor else 0.0,
        base_l=int(base_l),
        carry=carry_enabled,
    )
    extra = [buckets[m].extra for m in mode_ids]
    carry_out = None
    if carry_enabled:
        carry_vec = (base_carry if base_carry is not None
                     else np.zeros(base_l, np.float32))
        # where does the NEXT window's carry come from?  the last in-window
        # base source, else the current carry (or none -> trash zeros)
        last_src = int(winner_global.max()) if t_total else -1
        end_src = (last_src if last_src >= 0
                   else (t_pad + 1 if base_carry is not None else t_pad))
        extra.append((np.asarray(carry_vec, np.float32),
                      np.int32(end_src)))
        carry_out = {"had_base": last_src >= 0 or base_carry is not None}
    return (sig, tuple(buckets[m].args for m in mode_ids),
            tuple(buckets[m].consts for m in mode_ids),
            row_src.astype(np.int32), tuple(extra), r, carry_out)


# ------------------------------------------------------------- public API --

class _PyAdapter:
    """Device-feature access for the pure-Python front-end (StreamFrames)."""

    def __init__(self, sf):
        self.sf = sf
        self.mode_idx = sf.mode_idx
        self.frame_n = sf.frame_n
        self.channels = sf.channels

    def floor1_info(self):
        return self.sf.floors

    def mode_floor_numbers(self, m):
        return self.sf.mode_floor_numbers[m]

    def export_floor_ys_flags(self, ids, total_pts):
        return self.sf.exporter_ys(ids, total_pts)

    def export_flags(self, ids):
        n = int(self.sf.frame_n[ids[0]])
        _, decoded, used, _ = self.sf.exporter(ids, n)
        return decoded, used

    def export_residues(self, ids, n, ch0=0, ch1=0):
        if ch1 <= 0:
            ch1 = self.sf.channels
        _, _, _, residue = self.sf.exporter(ids, n)
        return np.ascontiguousarray(residue[:, ch0:ch1])


class PendingFeatures:
    """In-flight async device feature extraction for one stream.

    ``ext`` decodes u16 value-table rows (pure floor kinds) back to the
    bit-exact float32 matrix with one host np.take.  Streaming windows
    carry extras: ``end_base`` (the floor_base vector at window end) and
    ``carry_out`` (host-side planner state for the next window).
    """

    def __init__(self, rows, r: int, ext: Optional[np.ndarray] = None,
                 end_base=None, carry_out=None):
        self.rows = rows
        self.r = r
        self.ext = ext
        self._end_base = end_base
        self.carry_out = carry_out

    def prefetch(self):
        try:
            self.rows.copy_to_host_async()
        except Exception:
            pass

    def fetch(self) -> np.ndarray:
        rows = np.asarray(self.rows)[: self.r]
        if self.ext is not None:
            rows = np.take(self.ext, rows)
        return rows

    def end_base(self) -> Optional[np.ndarray]:
        return None if self._end_base is None else np.asarray(self._end_base)


_FLOOR_DEFAULTS = dict(include_floor_number=None, only_biggest_floor=False,
                       sorted_xs=False, upscale_xs_factor=1,
                       xs_from_biggest_floor=False,
                       floor_always_positive=False, verbose=0)
_RESIDUE_DEFAULTS = dict(scale=1.0, clip_abs_max=None, log1p_abs_space=False,
                         sorted_xs=False, ignore_xs=False,
                         floor_base_factor=1)


def launch_features_device(parsed, output_dim: int,
                           kind: str = "floor_final_ys",
                           _window=None, **kwargs) -> PendingFeatures:
    """Launch the device feature computation for one parsed stream (async).

    ``parsed`` is a NativeParsed (native front-end) or StreamFrames (the
    pure-Python front-end, adapted).  Unknown kwargs raise TypeError like
    the host extractor's signature would.  ``_window`` is the streaming
    driver's cross-window state (skip_first/concat/base carries).
    """
    from ..runtime.batch import StreamFrames

    if isinstance(parsed, StreamFrames):
        parsed = _PyAdapter(parsed)
    win = _window or {}
    end_base = None
    if kind in _FLOOR_KINDS:
        opts = dict(_FLOOR_DEFAULTS)
        bad = set(kwargs) - set(opts)
        if bad:
            raise TypeError("unexpected kwargs %s" % sorted(bad))
        opts.update(kwargs)
        sig, bargs, bconsts, row_src, extra, r, ext, carry_out = _plan_floor(
            parsed, output_dim, kind,
            skip_first_frame=win.get("skip_first", False),
            concat_carry=win.get("concat_carry"), **opts)
        table = _cached_table(bool(opts["floor_always_positive"]))
    elif kind in _RESIDUE_KINDS:
        opts = dict(_RESIDUE_DEFAULTS)
        bad = set(kwargs) - set(opts)
        if bad:
            raise TypeError("unexpected kwargs %s" % sorted(bad))
        opts.update(kwargs)
        sig, bargs, bconsts, row_src, extra, r, carry_out = _plan_residue(
            parsed, output_dim, kind,
            skip_first_frame=win.get("skip_first", False),
            base_carry=win.get("base_carry"),
            streaming=win.get("streaming", False), **opts)
        ext = None
        table = _cached_table(True)  # curve / 255.0 for floor_base
    else:
        raise ValueError("invalid kind %r" % (kind,))

    fn = _get_feat_fn(sig)
    out = fn(bargs, bconsts, row_src, table, extra)
    if sig.family == "residue" and sig.carry:
        rows, end_base = out
    else:
        rows = out
    in_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(
        (bargs, row_src)) if hasattr(x, "nbytes"))
    TRANSFER_STATS.add(in_bytes, rows.nbytes)
    pending = PendingFeatures(rows, r, ext, end_base=end_base,
                              carry_out=carry_out)
    pending.prefetch()
    return pending


def get_features_device(raw_bytes: bytes, output_dim: int,
                        kind: str = "floor_final_ys", **kwargs) -> np.ndarray:
    """Features for one file, computed on the device (first logical stream,
    matching features.batched.get_features)."""
    from ..native import frontend as native
    from ..runtime.batch import parse_stream_python

    if native.available():
        parsed = native.parse_stream_native(raw_bytes)
    else:
        parsed = parse_stream_python(raw_bytes)
    return launch_features_device(parsed, output_dim, kind, **kwargs).fetch()


# ---------------------------------------------------------- multi-chip dp --

def _plan_for_launch(parsed, output_dim, kind, kwargs):
    """Plan one stream; -> (sig, bargs, bconsts, row_src, extra, r, ext,
    table)."""
    from ..runtime.batch import StreamFrames

    if isinstance(parsed, StreamFrames):
        parsed = _PyAdapter(parsed)
    if kind in _FLOOR_KINDS:
        opts = dict(_FLOOR_DEFAULTS)
        bad = set(kwargs) - set(opts)
        if bad:
            raise TypeError("unexpected kwargs %s" % sorted(bad))
        opts.update(kwargs)
        sig, bargs, bconsts, row_src, extra, r, ext, _ = _plan_floor(
            parsed, output_dim, kind, **opts)
        table = _cached_table(bool(opts["floor_always_positive"]))
    elif kind in _RESIDUE_KINDS:
        opts = dict(_RESIDUE_DEFAULTS)
        bad = set(kwargs) - set(opts)
        if bad:
            raise TypeError("unexpected kwargs %s" % sorted(bad))
        opts.update(kwargs)
        sig, bargs, bconsts, row_src, extra, r, _ = _plan_residue(
            parsed, output_dim, kind, **opts)
        ext = None
        table = _cached_table(True)
    else:
        raise ValueError("invalid kind %r" % (kind,))
    return sig, bargs, bconsts, row_src, extra, r, ext, table


def _is_host_leaf(x) -> bool:
    return isinstance(x, (np.ndarray, np.generic))


def _mesh_replicated(mesh, x):
    """Replicate a device constant over the mesh, cached by object
    identity (the cache value keeps the source alive, so its id cannot be
    recycled while the entry exists)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    got = _CONSTS.cached(("mesh-feat", mesh, id(x)),
                         lambda: (x, jax.device_put(x, rep)))
    return got[1]


@functools.lru_cache(maxsize=256)
def _get_feat_mesh_fn(sig: _FeatSig, axes_flat: tuple):
    """vmapped-over-streams feature executable: in_axes rebuilt from the
    flattened 0/None pattern (numpy plan leaves were stacked on axis 0;
    device constants broadcast)."""
    setup_jax()

    def vfn(st_bargs, bconsts, st_rowsrc, table, st_extra):
        args3 = (st_bargs, st_rowsrc, st_extra)
        _, treedef = jax.tree_util.tree_flatten(
            args3, is_leaf=lambda v: v is None)
        axes = jax.tree_util.tree_unflatten(treedef, list(axes_flat))

        def one(bargs, row_src, extra):
            return _feat_impl(sig, bargs, bconsts, row_src, table, extra)

        return jax.vmap(lambda a: one(*a), in_axes=(axes,))(args3)

    return jax.jit(vfn)


def _plan_and_group(parsed_list, output_dim, kind, kwargs,
                    threads: int = 8):
    """Plan every stream and group same-plan streams for stacked dispatch.

    Grouping is by (signature, device-constant OBJECT identity): the
    constants are LRU-cached per setup key, so identical objects imply
    identical floor xs / zoom operators — equal shapes never suffice
    (StreamSig.const_key records the PCM-side lesson).  _FeatSig encodes
    every padded shape, so same-group numpy plan leaves always stack.
    Planner-rejected streams (e.g. floor0 slots) get plans[i] = None.

    Planning is thread-parallel (the host-side symbol packing dominates
    plan cost; the constant cache is lock-guarded, and a duplicate
    concurrent const build merely splits its group — benign).
    """
    def plan_one(p):
        try:
            return _plan_for_launch(p, output_dim, kind, kwargs)
        except DeviceFeaturesUnsupported:
            return None  # caller falls back to the host extractor

    if threads > 1 and len(parsed_list) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as ex:
            plans = list(ex.map(plan_one, parsed_list))
    else:
        plans = [plan_one(p) for p in parsed_list]

    def const_ident(plan):
        _, bargs, bconsts, _, extra, _, _, table = plan
        dev = [x for x in jax.tree_util.tree_leaves((bconsts, extra))
               if not _is_host_leaf(x)]
        return tuple(id(x) for x in dev) + (id(table),)

    groups: Dict[tuple, List[int]] = {}
    for i, plan in enumerate(plans):
        if plan is not None:
            groups.setdefault((plan[0], const_ident(plan)), []).append(i)
    return plans, groups


class _GroupRows:
    """One stacked device result shared by a group's PendingFeatures.

    The whole [S, ...] stack is fetched as ONE device->host transfer the
    first time any member needs its rows (per-stream device slicing would
    cost one gather dispatch + one fetch RPC per stream — pure link
    latency on tunneled hosts; feature rows are tiny, so a single fused
    read is strictly cheaper).
    """

    def __init__(self, dev_rows):
        self._dev = dev_rows
        self._host = None

    def prefetch(self):
        try:
            self._dev.copy_to_host_async()
        except Exception:
            pass

    def host(self) -> np.ndarray:
        if self._host is None:
            self._host = np.asarray(self._dev)
        return self._host


class _StackedPendingFeatures(PendingFeatures):
    """PendingFeatures view into a _GroupRows stack (row gi)."""

    def __init__(self, group: _GroupRows, gi: int, r: int,
                 ext: Optional[np.ndarray]):
        super().__init__(None, r, ext)
        self._group = group
        self._gi = gi

    def prefetch(self):
        self._group.prefetch()

    def fetch(self) -> np.ndarray:
        rows = self._group.host()[self._gi][: self.r]
        if self.ext is not None:
            rows = np.take(self.ext, rows)
        return rows


def launch_features_grouped(parsed_list, output_dim: int,
                            kind: str = "floor_final_ys",
                            **kwargs) -> List[Optional[PendingFeatures]]:
    """Single-chip corpus feature extraction with stacked dispatches.

    Same-plan streams stack into ONE vmapped device dispatch and ONE
    fused result fetch (the corpus analogue of launch_features_device;
    the same grouping the mesh path shards over 'data') — the
    dispatch-lean option when the chip is shared or a caller wants
    minimal execute/fetch RPCs.

    NOT the get_features_batched default: interleaved same-process A/B
    on the tunneled chip measured per-stream pipelining faster (p50
    559.9x vs 511.0x here; 442.5 vs 425.4 in a worse tunnel mood) — the
    wall there is host parse + transfer bytes, not RPC count, and the
    per-stream flow overlaps one stream's parse with another's dispatch.

    Returns one PendingFeatures per stream, None where the planner
    rejected (callers fall back to the host extractor, exactly like
    launch_features_mesh).
    """
    plans, groups = _plan_and_group(parsed_list, output_dim, kind, kwargs)
    out: List[Optional[PendingFeatures]] = [None] * len(plans)

    def launch_group(item):
        (sig, _), idxs = item
        sample = plans[idxs[0]]
        args3_sample = (sample[1], sample[3], sample[4])
        axes_flat = tuple(
            (0 if _is_host_leaf(x) else None)
            for x in jax.tree_util.tree_leaves(
                args3_sample, is_leaf=lambda v: v is None))

        def stack_leaf(*xs):
            if xs[0] is None:
                return None
            if _is_host_leaf(xs[0]):
                return jax.device_put(np.stack(xs))
            return xs[0]  # shared device constant (same object per group)

        st_args3 = jax.tree_util.tree_map(
            stack_leaf,
            *[(plans[i][1], plans[i][3], plans[i][4]) for i in idxs],
            is_leaf=lambda v: v is None)
        fn = _get_feat_mesh_fn(sig, axes_flat)
        rows = fn(st_args3[0], sample[2], st_args3[1], sample[7],
                  st_args3[2])
        in_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(
            st_args3) if hasattr(x, "nbytes"))
        TRANSFER_STATS.add(in_bytes, rows.nbytes)
        group = _GroupRows(rows)
        group.prefetch()
        for gi, i in enumerate(idxs):
            out[i] = _StackedPendingFeatures(group, gi, plans[i][5],
                                             plans[i][6])

    items = list(groups.items())
    if len(items) > 1:
        # overlap the groups' host stacking with each other's transfers
        # and dispatch (same pipelining the per-stream path gets from its
        # caller's thread pool)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(items))) as ex:
            list(ex.map(launch_group, items))
    else:
        for item in items:
            launch_group(item)
    return out


def launch_features_mesh(parsed_list, output_dim: int, mesh,
                         kind: str = "floor_final_ys",
                         **kwargs) -> List[PendingFeatures]:
    """Multi-chip feature extraction: same-plan streams stack into one
    dispatch whose stream axis is sharded over the mesh's 'data' axis —
    the same dp pattern as launch_corpus_decode_mesh for PCM (feature
    extraction is embarrassingly parallel across streams).

    Grouping is by (signature, device-constant OBJECT identity): the
    constants are LRU-cached per setup key, so identical objects imply
    identical floor xs / zoom operators — equal shapes never suffice
    (StreamSig.const_key records the PCM-side lesson).  The host/device
    split doubles as the vmap rule: numpy plan leaves are per-stream
    (stacked, axis 0), jax Arrays are broadcast constants.

    Streams the planner rejects (DeviceFeaturesUnsupported, e.g. floor0
    slots) yield None — callers fall back to the host extractor per file.
    Hermetic: planning runs under jax.default_device(mesh device), so the
    planning constants never touch the host's default backend (realm-keyed
    in the constant cache so normal-path calls never receive them).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    # plan under the mesh's device: the planning constants (render consts,
    # tables, zoom operators) must never touch the default backend — the
    # hermeticity rule of the multichip dryrun (MULTICHIP_r01 regression).
    # threads=1: jax.default_device is thread-local, so pooled planning
    # would escape the context and break exactly that rule.
    with jax.default_device(mesh.devices.flat[0]):
        plans, groups = _plan_and_group(parsed_list, output_dim, kind,
                                        kwargs, threads=1)

    data_size = mesh.shape.get("data", mesh.size)
    shard_data = NamedSharding(mesh, P("data"))
    out: List[Optional[PendingFeatures]] = [None] * len(plans)
    with mesh:
        for (sig, _), idxs in groups.items():
            sample = plans[idxs[0]]
            args3_sample = (sample[1], sample[3], sample[4])
            axes_flat = tuple(
                (0 if _is_host_leaf(x) else None)
                for x in jax.tree_util.tree_leaves(
                    args3_sample, is_leaf=lambda v: v is None))
            s_real = len(idxs)
            s_pad = -(-s_real // data_size) * data_size
            take = lambda j: plans[idxs[min(j, s_real - 1)]]

            def stack_leaf(*xs):
                if xs[0] is None:
                    return None
                if _is_host_leaf(xs[0]):
                    return jax.device_put(np.stack(xs), shard_data)
                return _mesh_replicated(mesh, xs[0])

            st_args3 = jax.tree_util.tree_map(
                stack_leaf,
                *[(take(j)[1], take(j)[3], take(j)[4]) for j in range(s_pad)],
                is_leaf=lambda v: v is None)
            bconsts = jax.tree_util.tree_map(
                lambda x: None if x is None else _mesh_replicated(mesh, x),
                sample[2], is_leaf=lambda v: v is None)
            table = _mesh_replicated(mesh, sample[7])
            fn = _get_feat_mesh_fn(sig, axes_flat)
            rows = fn(st_args3[0], bconsts, st_args3[1], table, st_args3[2])
            in_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(
                st_args3) if hasattr(x, "nbytes"))
            TRANSFER_STATS.add(in_bytes, rows.nbytes)
            for gi, i in enumerate(idxs):
                out[i] = PendingFeatures(rows[gi], plans[i][5], plans[i][6])
    for p in out:
        if p is not None:
            p.prefetch()
    return out


# ---------------------------------------------------------- streaming mode --

class StreamingFeatures:
    """Bounded-memory (windowed) device feature extraction for long streams.

    Iterating yields (rows, output_dim) float32 matrices in order; host
    memory stays O(window) — the incremental native front-end parses fixed
    windows (one carried context frame each) and every window's symbols
    ship to the device as soon as they are parsed.  Cross-window extractor
    state is carried exactly: the concat kind's pending offset (with rare
    back-appends into the previous window resolved host-side in float64,
    i.e. *more* precisely than in-window device appends) and the residue
    kinds' floor_base vector (fetched from the device at each window end).

    Matches launch_features_device window-by-window; the concatenation of
    all yielded matrices equals the whole-stream extraction (bit-exact for
    the pure floor kinds; <=1e-5 as usual elsewhere).
    """

    def __init__(self, data: bytes, output_dim: int,
                 kind: str = "floor_final_ys", window_frames: int = 4096,
                 **kwargs):
        from ..native import frontend as native

        self._inc = native.NativeIncremental(data)
        self.output_dim = output_dim
        self.kind = kind
        self.window = max(2, window_frames)
        self.kwargs = kwargs

    def __iter__(self):
        # windows fetched but not yet yielded, in order.  A back-append
        # targets the globally-last emitted row = the last row of the last
        # NON-EMPTY held window, so everything before that window may be
        # yielded; it and any (empty) windows after it stay held.
        held: List[np.ndarray] = []
        win_state = {"streaming": True}
        try:
            while True:
                view, has_ctx = self._inc.next_window(self.window)
                if view is None:
                    break
                win_state["skip_first"] = has_ctx
                pending = launch_features_device(
                    view, self.output_dim, self.kind, _window=win_state,
                    **self.kwargs)
                carry = pending.carry_out or {}
                if self.kind == "floor_final_ys_rendered_concat_residue":
                    target = next((m for m in reversed(held) if len(m)),
                                  None)
                    for (t, m, off) in carry.get("back_appends", ()):
                        if target is not None:
                            self._back_append(target, view, t, off)
                    win_state["concat_carry"] = {"off": carry.get("off", 0)}
                rows = pending.fetch()
                if self.kind == "floor_final_ys_rendered_concat_residue":
                    # held matrices may receive a cross-window back-append;
                    # fetch() returns a read-only view of the device buffer,
                    # so keep a writable copy for this kind
                    rows = np.array(rows)
                if self.kind in _RESIDUE_KINDS:
                    eb = pending.end_base()
                    if eb is not None and carry.get("had_base"):
                        win_state["base_carry"] = eb
                held.append(rows)
                last_ne = max((i for i, m in enumerate(held) if len(m)),
                              default=None)
                flush = len(held) - 1 if last_ne is None else last_ne
                for m in held[:flush]:
                    yield m
                del held[:flush]
        finally:
            self._inc.close()
        for m in held:
            yield m

    def _back_append(self, held: np.ndarray, view, t: int, off: int) -> None:
        """Host-side concat append into the previous window's final row
        (float64 numpy, mirroring extract.py:151-168 exactly)."""
        import scipy.ndimage

        n = int(view.frame_n[t])
        res0 = view.export_residues(np.array([t]), n, 0, 1)[0, 0]
        opts = dict(_FLOOR_DEFAULTS)
        opts.update(self.kwargs)
        idxs = np.arange(len(res0))
        if opts.get("xs_from_biggest_floor"):
            mults, fxs, _, _ = _floor_setup(
                _PyAdapter(view) if not hasattr(view, "floor1_info")
                else view, opts["sorted_xs"], opts["upscale_xs_factor"])
            biggest = max(range(len(fxs)), key=lambda i: len(fxs[i]))
            recent = int(view.mode_floor_numbers(int(view.mode_idx[t]))[-1])
            if biggest != recent:
                factor = int(round(float(max(fxs[biggest]))
                                   / float(max(fxs[recent]))))
                idxs = idxs // factor
        vals = np.log1p(np.abs(res0.astype(np.float64)[idxs])) * 0.1
        vals = scipy.ndimage.zoom(vals, zoom=0.5)
        vals = vals[: self.output_dim - off]
        held[-1, off : off + vals.shape[0]] = vals

    def read_all(self) -> np.ndarray:
        mats = list(self)
        if not mats:
            return np.zeros((0, self.output_dim), np.float32)
        return np.concatenate(mats, axis=0)


class _RowStream:
    """StreamingFeatures-compatible facade over a row-matrix iterator
    (the offset-streaming path yields through a dropping generator but
    callers expect the same iterate/read_all surface)."""

    def __init__(self, it, output_dim: int):
        self._it = it
        self.output_dim = output_dim

    def __iter__(self):
        return self._it

    def read_all(self) -> np.ndarray:
        mats = list(self._it)
        if not mats:
            return np.zeros((0, self.output_dim), np.float32)
        return np.concatenate(mats)


def stream_features_device(data: bytes, output_dim: int,
                           kind: str = "floor_final_ys",
                           window_frames: int = 4096,
                           start_sample: int = 0,
                           **kwargs):
    """Windowed device feature extraction (see StreamingFeatures).

    ``start_sample`` streams feature rows from mid-file: the seek splice
    (ogg/seek.py) anchors the stream so the decode only ever parses
    pages from the covering page onward (decode state stays O(window);
    the splice itself is one byte-copy of the tail), and the rows of
    frames emitting strictly before ``start_sample`` are dropped — the
    yield is the SUFFIX of the full extraction from the first frame
    emitting at/after the offset, each row bit-identical (the
    ranged-extraction argument, features/batched.get_features_range;
    unlike a closed range, the suffix keeps any zero-emission fully
    granule-truncated tail frames, exactly like the full extraction).
    The dropped-row count comes from a prefix parse of the splice's
    first audio pages (frame decode is stateless given setup, so prefix
    frame metadata is exact), extended until it provably covers the
    offset."""
    if not start_sample:
        return StreamingFeatures(data, output_dim, kind,
                                 window_frames=window_frames, **kwargs)

    from ..ogg.seek import plan_sample_range, walk_pages
    from ..native import frontend as native
    from .batched import _emission_window, _row_frames_from_parsed

    index = walk_pages(data)
    plan = plan_sample_range(index, int(start_sample), None)
    if plan.empty:
        return _RowStream(iter(()), output_dim)
    spliced = plan.splice(data)
    # locate prefix cut points from the index already in hand (no
    # re-walk): spliced = headers + bytes from the anchor page on
    headers_len = sum(b - a for a, b in plan.spans[:-1])
    anchor_off = plan.spans[-1][0]
    audio = index.audio_pages
    a0 = next(i for i, p in enumerate(audio) if p.offset == anchor_off)
    # prefix = headers + the first k audio pages; k grows until the
    # prefix contains a frame emitting at/after the offset (a covering
    # page completing no packet would otherwise leave f0 undecidable —
    # 'nothing to drop' must be provable, not a fallback)
    k = 2
    while True:
        last = min(a0 + k - 1, len(audio) - 1)
        cut = headers_len + (audio[last].end - anchor_off)
        prefix = native.parse_stream_native(spliced[:cut])
        f0, f1 = _emission_window(prefix, plan)[:2]
        if f1 > f0 or last == len(audio) - 1:
            break
        k *= 2
    rf = _row_frames_from_parsed(
        prefix, kind,
        only_biggest_floor=bool(kwargs.get("only_biggest_floor", False)))
    drop = int((rf < f0).sum()) if f1 > f0 else int(rf.size)
    inner = StreamingFeatures(spliced, output_dim, kind,
                              window_frames=window_frames, **kwargs)

    def gen():
        todrop = drop
        for mat in inner:
            if todrop:
                take = min(todrop, mat.shape[0])
                mat = mat[take:]
                todrop -= take
            if mat.shape[0]:
                yield mat

    return _RowStream(gen(), output_dim)

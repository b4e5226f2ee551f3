"""Batched JAX/XLA device back-end: the numeric half of Vorbis decode.

The host front-end handles everything bit-serial (Ogg framing, Huffman/VQ
symbol decode, integer floor synthesis) and hands the device fixed-shape
tensors per frame *bucket* (frames sharing a mode, i.e. blocksize + channel
topology).  The device runs, per bucket, over a [B, C, ...] batch:

    envelope   = inverse_db_table[floor_curve]            (gather, VPU)
    residue    = inverse_coupling(residue)                (elementwise)
    spectrum   = residue * envelope * floor_used_mask     (elementwise)
    pcm        = spectrum @ IMDCT_matrix                  (MXU matmul)
    windowed   = pcm * windows[win_sel]                   (elementwise)

XLA fuses the elementwise stages into the matmul epilogue/prologue; the
matmul is the FLOP carrier and maps directly onto the MXU
([B*C, n/2] @ [n/2, n], float32 with HIGHEST precision for <=1e-6 parity
with libvorbis).  Overlap-add runs either on host (streaming mode) or as a
`lax.scan` over the frame axis (batched corpus mode, see `ola_scan`).

Multi-chip sharding (data-parallel streams + tensor-parallel IMDCT matrix
columns, all-gather over ICI) lives in parallel/mesh.py and composes these
same functions.

Reference for the per-stage semantics: /root/reference/src/
ParseOggVorbis.hpp:1128-1274 (see SURVEY.md section 3.2).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


def use_onehot_lookup() -> bool:
    """Whether table lookups should ride the MXU as one-hot matmuls.

    TPU: yes — XLA fuses the one-hot (an eq-broadcast) into the matmul
    operand read, so nothing is materialized and the MXU replaces an
    element gather that runs ~100x below memory bandwidth.  CPU: no — XLA
    materializes the [N, W] one-hot (GBs at corpus scale, measured 18 GB
    RSS in the test suite) and the matmul costs W× the gather's FLOPs.
    ``POV_FORCE_ONEHOT=1`` forces the MXU formulation so CI (CPU backend)
    can cover it on small shapes.
    """
    import os

    if os.environ.get("POV_FORCE_ONEHOT") == "1":
        return True
    return jax.default_backend() == "tpu"


def table_lookup_f32(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact table lookup: one-hot matmul (MXU) on TPU, gather on CPU.

    TPU element gathers run orders of magnitude below memory bandwidth
    (measured on the v5e: an 8.4M-element take from a 256-entry table costs
    70 ms; the one-hot matmul 6 ms).  Bit-exactness holds because every
    product is exactly 1.0*v or 0.0*v and the sum adds one nonzero term;
    HIGHEST precision keeps the f32 table values unrounded on the MXU.
    The two formulations are therefore bit-identical (asserted in
    tests/test_jax_backend.py), and the CPU backend keeps the plain gather
    (see use_onehot_lookup for why).

    ``idx`` must be in range (guaranteed by construction here: u8 codes /
    clipped curves); out-of-range one-hot rows are all-zero -> result 0.
    """
    if not use_onehot_lookup():
        return jnp.take(table.astype(jnp.float32), idx, axis=0)
    oh = jax.nn.one_hot(idx, table.shape[0], dtype=jnp.float32)
    return jnp.matmul(oh, table.astype(jnp.float32), precision=_HIGHEST)


def _coupling_step(mag: jnp.ndarray, ang: jnp.ndarray):
    """Vorbis magnitude/angle rectangularization (spec 4.3.5), elementwise."""
    new_m = jnp.where(mag > 0, jnp.where(ang > 0, mag, mag + ang),
                      jnp.where(ang > 0, mag, mag - ang))
    new_a = jnp.where(mag > 0, jnp.where(ang > 0, mag - ang, mag),
                      jnp.where(ang > 0, mag + ang, mag))
    return new_m, new_a


def render_floor_curve_int(
    ys: jnp.ndarray,       # [B, P] uint8 — final_ys in entry order
    flags: jnp.ndarray,    # [B, P] uint8/bool — step2 flags in entry order
    *,
    xs_sorted: jnp.ndarray,    # [P] int32 — static floor xs, ascending
    sorted_idx: jnp.ndarray,   # [P] int32 — entry order -> sorted order gather
    pmap: jnp.ndarray,         # [L] int32 — eval position -> sorted segment idx
    multiplier: int,
    x_pos: Optional[jnp.ndarray] = None,  # [L] int32 eval positions
                                          # (default arange(len(pmap)))
) -> jnp.ndarray:
    """Device-side floor-1 curve synthesis (spec 7.2.4 step 2), int-exact.

    Replaces shipping the rendered [half] curve per channel with shipping the
    <=65 packed Y values: each output bin finds its bracketing step2-flagged
    points (cummax/cummin over the point axis) and evaluates the closed-form
    Bresenham line y0 + sign*(|dy|*(x-x0))//dx in int32.  Matches the host
    renderer bit-for-bit (see tests).

    ``x_pos`` evaluates the curve at arbitrary bin positions instead of the
    dense 0..half-1 grid (the feature path samples the floor at its xs
    points only); ``pmap`` must then map each position to its sorted
    segment (searchsorted(xs_sorted, x_pos, 'right') - 1).

    TPU: the [B, half] lookups into the tiny [B, P] point arrays (P <= 65)
    are static where-chains over the point axis instead of gathers — six
    per-element gathers of ~1M elements each cost ~50 ms/stream on the
    v5e (element gathers run ~100x below memory bandwidth) while the
    unrolled selects fuse into one elementwise loop.  CPU keeps the
    gathers (a 65-deep select chain is slower than scalar gathers there).
    Both formulations select identical elements, so they are bit-identical.
    """
    p = xs_sorted.shape[0]
    half = pmap.shape[0]
    ys_s = jnp.take(ys.astype(jnp.int32), sorted_idx, axis=1) * multiplier
    fl_s = jnp.take(flags.astype(jnp.bool_), sorted_idx, axis=1)
    idx = jnp.arange(p, dtype=jnp.int32)

    # last flagged point index <= i ; first flagged index >= i
    lastflag = jax.lax.cummax(jnp.where(fl_s, idx, -1), axis=1)
    nextflag = jax.lax.cummin(jnp.where(fl_s, idx, p), axis=1, reverse=True)
    nextflag = jnp.concatenate(
        [nextflag, jnp.full((nextflag.shape[0], 1), p, jnp.int32)], axis=1
    )

    if use_onehot_lookup():
        def sel(data, sidx):
            # data [B, K], sidx [B|1, half] in [0, K) -> out[b, h] =
            # data[b, sidx[b, h]] as an unrolled static select chain
            out = jnp.zeros((data.shape[0], sidx.shape[-1]), data.dtype)
            for k in range(data.shape[1]):
                out = jnp.where(sidx == k, data[:, k : k + 1], out)
            return out

        def sel_const(vec, sidx):
            # vec [K] trace-time array, sidx [B, half] -> vec[sidx]
            out = jnp.zeros(sidx.shape, vec.dtype)
            for k in range(vec.shape[0]):
                out = jnp.where(sidx == k, vec[k], out)
            return out

        li = sel(lastflag, pmap[None, :])                     # [B, half]
        hi = sel(nextflag, li + 1)                            # [B, half]
        valid = hi < p
        hi_c = jnp.minimum(hi, p - 1)
        # XLA gather clamps the (unreachable: point 0 is always flagged)
        # li = -1 corner to 0; jnp.maximum replicates that exactly
        li_c = jnp.maximum(li, 0)
        x0 = sel_const(xs_sorted, li_c)
        x1 = sel_const(xs_sorted, hi_c)
        y0 = sel(ys_s, li_c)
        y1 = sel(ys_s, hi_c)
    else:
        li = jnp.take(lastflag, pmap, axis=1)                 # [B, half]
        hi = jnp.take_along_axis(nextflag, li + 1, axis=1)    # [B, half]
        valid = hi < p
        hi_c = jnp.minimum(hi, p - 1)
        x0 = xs_sorted[li]
        x1 = xs_sorted[hi_c]
        y0 = jnp.take_along_axis(ys_s, li, axis=1)
        y1 = jnp.take_along_axis(ys_s, hi_c, axis=1)

    if x_pos is None:
        x = jnp.arange(half, dtype=jnp.int32)[None, :]
    else:
        x = x_pos.astype(jnp.int32)[None, :]
    dy = y1 - y0
    adx = jnp.maximum(x1 - x0, 1)
    off = (jnp.abs(dy) * (x - x0)) // adx
    y = jnp.where(valid, y0 + jnp.sign(dy) * off, y0)
    return y


def imdct_via_rfft(spec: jnp.ndarray, n: int) -> jnp.ndarray:
    """O(n log n) IMDCT: [..., m<=n/2] spectra -> [..., n] time frames.

    The IMDCT phase pi/(2n)(2j+1+n/2)(2k+1) is the (2j+1+n/2)-th sample of
    a length-4n DFT whose only nonzero bins are the odd harmonics 2k+1
    loaded with X[k] (conjugate-symmetric): one batched irfft plus a
    strided gather.  ~2*(4n)log(4n) FLOPs vs n^2 for the matmul — and no
    [n/2, n] cosine matrix in HBM (128MB at n=8192).  Verified against the
    float64 direct transform for n=64..8192 (tests/test_imdct_fft.py).
    Reference transform being replaced: /root/reference/src/mdct.cpp:433-527.
    """
    m = n // 2
    l = 4 * n
    h = jnp.zeros(spec.shape[:-1] + (l // 2 + 1,), dtype=jnp.complex64)
    h = h.at[..., 1 : 2 * spec.shape[-1] : 2].set(spec.astype(jnp.complex64))
    t = jnp.fft.irfft(h, n=l, axis=-1)
    idx = 2 * jnp.arange(n, dtype=jnp.int32) + 1 + m
    return (t[..., idx] * (l / 2)).astype(spec.dtype)


def frame_pipeline(
    residue: jnp.ndarray,       # [B, C, half] f32 — raw residue spectra
    floor_curve: jnp.ndarray,   # [B, C, half] int32/uint8 — integer floor curve
    floor_decoded: jnp.ndarray, # [B, C] bool — floor ys present (envelope valid)
    floor_used: jnp.ndarray,    # [B, C] bool — post nonzero-vector propagate
    win_sel: jnp.ndarray,       # [B] int32 — window variant index
    *,
    imdct_m: Optional[jnp.ndarray],  # [half, n] f32, or None with fft_n set
    windows: jnp.ndarray,      # [W, n] f32
    inverse_db: jnp.ndarray,   # [256] f32
    couplings: Tuple[Tuple[int, int], ...],  # static: (magnitude, angle) pairs
    fft_n: Optional[int] = None,  # use the O(n log n) IMDCT at this size
    env_f32: bool = False,  # floor_curve IS the f32 envelope (floor0 modes)
) -> jnp.ndarray:
    """One bucket's decode: residues + floors -> windowed time frames [B, C, n]."""
    # 4.3.5 inverse coupling, reverse declaration order (pre floor multiply
    # the reference applies coupling on raw residues, then the envelope).
    for mag, ang in reversed(couplings):
        new_m, new_a = _coupling_step(residue[:, mag, :], residue[:, ang, :])
        residue = residue.at[:, mag, :].set(new_m).at[:, ang, :].set(new_a)

    # 4.3.2/4.3.6 floor envelope (inverse-dB gather) and dot product.
    # Effective multiplier per bin: used ? (decoded ? envelope : 0) : 1 —
    # a channel made 'used' only by coupling propagation multiplies by the
    # zero envelope (reference semantics, ParseOggVorbis.hpp:1245-1253).
    if env_f32:
        envelope = floor_curve.astype(jnp.float32)
    else:
        envelope = table_lookup_f32(floor_curve.astype(jnp.int32), inverse_db)
    envelope = jnp.where(floor_decoded[..., None], envelope, 0.0)
    spectrum = residue * jnp.where(floor_used[..., None], envelope, 1.0)

    # 4.3.7 inverse MDCT — MXU matmul, or the FFT path for large frames.
    b, c, half = spectrum.shape
    if fft_n is not None:
        pcm = imdct_via_rfft(spectrum.reshape(b * c, half), fft_n)
        pcm = pcm.reshape(b, c, fft_n)
    else:
        pcm = jnp.matmul(
            spectrum.reshape(b * c, half), imdct_m, precision=_HIGHEST
        ).reshape(b, c, imdct_m.shape[1])

    # window (take, not __getitem__: windows may be a captured numpy constant)
    win = jnp.take(windows, win_sel, axis=0)  # [B, n]
    return pcm * win[:, None, :]


def ola_emit(
    windowed: jnp.ndarray,   # [T, C, max_n] windowed frames, left-aligned pad
    n_half: jnp.ndarray,     # [T] int32 — half window size per frame
    max_n: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Overlap-add emission, fully vectorized over the frame axis.

    The OLA 'carry' is only the PREVIOUS frame's right half — a one-frame
    stencil, not an accumulation:

        emitted[t, s] = windowed[t-1][C, prev_half + s]
                      + windowed[t][C, s + quarter_t - prev_quarter]
        for s < prev_quarter + quarter_t   (frame 0 emits nothing)

    Bit-identical to ola_scan (pure adds/gathers, same operand order).
    HISTORY: r3 measured this "slower than the scan" through a no-op
    ``block_until_ready`` (the tunneled backend returns before execution
    finishes) — honest r4 timing with a value fetch shows scan 158 ms /
    this stencil 199 ms / ola_emit_static ~2 ms at T=8192 on the v5e:
    per-element gathers and sequential scans are both pathological.
    Production uses ola_emit_static; this and ola_scan remain as oracles
    for its bit-exactness tests.
    """
    maxh = max_n // 2
    t = windowed.shape[0]
    s_idx = jnp.arange(maxh)
    half = n_half.astype(jnp.int32)
    prev_half = jnp.concatenate([jnp.zeros(1, jnp.int32), half[:-1]])
    quarter = half // 2
    prev_quarter = prev_half // 2
    lengths = jnp.where(prev_half > 0, prev_quarter + quarter, 0)  # [T]

    # current frame's contribution: index s + (quarter_t - prev_quarter_t)
    d = (quarter - prev_quarter)[:, None]
    cur_idx = s_idx[None, :] + d                              # [T, maxh]
    cur_valid = (cur_idx >= 0) & (cur_idx < 2 * half[:, None])
    cur = jnp.take_along_axis(
        windowed, jnp.clip(cur_idx, 0, max_n - 1)[:, None, :], axis=2)
    cur = jnp.where(cur_valid[:, None, :], cur, 0.0)

    # previous frame's tail: index prev_half + s into windowed[t-1]
    prev_w = jnp.concatenate(
        [jnp.zeros_like(windowed[:1]), windowed[:-1]], axis=0)
    tail_idx = s_idx[None, :] + prev_half[:, None]
    tail_valid = s_idx[None, :] < prev_half[:, None]
    prev_tail = jnp.take_along_axis(
        prev_w, jnp.clip(tail_idx, 0, max_n - 1)[:, None, :], axis=2)
    prev_tail = jnp.where(tail_valid[:, None, :], prev_tail, 0.0)

    emitted = jnp.where(s_idx[None, None, :] < lengths[:, None, None],
                        prev_tail + cur, 0.0)
    return emitted, lengths


def ola_emit_static(
    windowed: jnp.ndarray,   # [T, C, max_n] windowed frames, left-aligned pad
    n_half: jnp.ndarray,     # [T] int32 — half window size per frame
    max_n: int,
    halves: Tuple[int, ...],  # static: the distinct n/2 values (1 or 2)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Overlap-add emission, vectorized with STATIC slices only.

    Same emission as ola_scan/ola_emit (bit-identical: same two addends in
    the same order, same masks), but exploits that ``n_half`` takes at most
    two values, so the per-frame gather offsets

        emitted[t, s] = w[t-1][prev_half + s] + w[t][s + q_t - pq_t]

    come from a tiny static set: prev_half in ``halves`` and
    d = q_t - pq_t in {0, +/-(q1-q0)}.  Each candidate is one static slice
    of the (padded) frame buffer; per-frame selection is elementwise
    ``where``.  No gather instructions at all — the per-element
    take/take_along_axis formulations measure 50-200x slower on TPU (the
    r3 'scan is HBM-bound' conclusion came from a no-op block_until_ready;
    honest timing: scan 158 ms, stencil 199 ms, this ~2 ms at T=8192).
    """
    maxh = max_n // 2
    t, c = windowed.shape[0], windowed.shape[1]
    s_idx = jnp.arange(maxh)
    half = n_half.astype(jnp.int32)
    prev_half = jnp.concatenate([jnp.zeros(1, jnp.int32), half[:-1]])
    quarter = half // 2
    prev_quarter = prev_half // 2
    lengths = jnp.where(prev_half > 0, prev_quarter + quarter, 0)  # [T]

    qs = sorted(h // 2 for h in set(halves))
    d_values = {0}
    if len(qs) == 2:
        d_values |= {qs[1] - qs[0], qs[0] - qs[1]}

    # pad the frame axis minor dim so every candidate is an in-bounds slice
    wp = jnp.pad(windowed, ((0, 0), (0, 0), (maxh, maxh)))

    # current frame's contribution: w[t][s + d], d = q_t - pq_t
    d_t = quarter - prev_quarter                              # [T]
    cur = jnp.zeros((t, c, maxh), windowed.dtype)
    for dv in sorted(d_values):
        cand = jax.lax.slice_in_dim(wp, maxh + dv, maxh + dv + maxh, axis=2)
        cur = jnp.where((d_t == dv)[:, None, None], cand, cur)
    cur_idx = s_idx[None, :] + d_t[:, None]
    cur_valid = (cur_idx >= 0) & (cur_idx < 2 * half[:, None])
    cur = jnp.where(cur_valid[:, None, :], cur, 0.0)

    # previous frame's tail: w[t-1][prev_half + s]
    prev_wp = jnp.concatenate([jnp.zeros_like(wp[:1]), wp[:-1]], axis=0)
    prev_tail = jnp.zeros((t, c, maxh), windowed.dtype)
    for ph in sorted(set(halves)):
        cand = jax.lax.slice_in_dim(prev_wp, maxh + ph, maxh + ph + maxh,
                                    axis=2)
        prev_tail = jnp.where((prev_half == ph)[:, None, None], cand,
                              prev_tail)
    tail_valid = s_idx[None, :] < prev_half[:, None]
    prev_tail = jnp.where(tail_valid[:, None, :], prev_tail, 0.0)

    emitted = jnp.where(s_idx[None, None, :] < lengths[:, None, None],
                        prev_tail + cur, 0.0)
    return emitted, lengths


# -- batched overlap-add as a scan over the frame axis ---------------------

def ola_scan(
    windowed: jnp.ndarray,   # [T, C, max_n] windowed frames, left-aligned pad
    n_half: jnp.ndarray,     # [T] int32 — half window size per frame
    max_n: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Overlap-add emission over the frame axis.

    Emits, per frame t >= 1, the region between the centers of frames t-1 and
    t (length ``n_half[t-1]//2 + n_half[t]//2``) into a [T, C, max_n//2]
    left-aligned padded buffer plus a length vector.  Carry is the previous
    frame's right half from its center (padded to max_n//2).

    Geometry (see runtime/state.py and ParseOggVorbis.hpp:1019-1109): with
    d = n_t/4 - n_{t-1}/4, emitted[s] = prev_tail[s] + cur[s + d]
    for 0 <= s < L, and the new carry is cur[n_t/2 + s] for s < n_t/2.
    """
    maxh = max_n // 2
    s_idx = jnp.arange(maxh)

    def step(carry, inp):
        prev_tail, prev_half = carry  # [C, maxh], scalar
        cur, half = inp               # [C, max_n], scalar (= n_t/2)
        quarter = half // 2
        prev_quarter = prev_half // 2
        length = jnp.where(prev_half > 0, prev_quarter + quarter, 0)
        d = quarter - prev_quarter
        cur_idx = s_idx + d
        cur_contrib = jnp.where(
            (cur_idx >= 0) & (cur_idx < 2 * half),
            jnp.take(cur, jnp.clip(cur_idx, 0, max_n - 1), axis=-1),
            0.0,
        )
        emitted = jnp.where(s_idx < length, prev_tail + cur_contrib, 0.0)
        # new carry: right half of current frame from its center
        tail_idx = s_idx + half
        new_tail = jnp.where(
            s_idx < half,
            jnp.take(cur, jnp.clip(tail_idx, 0, max_n - 1), axis=-1),
            0.0,
        )
        return (new_tail, half), (emitted, length)

    c = windowed.shape[1]
    init = (jnp.zeros((c, maxh), dtype=windowed.dtype), jnp.zeros((), jnp.int32))
    (_, _), (emitted, lengths) = jax.lax.scan(
        step, init, (windowed, n_half.astype(jnp.int32))
    )
    return emitted, lengths

"""Pallas TPU kernels for the hot decode ops.

``fused_frame_decode`` runs the whole per-frame numeric pipeline in one
kernel: residue dictionary gather, inverse channel coupling, inverse-dB
floor envelope gather + dot product, the IMDCT matmul (MXU), and window
application — with no intermediate HBM round-trips between stages.  The
grid tiles (frame-batch x output-columns); the spectrum stages run on the
VPU per frame tile and feed the MXU tile matmul directly from VMEM.

STATUS: EXPERIMENTAL — not on the production path.  The XLA path
(runtime/jax_backend.frame_pipeline) computes the same thing via compiler
fusion and, measured on the v5e, is the faster of the two (991x vs 884x
realtime-equivalent, tools/bench_kernels.py round 1); end-to-end corpus
decode is host-link-bound either way, so explicit scheduling currently
buys nothing.  Numerics: bit-exact vs XLA in interpret mode (CPU tests);
on real TPU hardware the compiled kernel agrees with the XLA path to
~6e-6 (different MXU accumulation order), within the decode budget but
NOT bit-for-bit.  Kept as the starting point for a future fused
frame+overlap-add grid pass; select explicitly via this module.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _fused_kernel(
    res_ref,        # [TB, C, half] f32
    env_ref,        # [TB, C, half] f32 — floor envelope (0 where not decoded)
    used_ref,       # [TB, C] f32 (1/0)
    win_ref,        # [TB, TN] f32 — per-frame window slice for this column tile
    m_ref,          # [half, TN] f32 — IMDCT matrix column tile
    out_ref,        # [TB, C, TN] f32
    *,
    couplings: Tuple[Tuple[int, int], ...],
):
    res = res_ref[:]                       # [TB, C, half]
    # inverse coupling (reverse declaration order), elementwise on VPU.
    # Channels are handled as a static python list — dynamic-index updates
    # would lower to scatter, which Mosaic does not support.
    chans = [res[:, ch, :] for ch in range(res.shape[1])]
    for mag, ang in reversed(couplings):
        m = chans[mag]
        a = chans[ang]
        chans[mag] = jnp.where(m > 0, jnp.where(a > 0, m, m + a),
                               jnp.where(a > 0, m, m - a))
        chans[ang] = jnp.where(m > 0, jnp.where(a > 0, m - a, m),
                               jnp.where(a > 0, m + a, m))
    res = jnp.stack(chans, axis=1)

    # floor dot product (the inverse-dB gather runs in XLA outside the
    # kernel: Mosaic supports only 2D gathers, and the gather is a cheap
    # memory-bound op the compiler schedules fine)
    tb, c, half = res.shape
    mult = jnp.where(used_ref[:][:, :, None] > 0, env_ref[:], 1.0)
    spec = res * mult
    tn = m_ref.shape[1]
    # HIGHEST precision: default TPU matmul truncates inputs to bf16, which
    # costs ~3 decimal digits — the decode budget is 1e-6.
    pcm = jax.lax.dot_general(
        spec.reshape(tb * c, half), m_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(tb, c, tn)
    out_ref[:] = pcm * win_ref[:][:, None, :]


@functools.partial(
    jax.jit,
    static_argnames=("couplings", "tile_b", "tile_n", "interpret"),
)
def fused_frame_decode(
    residue: jnp.ndarray,     # [B, C, half] f32
    curve: jnp.ndarray,       # [B, C, half] i32
    decoded: jnp.ndarray,     # [B, C] bool
    used: jnp.ndarray,        # [B, C] bool
    win: jnp.ndarray,         # [B, n] f32 — pre-gathered per-frame windows
    inverse_db: jnp.ndarray,  # [256] f32
    imdct_m: jnp.ndarray,     # [half, n] f32
    couplings: Tuple[Tuple[int, int], ...] = (),
    tile_b: int = 8,
    tile_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed time frames [B, C, n] via the fused Pallas kernel."""
    b, c, half = residue.shape
    n = imdct_m.shape[1]
    tile_b = min(tile_b, b)
    tile_n = min(tile_n, n)
    grid = (pl.cdiv(b, tile_b), pl.cdiv(n, tile_n))

    # envelope gather in XLA (fused into the kernel's input stream by the
    # scheduler); zeroed where the floor was not decoded
    env = jnp.take(inverse_db, curve.astype(jnp.int32), axis=0)
    env = env * decoded.astype(jnp.float32)[:, :, None]

    kernel = functools.partial(_fused_kernel, couplings=couplings)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, c, half), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((tile_b, c, half), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((tile_b, c), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_b, tile_n), lambda i, j: (i, j)),
            pl.BlockSpec((half, tile_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tile_b, c, tile_n), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, c, n), jnp.float32),
        interpret=interpret,
    )(
        residue,
        env,
        used.astype(jnp.float32),
        win,
        imdct_m,
    )

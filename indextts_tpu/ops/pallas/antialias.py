"""Fused anti-aliased snake activation — Pallas TPU kernel.

The TPU equivalent of the reference's marquee CUDA kernel
(`alias_free_activation/cuda/anti_alias_activation_cuda.cu`: one fused pass of
replication-pad -> x2 FIR upsample -> snake-beta -> FIR lowpass -> x2
downsample). The XLA composite (`ops/snake.py`) materializes the 2x-rate
intermediate in HBM twice; this kernel keeps everything in VMEM.

Math (calibrated against ops/snake.antialias_activation, see
tests/test_pallas_antialias.py): with x_rep the replicate-extended input and
f/g the kaiser-sinc up/down filters (length 12),

    phase0[i] = 2 * sum_j f[2j]   * x_rep[i-3+j]      (up output at even idx 2i)
    phase1[i] = 2 * sum_j f[2j+1] * x_rep[i-2+j]      (odd idx 2i+1)
    s* = snake_beta(phase*)
    y[t] = sum_{j=-2..3} g[2j+5]*s0[t+j] + sum_{m=-3..2} g[2m+6]*s1[t+m]

Exact in the interior. At sequence edges the reference replicates the *2x-rate*
signal (up[0] / up[2N-1]); the kernel applies that correction explicitly for
the static left edge and the dynamic valid-length right edge.

Two kernels live here:

- `fused_antialias_folded` — the PRODUCTION path (dispatched by
  `ops/snake.antialias_activation` on TPU). It folds f time steps into the
  lane axis so BigVGAN's narrow-channel late stages (C in {24..192}) run at
  full VPU width, with double-buffered HBM DMA. Measured on v5e at the
  serving shapes (B=4, mel 896): whole-vocoder 635 -> ~415 ms vs the XLA
  composite, wav diff at bf16 rounding.
- `fused_antialias_activation` — the original unfolded tile kernel, kept for
  C >= 128 shapes and as the simpler reference implementation. At (T=2048,
  C=768, bf16) it measured ~4.5 ms vs ~3.2 ms XLA (the op is VPU-bound and
  XLA fuses the elementwise chain well at full lane width), which is why the
  folded layout — not fusion alone — is what finally beat XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from indextts_tpu.ops.snake import down_filter, up_filter


# ---------------------------------------------------------------------------
# folded-layout fused kernel — the production path
#
# BigVGAN's late stages run at C in {24, 48, 96, 192} channels, where a
# (T, C) layout wastes 1 - C/128 of every VPU lane row AND the XLA composite
# materializes ~13 f32 intermediates in HBM. This kernel folds f consecutive
# time steps into the lane axis — (B, T, C) -> (B, T/f, f*C) with f*C a
# multiple of 128 — which is a FREE reshape on the row-major input. A time
# shift by s inside the folded layout is a lane roll by s*C with a one-row
# borrow at the seam, so the whole up2 -> snake -> down2 chain runs at full
# lane width with exactly one HBM read of x and one write of y.
# ---------------------------------------------------------------------------

def _folded_kernel(len_ref, x_ref, alpha_ref, beta_ref, edge_ref, sleft_ref,
                   sright_ref, out_ref, scratch, sems, *, r_tile: int, f: int,
                   C: int, n_tiles: int, n_batch: int, logscale: bool,
                   fup: np.ndarray, gdn: np.ndarray):
    pid = pl.program_id(0)
    nt = n_tiles
    total = n_batch * nt
    b = pid // nt
    ti = pid % nt
    fC = f * C
    base = 8                      # scratch row of the tile's first row
    r0 = ti * r_tile

    # ---- double-buffered DMA: start tile pid+1's window into the other
    # slot before computing tile pid, so the HBM read rides under the VPU
    # work. Window is [r0-8, r0+r_tile+8) with edge clipping; rows outside
    # [0, R) stay uninitialized and are overwritten by the replicate-
    # extension selects below (t_idx < 0 / >= length).
    def dma_obj(pid2, slot, src_slice, dst_slice):
        b2 = pid2 // nt
        return pltpu.make_async_copy(x_ref.at[b2, src_slice, :],
                                     scratch.at[slot, dst_slice, :],
                                     sems.at[slot])

    def dma_do(pid2, slot, start):
        ti2 = pid2 % nt
        r02m8 = pl.multiple_of(ti2 * r_tile - 8, 8)

        def go(src, dst):
            cp = dma_obj(pid2, slot, src, dst)
            cp.start() if start else cp.wait()

        if nt == 1:
            go(pl.ds(0, r_tile), pl.ds(8, r_tile))
        else:
            first = ti2 == 0
            last = ti2 == nt - 1

            @pl.when(first)
            def _():
                go(pl.ds(0, r_tile + 8), pl.ds(8, r_tile + 8))

            @pl.when(last)
            def _():
                go(pl.ds(r02m8, r_tile + 8), pl.ds(0, r_tile + 8))

            if nt > 2:
                @pl.when(jnp.logical_and(~first, ~last))
                def _():
                    go(pl.ds(r02m8, r_tile + 16), pl.ds(0, r_tile + 16))

    slot = pid % 2

    @pl.when(pid == 0)
    def _():
        dma_do(pid, 0, start=True)

    @pl.when(pid + 1 < total)
    def _():
        dma_do(pid + 1, (pid + 1) % 2, start=True)

    dma_do(pid, slot, start=False)

    xt = scratch[slot].astype(jnp.float32)          # (r_tile+16, fC)

    length = len_ref[b]
    lane_phase = jax.lax.broadcasted_iota(jnp.int32, (r_tile + 16, fC), 1) // C
    row_g = (jax.lax.broadcasted_iota(jnp.int32, (r_tile + 16, fC), 0)
             - base + r0)
    t_idx = row_g * f + lane_phase                   # global time per element
    edge = edge_ref[b, :].astype(jnp.float32)        # (fC,) == tile(x[L-1])
    # replicate-extension: t<0 -> x[0]; t>L-1 -> x[L-1]. The left value x[0]
    # lives at lane block 0 of global row 0; broadcast it across lanes.
    xt = jnp.where(t_idx > length - 1, edge[None, :], xt)
    left_row = jnp.sum(
        jnp.where((row_g == 0) & (lane_phase == 0), xt, 0.0), axis=0,
        keepdims=True)                               # (1, fC), block 0 only
    left_tile = pltpu.repeat(left_row[:, :C], f, axis=1)   # (1, fC)
    xt = jnp.where(t_idx < 0, left_tile, xt)

    # ---- folded time-shift: s = q*f + r -> q row-shift + r lane-roll ------
    HR = -(-3 // f)  # max row reach of a |s|<=3 time shift

    def shift(M, s, lo, n):
        """M rows [lo, lo+n) shifted by s time steps (|s| <= 3); M must hold
        valid rows [lo - HR, lo + n + HR]."""
        q, r = divmod(s, f)      # floor division: 0 <= r < f
        if r == 0:
            return M[lo + q: lo + q + n, :]
        W = M[lo + q: lo + q + n + 1, :]
        RW = pltpu.roll(W, (fC - r * C) % fC, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, fC), 1)
        return jnp.where(lane < (f - r) * C, RW[0: n, :], RW[1: n + 1, :])

    # ---- phases over rows [base-HR, base+r_tile+HR); p0 needs shifts
    # [-3, 2] and p1 [-2, 3], so compute each shifted window once ----------
    n_p = r_tile + 2 * HR
    p_lo = base - HR
    G = {s: shift(xt, s, p_lo, n_p) for s in range(-3, 4)}
    p0 = jnp.zeros((n_p, fC), jnp.float32)
    p1 = jnp.zeros((n_p, fC), jnp.float32)
    for j in range(6):
        p0 = p0 + (2.0 * float(fup[2 * j])) * G[j - 3]
        p1 = p1 + (2.0 * float(fup[2 * j + 1])) * G[j - 2]

    a = alpha_ref[0, :].astype(jnp.float32)
    bb = beta_ref[0, :].astype(jnp.float32)
    if logscale:
        a = jnp.exp(a)
        bb = jnp.exp(bb)

    def snake(u):
        s = jnp.sin(u * a)
        return u + s * s / (bb + 1e-9)

    s0 = snake(p0)
    s1 = snake(p1)

    # ---- 2x-rate edge replication (reference semantics) -------------------
    pt_idx = (jax.lax.broadcasted_iota(jnp.int32, (n_p, fC), 0) - HR + r0) * f \
        + jax.lax.broadcasted_iota(jnp.int32, (n_p, fC), 1) // C
    sl = sleft_ref[b, :].astype(jnp.float32)[None, :]
    sr = sright_ref[b, :].astype(jnp.float32)[None, :]
    s0 = jnp.where(pt_idx < 0, sl, jnp.where(pt_idx > length - 1, sr, s0))
    s1 = jnp.where(pt_idx < 0, sl, jnp.where(pt_idx > length - 1, sr, s1))

    # ---- downsample (rows [HR, HR+r_tile) of the phase window) ------------
    y = jnp.zeros((r_tile, fC), jnp.float32)
    for j in range(-2, 4):
        y = y + float(gdn[2 * j + 5]) * shift(s0, j, HR, r_tile)
    for m in range(-3, 3):
        y = y + float(gdn[2 * m + 6]) * shift(s1, m, HR, r_tile)
    out_ref[0, :, :] = y.astype(out_ref.dtype)


def _edge_snakes(w0: jnp.ndarray, w1: jnp.ndarray, alpha: jnp.ndarray,
                 beta: jnp.ndarray, logscale: bool):
    """The exact 2x-rate edge values the reference replicates with.

    w0: (B, 6, C) taps x_rep[-3..2]; w1: (B, 6, C) taps x_rep[L-3..L+2]
    (both clamped to the valid region). Returns (s_left, s_right), each
    (B, C): s0[t=0] and s1[t=L-1]."""
    fup = up_filter(2)
    a_e = alpha.reshape(-1).astype(jnp.float32)
    b_e = beta.reshape(-1).astype(jnp.float32)
    if logscale:
        a_e = jnp.exp(a_e)
        b_e = jnp.exp(b_e)

    def snake_v(u):
        s = jnp.sin(u * a_e)
        return u + s * s / (b_e + 1e-9)

    p0_0 = sum(2.0 * float(fup[2 * j]) * w0[:, j] for j in range(6))
    p1_L = sum(2.0 * float(fup[2 * j + 1]) * w1[:, j] for j in range(6))
    return snake_v(p0_0), snake_v(p1_L)


def _folded_pallas_call(xfold: jnp.ndarray, lengths: jnp.ndarray,
                        alpha_t: jnp.ndarray, beta_t: jnp.ndarray,
                        edge_t: jnp.ndarray, sl_t: jnp.ndarray,
                        sr_t: jnp.ndarray, *, f: int, C: int, r_tile: int,
                        logscale: bool, interpret: bool) -> jnp.ndarray:
    """Launch `_folded_kernel` on an already-folded (B, R, f*C) input."""
    B, R, fC = xfold.shape
    nt = R // r_tile
    fup = up_filter(2)
    gdn = down_filter(2)
    kernel = functools.partial(_folded_kernel, r_tile=r_tile, f=f, C=C,
                               n_tiles=nt, n_batch=B, logscale=logscale,
                               fup=fup, gdn=gdn)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # lengths
            grid=(B * nt,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # folded x stays in HBM
                pl.BlockSpec((1, fC), lambda p, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, fC), lambda p, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, fC), lambda p, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, fC), lambda p, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, fC), lambda p, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, r_tile, fC),
                                   lambda p, *_, _nt=nt: (p // _nt, p % _nt, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, r_tile + 16, fC), xfold.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, R, fC), xfold.dtype),
        interpret=interpret,
    )(lengths, xfold, alpha_t, beta_t, edge_t, sl_t, sr_t)
    return out


@functools.partial(
    jax.jit, static_argnames=("f", "logscale", "r_tile", "interpret"))
def fused_antialias_folded(x: jnp.ndarray, alpha: jnp.ndarray,
                           beta: jnp.ndarray, f: int,
                           lengths: Optional[jnp.ndarray] = None,
                           logscale: bool = True, r_tile: int = 256,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused Activation1d on a time-folded layout.

    x: (B, T, C); f time steps fold into the lane axis (f*C should be a
    multiple of 128; T % (f*r_tile) must be 0). Exactly matches
    `ops.snake.antialias_activation` (tested in tests/test_pallas_antialias).
    """
    B, T, C = x.shape
    assert T % f == 0 and (T // f) % r_tile == 0, (T, C, f, r_tile)
    R = T // f
    fC = f * C
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    lengths = lengths.astype(jnp.int32)

    xf = x.astype(jnp.float32)
    # tiny host-of-kernel values: the edge sample x[L-1], and the exact
    # 2x-rate edge snakes s0[t=0] (left) / s1[t=L-1] (right) the reference
    # replicates with — computed here on 6-tap windows (O(B*C))
    idxL = jnp.maximum(lengths - 1, 0)[:, None, None]
    edge = jnp.take_along_axis(xf, idxL, axis=1)                 # (B, 1, C)

    def xrep(offsets):
        # x_rep[t] rows for a (B, len(offsets), C) gather with clamping
        o = jnp.asarray(offsets, jnp.int32)[None, :]
        i = jnp.clip(o, 0, jnp.maximum(lengths[:, None] - 1, 0))
        return jnp.take_along_axis(xf, i[:, :, None], axis=1)

    w0 = xrep(list(range(-3, 3)))                                 # p0[0] taps
    # p1[L-1] taps: x_rep[L-1-2+j] — dynamic per row
    oj = (lengths - 1)[:, None] + jnp.arange(-2, 4)[None, :]
    ij = jnp.clip(oj, 0, jnp.maximum(lengths[:, None] - 1, 0))
    w1 = jnp.take_along_axis(xf, ij[:, :, None], axis=1)          # (B, 6, C)
    s_left, s_right = _edge_snakes(w0, w1, alpha, beta, logscale)

    def tile_f(v):  # (B, C) -> (B, fC) phase-tiled
        return jnp.tile(v, (1, f))

    out = _folded_pallas_call(
        x.reshape(B, R, fC), lengths,
        jnp.tile(alpha.reshape(1, C), (1, f)),
        jnp.tile(beta.reshape(1, C), (1, f)),
        tile_f(edge[:, 0]), tile_f(s_left), tile_f(s_right),
        f=f, C=C, r_tile=r_tile, logscale=logscale, interpret=interpret)
    return out.reshape(B, T, C)


@functools.partial(
    jax.jit, static_argnames=("f", "C", "logscale", "r_tile", "interpret"))
def fused_antialias_prefolded(xfold: jnp.ndarray, alpha: jnp.ndarray,
                              beta: jnp.ndarray, f: int, C: int,
                              lengths: Optional[jnp.ndarray] = None,
                              logscale: bool = True, r_tile: int = 256,
                              interpret: bool = False) -> jnp.ndarray:
    """`fused_antialias_folded` on an input that is ALREADY time-folded.

    xfold: (B, R, f*C) == x.reshape(B, T//f, f*C); returns the folded output
    of the same shape. This is the stage-carried entry: BigVGAN's folded
    resblock stages keep the whole activation stream in the folded layout,
    so the kernel must not unfold/refold at its boundary (each (B, T, C<128)
    <-> (B, T/f, f*C) reshape is a physical repack of lane-padded tiles —
    the very cost that sank the per-op folded conv A/Bs, docs/KERNELS.md).

    The edge-replication values (x[L-1], s0[0], s1[L-1]) are computed from
    two-row windows of the folded tensor (O(B*f*C) gathers): time t lives at
    row t//f, lanes [(t%f)*C, (t%f+1)*C).
    """
    B, R, fC = xfold.shape
    assert fC == f * C and R % r_tile == 0, (xfold.shape, f, C, r_tile)
    if lengths is None:
        lengths = jnp.full((B,), R * f, jnp.int32)
    lengths = lengths.astype(jnp.int32)
    xf = xfold.astype(jnp.float32)
    Lm1 = jnp.maximum(lengths - 1, 0)

    # left window: rows {0, 1} -> (B, 2f, C); time j at window row j//f
    if R >= 2:
        lwin = xf[:, :2]
    else:
        lwin = jnp.concatenate([xf, xf], axis=1)
    lwin = lwin.reshape(B, 2 * f, C)
    # right window: rows {b0, b0+1}, b0 = max((L-1)//f - 1, 0); covers every
    # clamped tap t in [L-3, L-1] at local index t - b0*f in [0, 2f)
    b0 = jnp.maximum(Lm1 // f - 1, 0)                             # (B,)
    rrows = jnp.clip(b0[:, None] + jnp.arange(2)[None, :], 0, R - 1)
    rwin = jnp.take_along_axis(xf, rrows[:, :, None], axis=1)     # (B, 2, fC)
    rwin = rwin.reshape(B, 2 * f, C)

    def taps(win, offsets, base):
        o = jnp.clip(offsets, 0, Lm1[:, None]) - base[:, None]
        return jnp.take_along_axis(win, o[:, :, None], axis=1)    # (B, n, C)

    w0 = taps(lwin, jnp.broadcast_to(jnp.arange(-3, 3)[None, :], (B, 6)),
              jnp.zeros((B,), jnp.int32))
    w1 = taps(rwin, Lm1[:, None] + jnp.arange(-2, 4)[None, :], b0 * f)
    edge = taps(rwin, Lm1[:, None], b0 * f)[:, 0]                 # (B, C)
    s_left, s_right = _edge_snakes(w0, w1, alpha, beta, logscale)

    def tile_f(v):
        return jnp.tile(v, (1, f))

    return _folded_pallas_call(
        xfold, lengths,
        jnp.tile(alpha.reshape(1, C), (1, f)),
        jnp.tile(beta.reshape(1, C), (1, f)),
        tile_f(edge), tile_f(s_left), tile_f(s_right),
        f=f, C=C, r_tile=r_tile, logscale=logscale, interpret=interpret)

_E = 14       # replicate extension on each side of x
_HL = 6       # input halo needed left of an output tile (right halo is 7)
_WIN_PAD = 16  # DMA window extra rows: halo 13 rounded up to sublane tiling (8)
_M = 3        # phase halo


def _kernel(len_ref, xe_ref, alpha_ref, beta_ref, out_ref, scratch, sem,
            *, t_tile: int, logscale: bool, f: np.ndarray, g: np.ndarray):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    ci = pl.program_id(2)
    t0 = ti * t_tile
    c_tile = scratch.shape[1]
    # DMA the input tile + halo from HBM. Mosaic requires 8-aligned slice
    # starts/extents on the sublane axis: _E - _HL == 8 keeps the start at
    # t0 + 8 (t_tile % 8 == 0) and the window is t_tile + 16 rows (3 unused).
    copy = pltpu.make_async_copy(
        xe_ref.at[b, pl.ds(t0 + _E - _HL, t_tile + _WIN_PAD),
                  pl.ds(ci * c_tile, c_tile)],
        scratch, sem)
    copy.start()

    a = alpha_ref[0, :].astype(jnp.float32)
    bb = beta_ref[0, :].astype(jnp.float32)
    if logscale:
        a = jnp.exp(a)
        bb = jnp.exp(bb)

    copy.wait()
    xt = scratch[:, :].astype(jnp.float32)  # (TT+13, CT)

    n_phase = t_tile + 2 * _M
    # phase0[i] needs x_rep[i-3+j] -> scratch offset (i - t0) + _M + j  (since
    # scratch[0] == x_rep[t0-6]; i-3+j - (t0-6) = (i-t0) + 3 + j; phase index
    # base i = t0-M -> scratch row j)   [calibrated]
    p0 = jnp.zeros((n_phase, xt.shape[1]), jnp.float32)
    p1 = jnp.zeros((n_phase, xt.shape[1]), jnp.float32)
    for j in range(6):
        p0 = p0 + (2.0 * float(f[2 * j])) * xt[j: j + n_phase, :]
        p1 = p1 + (2.0 * float(f[2 * j + 1])) * xt[j + 1: j + 1 + n_phase, :]

    def snake(u):
        s = jnp.sin(u * a)
        return u + s * s / (bb + 1e-9)

    s0 = snake(p0)
    s1 = snake(p1)

    # --- edge corrections: the reference pads the *2x-rate* signal by
    # replication, so up indices < 0 all equal up[0] == phase0[global 0] and
    # indices > 2*len-1 equal up[2len-1] == phase1[len-1]. Masked selects are
    # no-ops away from the edges.
    phase_gidx = t0 - _M + jax.lax.broadcasted_iota(jnp.int32, (n_phase, 1), 0)
    left_val0 = s0[_M: _M + 1, :]
    s0 = jnp.where(phase_gidx < 0, left_val0, s0)
    s1 = jnp.where(phase_gidx < 0, left_val0, s1)
    length = len_ref[b]
    r_row = jnp.clip(length - 1 - (t0 - _M), 0, n_phase - 1)
    # dynamic row extraction as a masked reduction (dynamic_slice of values is
    # not lowerable on TPU Pallas)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n_phase, 1), 0)
    right_val1 = jnp.sum(jnp.where(row_iota == r_row, s1, 0.0), axis=0,
                         keepdims=True)
    s0 = jnp.where(phase_gidx > length - 1, right_val1, s0)
    s1 = jnp.where(phase_gidx > length - 1, right_val1, s1)

    y = jnp.zeros((t_tile, xt.shape[1]), jnp.float32)
    for j in range(-2, 4):
        y = y + float(g[2 * j + 5]) * s0[_M + j: _M + j + t_tile, :]
    for m in range(-3, 3):
        y = y + float(g[2 * m + 6]) * s1[_M + m: _M + m + t_tile, :]
    out_ref[0, :, :] = y.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("logscale", "t_tile", "c_tile", "interpret"))
def fused_antialias_activation(x: jnp.ndarray, alpha: jnp.ndarray,
                               beta: jnp.ndarray,
                               lengths: Optional[jnp.ndarray] = None,
                               logscale: bool = True, t_tile: int = 512,
                               c_tile: int = 128,
                               interpret: bool = False) -> jnp.ndarray:
    """Drop-in fused replacement for ops.snake.antialias_activation (snakebeta).

    x: (B, T, C) with T % t_tile == 0 and C % c_tile == 0 (BigVGAN buckets
    satisfy this); lengths: (B,) valid frames (defaults to T).
    """
    B, T, C = x.shape
    assert T % t_tile == 0 and C % c_tile == 0, (T, C)
    f = up_filter(2)
    g = down_filter(2)
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)

    # replicate-extend around the *valid* region (clamped gather)
    idx = jnp.arange(-_E, T + _E)[None, :]
    idx = jnp.clip(idx, 0, jnp.maximum(lengths[:, None] - 1, 0))
    xe = jnp.take_along_axis(x, idx[:, :, None], axis=1)

    grid = (B, T // t_tile, C // c_tile)
    kernel = functools.partial(_kernel, t_tile=t_tile, logscale=logscale,
                               f=f, g=g)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # lengths
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # xe stays in HBM
                pl.BlockSpec((1, c_tile), lambda b, t, c, *_: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c_tile), lambda b, t, c, *_: (0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, t_tile, c_tile),
                                   lambda b, t, c, *_: (b, t, c),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((t_tile + _WIN_PAD, c_tile), x.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), xe, alpha.reshape(1, C), beta.reshape(1, C))
    return out

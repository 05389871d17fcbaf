"""Snake activations and anti-aliased activation ops (BigVGAN-v2).

Behavioral reference:
- Snake/SnakeBeta: `s2mel/modules/bigvgan/activations.py:9-120`
  snake:      x + (1/(a+1e-9)) * sin^2(a*x)
  snakebeta:  x + (1/(b+1e-9)) * sin^2(a*x), a/b optionally stored in log scale
- Anti-aliased activation (up2 -> act -> down2) with kaiser-windowed sinc
  filters: `alias_free_activation/torch/{filter,resample,act}.py` and the
  fused CUDA kernel `alias_free_activation/cuda/anti_alias_activation_cuda.cu`.

This module provides the XLA composite path; all ops run on (B, T, C)
activations and take a per-row valid length so static length buckets are
bit-faithful to the reference's exact-length tensors (replicate padding
replicates the last *valid* frame, not the buffer edge). The fused Pallas
kernel lives in `ops/pallas/antialias.py` and must match this reference
implementation.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# kaiser sinc filter design (host-side, numpy)
# ---------------------------------------------------------------------------

def _i0(x):
    # numpy has modified bessel via np.i0
    return np.i0(x)


def kaiser_window(n: int, beta: float) -> np.ndarray:
    """torch.kaiser_window(periodic=False) equivalent."""
    if n == 1:
        return np.ones(1)
    k = np.arange(n, dtype=np.float64)
    alpha = (n - 1) / 2.0
    return _i0(beta * np.sqrt(1 - ((k - alpha) / alpha) ** 2)) / _i0(beta)


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Reference `filter.py:27-60`. Returns (kernel_size,) filter, sum=1 @ DC."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = kaiser_window(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size)
    f = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    f /= f.sum()
    return f.astype(np.float32)


@functools.lru_cache(maxsize=8)
def up_filter(ratio: int = 2, kernel_size: Optional[int] = None) -> np.ndarray:
    ks = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    return kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ks)


@functools.lru_cache(maxsize=8)
def down_filter(ratio: int = 2, kernel_size: Optional[int] = None) -> np.ndarray:
    ks = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    return kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ks)


# ---------------------------------------------------------------------------
# snake activations — (B, T, C)
# ---------------------------------------------------------------------------

def snake(x: jnp.ndarray, alpha: jnp.ndarray, logscale: bool = True) -> jnp.ndarray:
    a = alpha.astype(jnp.float32)
    if logscale:
        a = jnp.exp(a)
    xf = x.astype(jnp.float32)
    s = jnp.sin(xf * a)
    return (xf + s * s / (a + 1e-9)).astype(x.dtype)


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
               logscale: bool = True) -> jnp.ndarray:
    a = alpha.astype(jnp.float32)
    b = beta.astype(jnp.float32)
    if logscale:
        a, b = jnp.exp(a), jnp.exp(b)
    xf = x.astype(jnp.float32)
    s = jnp.sin(xf * a)
    return (xf + s * s / (b + 1e-9)).astype(x.dtype)


# ---------------------------------------------------------------------------
# resampling — (B, T, C), valid-length aware
# ---------------------------------------------------------------------------

def _replicate_pad_valid(x: jnp.ndarray, lengths: Optional[jnp.ndarray],
                         pad_l: int, pad_r: int) -> jnp.ndarray:
    """Replicate-pad around each row's valid region via clamped gather."""
    T = x.shape[1]
    idx = jnp.arange(-pad_l, T + pad_r)[None, :]
    if lengths is None:
        i = jnp.clip(idx, 0, T - 1)
        i = jnp.broadcast_to(i, (x.shape[0], i.shape[1]))
    else:
        i = jnp.clip(idx, 0, jnp.maximum(lengths[:, None] - 1, 0))
    return jnp.take_along_axis(x, i[:, :, None], axis=1)


def _depthwise_kernel(filt: np.ndarray, channels: int, dtype) -> jnp.ndarray:
    # (W,) -> (W, 1, C) for feature_group_count=C
    k = jnp.asarray(filt, dtype)
    return jnp.broadcast_to(k[:, None, None], (filt.shape[0], 1, channels))


def upsample2(x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
              ratio: int = 2) -> jnp.ndarray:
    """UpSample1d (reference `resample.py:9-38`): replicate pad, transposed
    FIR (x ratio gain), crop. (B, T, C) -> (B, ratio*T, C)."""
    B, T, C = x.shape
    filt = up_filter(ratio)
    ks = filt.shape[0]
    stride = ratio
    pad = ks // ratio - 1
    pad_left = pad * stride + (ks - stride) // 2
    pad_right = pad * stride + (ks - stride + 1) // 2
    xp = _replicate_pad_valid(x, lengths, pad, pad)
    kern = _depthwise_kernel(filt, C, x.dtype) * ratio
    y = jax.lax.conv_general_dilated(
        xp, kern, window_strides=(1,), padding=[(ks - 1, ks - 1)],
        lhs_dilation=(stride,), dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C, preferred_element_type=jnp.float32).astype(x.dtype)
    return y[:, pad_left: y.shape[1] - pad_right, :]


def downsample2(x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                ratio: int = 2) -> jnp.ndarray:
    """DownSample1d (reference `resample.py:41-57`): replicate pad + strided FIR."""
    B, T, C = x.shape
    filt = down_filter(ratio)
    ks = filt.shape[0]
    even = ks % 2 == 0
    pad_l = ks // 2 - int(even)
    pad_r = ks // 2
    xp = _replicate_pad_valid(x, lengths, pad_l, pad_r)
    kern = _depthwise_kernel(filt, C, x.dtype)
    return jax.lax.conv_general_dilated(
        xp, kern, window_strides=(ratio,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C, preferred_element_type=jnp.float32).astype(x.dtype)


def antialias_activation_composite(x: jnp.ndarray, alpha: jnp.ndarray,
                                   beta: Optional[jnp.ndarray],
                                   lengths: Optional[jnp.ndarray] = None,
                                   logscale: bool = True) -> jnp.ndarray:
    """Activation1d as literal up2 -> snake -> down2 (torch-shaped reference).

    Kept as the numerical reference for the fused paths; the depthwise
    grouped convs it lowers to are a TPU slow path (~60x off roofline), so
    serving uses `antialias_activation` below.
    """
    up_len = None if lengths is None else lengths * 2
    y = upsample2(x, lengths)
    if beta is None:
        y = snake(y, alpha, logscale)
    else:
        y = snake_beta(y, alpha, beta, logscale)
    return downsample2(y, up_len)


def _folded_plan(T: int, C: int):
    """(fold factor, row tile) for the lane-folded Pallas kernel, or None.

    f is the smallest fold with f*C a lane multiple (128); the folded row
    count T/f must factor into an 8-aligned tile.
    """
    f = 128 // math.gcd(C, 128)
    if T % f:
        return None
    R = T // f
    for rt in (256, 128, 64, 32, 16, 8):
        if R % rt == 0:
            return f, rt
    return None


def antialias_activation(x: jnp.ndarray, alpha: jnp.ndarray,
                         beta: Optional[jnp.ndarray],
                         lengths: Optional[jnp.ndarray] = None,
                         logscale: bool = True) -> jnp.ndarray:
    """Anti-aliased snake activation — serving dispatcher.

    On TPU, foldable shapes route to the lane-folded fused Pallas kernel
    (`ops/pallas/antialias.py::fused_antialias_folded`): BigVGAN's late
    stages run at C in {24..192} where the (T, C) layout wastes most of the
    VPU lane width and the XLA composite materializes ~13 f32 intermediates
    in HBM; the folded kernel reads x once and writes y once at full lane
    width. Everything else (CPU tests, unfoldable shapes,
    INDEXTTS_FUSED_ANTIALIAS=0) uses the XLA shift-and-sum below.
    """
    import os

    B, T, C = x.shape
    # batch sizes are restricted to the device-validated set: a B=5
    # whole-vocoder program kernel-faults the TPU worker (XLA-layout
    # dependent — the same shapes pass standalone; root cause open, see
    # CLAUDE.md). The vocoder dispatches in {8,4,2,1}-row chunks anyway.
    if os.environ.get("INDEXTTS_FUSED_ANTIALIAS", "1") != "0" \
            and jax.default_backend() in ("tpu", "axon") \
            and B in (1, 2, 4, 8):
        plan = _folded_plan(T, C)
        if plan is not None:
            from indextts_tpu.ops.pallas.antialias import \
                fused_antialias_folded

            f, rt = plan
            return fused_antialias_folded(
                x, alpha, alpha if beta is None else beta, f, lengths,
                logscale=logscale, r_tile=rt)
    return antialias_activation_xla(x, alpha, beta, lengths, logscale)


def antialias_activation_prefolded(xf: jnp.ndarray, alpha: jnp.ndarray,
                                   beta: Optional[jnp.ndarray], f: int, C: int,
                                   lengths: Optional[jnp.ndarray] = None,
                                   logscale: bool = True,
                                   interpret: bool = False) -> jnp.ndarray:
    """Anti-aliased snake on a time-folded (B, T/f, f*C) stream, folded out.

    Stage-carried entry for BigVGAN's folded resblock stages: keeps the
    activation in the folded layout across the op (no repack at the kernel
    boundary). On TPU this is `fused_antialias_prefolded`; elsewhere (CPU
    tests with interpret=False) it round-trips through the XLA path — the
    reshapes are semantically free there and only the TPU path is
    layout-sensitive.
    """
    import os

    B, R, fC = xf.shape
    assert fC == f * C, (xf.shape, f, C)
    use_kernel = interpret or (
        os.environ.get("INDEXTTS_FUSED_ANTIALIAS", "1") != "0"
        and jax.default_backend() in ("tpu", "axon") and B in (1, 2, 4, 8))
    if use_kernel:
        rt = next((t for t in (256, 128, 64, 32, 16, 8) if R % t == 0), None)
        if rt is not None:
            from indextts_tpu.ops.pallas.antialias import \
                fused_antialias_prefolded

            return fused_antialias_prefolded(
                xf, alpha, alpha if beta is None else beta, f, C, lengths,
                logscale=logscale, r_tile=rt, interpret=interpret)
    y = antialias_activation_xla(xf.reshape(B, R * f, C), alpha, beta,
                                 lengths, logscale)
    return y.reshape(B, R, fC)


def antialias_activation_xla(x: jnp.ndarray, alpha: jnp.ndarray,
                             beta: Optional[jnp.ndarray],
                             lengths: Optional[jnp.ndarray] = None,
                             logscale: bool = True) -> jnp.ndarray:
    """Fused Activation1d: polyphase shift-and-sum, no grouped convs/gathers.

    Exactly equal to `antialias_activation_composite` (== reference
    `alias_free_activation/torch`, with the CUDA kernel's fusion idea,
    `anti_alias_activation_cuda.cu`). With x_rep the replicate-extension of
    the valid region and f/g the kaiser up/down filters (12 taps):

        phase0[i] = 2*sum_j f[2j]   * x_rep[i-3+j]   (up output at even 2i)
        phase1[i] = 2*sum_j f[2j+1] * x_rep[i-2+j]   (odd 2i+1)
        s0, s1    = snake(phase0), snake(phase1)
        y[t]      = sum_{j=-2..3} g[2j+5]*s0[t+j] + sum_{m=-3..2} g[2m+6]*s1[t+m]

    Out-of-range reads replicate the 2x-rate signal: up[<0] == up[0] == s0[0];
    up[>2L-1] == up[2L-1] == s1[L-1] (L = per-row valid length). Everything is
    static slices + fused multiply-adds, which XLA keeps on the VPU at full
    bandwidth (the depthwise-conv formulation ran ~60x off roofline and
    dominated the whole BigVGAN stack).
    """
    B, T, C = x.shape
    f = np.asarray(up_filter(2), np.float32)
    g = np.asarray(down_filter(2), np.float32)
    f0, f1 = f[0::2] * 2.0, f[1::2] * 2.0
    xf = x.astype(jnp.float32)

    if lengths is None:
        edge = xf[:, -1:, :]
        tail_mask = None
    else:
        edge = jnp.take_along_axis(
            xf, jnp.maximum(lengths - 1, 0)[:, None, None], axis=1)  # (B,1,C)
        tail_mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, :, None]
        xf = jnp.where(tail_mask, xf, edge)

    # x_rep over indices [-3, T+3]: 3 left replicates, 4 right
    x_ext = jnp.concatenate(
        [jnp.broadcast_to(xf[:, :1], (B, 3, C)), xf,
         jnp.broadcast_to(edge, (B, 4, C))], axis=1)

    p0 = sum(f0[j] * jax.lax.slice_in_dim(x_ext, j, j + T, axis=1)
             for j in range(6))
    p1 = sum(f1[j] * jax.lax.slice_in_dim(x_ext, j + 1, j + 1 + T, axis=1)
             for j in range(6))

    a = alpha.astype(jnp.float32)
    b = a if beta is None else beta.astype(jnp.float32)
    if logscale:
        a = jnp.exp(a)
        b = a if beta is None else jnp.exp(b)
    sn0 = jnp.sin(p0 * a)
    sn1 = jnp.sin(p1 * a)
    s0 = p0 + sn0 * sn0 / (b + 1e-9)
    s1 = p1 + sn1 * sn1 / (b + 1e-9)

    # edge-replicate the 2x-rate signal: left value s0[0], right value s1[L-1]
    if tail_mask is None:
        s1_edge = s1[:, -1:, :]
    else:
        s1_edge = jnp.take_along_axis(
            s1, jnp.maximum(lengths - 1, 0)[:, None, None], axis=1)
        s0 = jnp.where(tail_mask, s0, s1_edge)
        s1 = jnp.where(tail_mask, s1, s1_edge)
    left = jnp.broadcast_to(s0[:, :1], (B, 3, C))
    right = jnp.broadcast_to(s1_edge, (B, 3, C))
    s0_full = jnp.concatenate([left, s0, right], axis=1)  # index k == s0[k-3]
    s1_full = jnp.concatenate([left, s1, right], axis=1)

    y = sum(g[2 * j + 1] * jax.lax.slice_in_dim(s0_full, j + 1, j + 1 + T, axis=1)
            for j in range(6))
    y = y + sum(g[2 * m] * jax.lax.slice_in_dim(s1_full, m, m + T, axis=1)
                for m in range(6))
    return y.astype(x.dtype)

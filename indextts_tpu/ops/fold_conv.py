"""Time-folded 1-D convolution for narrow-channel tensors.

BigVGAN's late stages run convs at C in {24..192}: on TPU the (T, C)
layout leaves most MXU lanes idle and measures 3-6 TF/s (5-9% of the
chip). Folding f frames into channels — (B, T, C) -> (B, T/f, f*C), a free
row-major reshape — turns the same conv into a short, wide conv over rows
with a block-structured (k'', f*C, f*Cout) kernel built from the original
weights. The folded conv runs ~2-7x the FLOPs (most block entries are
zero) but at full lane width, which still wins 1.2-1.4x wall time per
measured micro-benchmarks (tools/bench_bigvgan_ops.py); dilations fold too
(any d — the block structure absorbs it, no phase splitting).

Numerics: identical contraction terms, each output accumulated in one f32
conv; zero row padding in the folded domain == zero padding in the
original domain, so results match `nn.conv1d(..., padding=(pad, pad))`
exactly up to f32 reassociation (tests/test_fold_conv.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _fold_plan(k: int, d: int, f: int, cin: int, cout: int,
               pad_l: int, pad_r: int) -> Tuple[np.ndarray, int, int]:
    """Index map for the folded kernel.

    Returns (idx (k'', f*cin, f*cout) int64 into [W.flat ++ 0], rows_l,
    rows_r) where rows_l/rows_r are the zero-row paddings of the folded
    input. Entry semantics: W_folded = concat([W.flat, 0])[idx].
    """
    assert pad_l + pad_r == (k - 1) * d, (pad_l, pad_r, k, d)
    span_lo = -pad_l                       # position of tap 0 rel. row start
    span_hi = (f - 1) + (k - 1) * d - pad_l
    r_min = span_lo // f                   # floor division (negative ok)
    r_max = span_hi // f
    kk = r_max - r_min + 1
    # sentinel: index len(W.flat) selects the appended zero
    zero = k * cin * cout
    idx = np.full((kk, f * cin, f * cout), zero, np.int64)
    for tau in range(k):
        for p_out in range(f):
            s = p_out + tau * d - pad_l
            row = s // f - r_min
            p_in = s % f
            # W flat layout: (k, cin, cout) row-major
            src = (tau * cin * cout
                   + np.arange(cin)[:, None] * cout + np.arange(cout)[None, :])
            idx[row, p_in * cin:(p_in + 1) * cin,
                p_out * cout:(p_out + 1) * cout] = src
    return idx, -r_min, r_max


def fold_conv1d_prefolded(p, xf: jnp.ndarray, f: int, cin: int,
                          dilation: int = 1, padding: int = 0) -> jnp.ndarray:
    """Folded-domain conv: xf is ALREADY (B, T/f, f*cin); returns the folded
    output (B, T/f, f*cout) without unfolding. This is the stage-carried
    form — BigVGAN's folded resblock stages keep the whole activation stream
    folded, so the conv must not repack at its boundaries (the per-op
    fold/unfold repacks are what sank the earlier whole-model folded A/Bs,
    docs/KERNELS.md)."""
    kernel = p["kernel"]
    k, cin_w, cout = kernel.shape
    assert cin_w == cin, (cin_w, cin)
    B, M, _ = xf.shape
    idx, rows_l, rows_r = _fold_plan(k, dilation, f, cin, cout,
                                     padding, padding)
    wflat = jnp.concatenate(
        [kernel.reshape(-1), jnp.zeros((1,), kernel.dtype)])
    wf = wflat[idx].astype(xf.dtype)                    # (k'', f*cin, f*cout)
    # explicit shifted matmuls instead of conv_general_dilated: identical
    # contraction, but XLA's NWC conv lowering measured 1.6x slower than
    # plain dots at these shapes (tools/bench_bigvgan_ops.py); the shifted
    # views are row-offset slices of one padded buffer (no copies)
    xp = jnp.pad(xf, ((0, 0), (rows_l, rows_r), (0, 0)))
    y = None
    for r in range(wf.shape[0]):
        part = jnp.einsum("bmk,kn->bmn", xp[:, r:r + M], wf[r],
                          preferred_element_type=jnp.float32)
        y = part if y is None else y + part
    if "bias" in p:
        y = y + jnp.tile(p["bias"].astype(jnp.float32), f)
    return y.astype(xf.dtype)


def fold_conv1d(p, x: jnp.ndarray, f: int, dilation: int = 1,
                padding: int = 0) -> jnp.ndarray:
    """`nn.conv1d(p, x, padding=padding, dilation=dilation)` via time
    folding. x: (B, T, Cin) with T % f == 0; symmetric zero padding."""
    B, T, cin = x.shape
    assert T % f == 0, (T, f)
    cout = p["kernel"].shape[2]
    y = fold_conv1d_prefolded(p, x.reshape(B, T // f, f * cin), f, cin,
                              dilation=dilation, padding=padding)
    return y.reshape(B, T, cout)


def fold_factor(c: int, T: int, target_lanes: int = 384) -> int:
    """Largest power-of-two fold with f*c <= target_lanes and f | T
    (1 = don't fold)."""
    f = 1
    while (f * 2 * c <= target_lanes and T % (f * 2) == 0):
        f *= 2
    return f

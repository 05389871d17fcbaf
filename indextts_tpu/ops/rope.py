"""Rotary position embeddings (gpt_fast convention).

Behavioral reference: `s2mel/modules/gpt_fast/model.py:336-360` — pairs are
interleaved (x[..., 2i], x[..., 2i+1]) and the cache stores (cos, sin) stacked
on the last axis.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def precompute_freqs_cis(seq_len: int, n_elem: int, base: float = 10000.0,
                         dtype=np.float32) -> np.ndarray:
    """Returns (seq_len, n_elem // 2, 2) with [..., 0]=cos, [..., 1]=sin."""
    freqs = 1.0 / (base ** (np.arange(0, n_elem, 2)[: n_elem // 2].astype(np.float64) / n_elem))
    t = np.arange(seq_len, dtype=np.float64)
    angles = np.outer(t, freqs)
    return np.stack([np.cos(angles), np.sin(angles)], axis=-1).astype(dtype)


def apply_rotary_emb(x: jnp.ndarray, freqs_cis: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, H, D), freqs_cis: (T, D//2, 2) -> same shape as x.

    Matches gpt_fast `apply_rotary_emb` literally: interleaved (2i, 2i+1)
    pairs, fp32 compute. The stride-2 lane accesses this needs are a TPU
    slow path (~8 ms/DiT-step measured) — serving uses the half-split
    variant below with converter-permuted weights; this stays as the
    torch-layout reference.
    """
    dt = x.dtype
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    fc = freqs_cis.astype(jnp.float32).reshape(1, xf.shape[1], 1, xf.shape[3], 2)
    real = xf[..., 0] * fc[..., 0] - xf[..., 1] * fc[..., 1]
    imag = xf[..., 1] * fc[..., 0] + xf[..., 0] * fc[..., 1]
    out = jnp.stack([real, imag], axis=-1).reshape(x.shape)
    return out.astype(dt)


def apply_rotary_emb_half(x: jnp.ndarray, freqs_cis: jnp.ndarray) -> jnp.ndarray:
    """Rope for PAIR-DEINTERLEAVED lanes: x[..., :D/2] holds the torch
    layout's even lanes, x[..., D/2:] the odd lanes (see
    `deinterleave_rope_columns`). Contiguous half-slices only — no stride-2
    lane traffic. q.k^T is invariant under the shared lane permutation, so
    attention outputs equal the interleaved computation exactly.
    """
    dt = x.dtype
    half = x.shape[-1] // 2
    cos = freqs_cis[..., 0].astype(jnp.float32)[None, :, None, :]  # (1,T,1,D/2)
    sin = freqs_cis[..., 1].astype(jnp.float32)[None, :, None, :]
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(dt)


def deinterleave_rope_columns(lin: dict, heads: int, head_dim: int,
                              n_parts: int = 3, rotary_parts: int = 2) -> dict:
    """Host-side wqkv column permutation: for the q and k output blocks,
    reorder each head's columns from interleaved (0,1,2,...) to
    (evens..., odds...) so `apply_rotary_emb_half` sees its layout. The v
    block (and anything past `rotary_parts`) is untouched. Works on numpy
    params {"kernel": (in, n_parts*H*D), "bias"?}.
    """
    HD = heads * head_dim

    def perm(mat, axis):
        m = np.moveaxis(np.asarray(mat), axis, -1)
        parts = []
        for p in range(n_parts):
            blk = m[..., p * HD:(p + 1) * HD]
            if p < rotary_parts:
                b = blk.reshape(*blk.shape[:-1], heads, head_dim)
                blk = np.concatenate([b[..., 0::2], b[..., 1::2]],
                                     axis=-1).reshape(*blk.shape)
            parts.append(blk)
        return np.moveaxis(np.concatenate(parts, axis=-1), -1, axis)

    out = dict(lin)
    out["kernel"] = perm(lin["kernel"], -1)
    if lin.get("bias") is not None:
        out["bias"] = perm(lin["bias"], -1)
    return out

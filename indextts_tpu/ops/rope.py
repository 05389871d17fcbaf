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

    Matches gpt_fast `apply_rotary_emb`: compute in fp32, cast back.
    """
    dt = x.dtype
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    fc = freqs_cis.astype(jnp.float32).reshape(1, xf.shape[1], 1, xf.shape[3], 2)
    real = xf[..., 0] * fc[..., 0] - xf[..., 1] * fc[..., 1]
    imag = xf[..., 1] * fc[..., 0] + xf[..., 0] * fc[..., 1]
    out = jnp.stack([real, imag], axis=-1).reshape(x.shape)
    return out.astype(dt)

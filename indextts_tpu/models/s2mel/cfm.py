"""Conditional flow matching (OT-CFM) inference + loss.

Behavioral reference: `/root/reference/indextts/s2mel/modules/flow_matching.py`.

TPU-first: the Euler ODE solver is a `lax.scan` over n_timesteps with the
CFG pair (conditional + null) *stacked into the batch* — one DiT forward of
batch 2B per step, exactly like the reference's batched CFG, but with zero
host involvement: noise, steps, CFG mix, and prompt-region zeroing all live
inside one jitted program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.config import S2MelConfig
from indextts_tpu.models.s2mel.dit import dit_forward
from indextts_tpu.nn import Params
from indextts_tpu.ops.rope import precompute_freqs_cis


def cfm_inference(params: Params, s2: S2MelConfig, mu: jnp.ndarray,
                  x_lens: jnp.ndarray, prompt: jnp.ndarray, style: jnp.ndarray,
                  rng: jax.Array, n_timesteps: int = 25, temperature: float = 1.0,
                  inference_cfg_rate: float = 0.7,
                  prompt_len: Optional[jnp.ndarray] = None,
                  seq_sharding=None) -> jnp.ndarray:
    """Generate mel from semantic features.

    mu:     (B, T, content_dim) length-regulated semantic features
            (prompt_condition ++ cond, reference `infer_v2.py:657`)
    prompt: (B, T, 80) reference mel placed at [0, prompt_len), zeros after
            (we take it pre-placed, static shape; reference builds it from
            `prompt[..., :prompt_len]`, `flow_matching.py:79-82`)
    prompt_len: (B,) length of the prompt region (zeros written over x there)
    seq_sharding: optional (batch, time, feature) NamedSharding with time on
    the mesh's sp axis — sequence-parallel DiT (see dit_backbone_forward).
    Returns (B, T, 80) generated mel (prompt region is zeroed, as in the
    reference where x[..., :prompt_len] is forced 0 each step; the caller
    slices it off).
    """
    B, T, _ = mu.shape
    C = s2.DiT.in_channels
    z = jax.random.normal(rng, (B, T, C), dtype=jnp.float32) * temperature
    t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)

    if prompt_len is None:
        prompt_len = jnp.zeros((B,), jnp.int32)
    prompt_region = nn.sequence_mask(prompt_len, T)[:, :, None]  # (B, T, 1)
    x = jnp.where(prompt_region, 0.0, z)
    prompt_x = jnp.where(prompt_region, prompt, 0.0)

    freqs = jnp.asarray(precompute_freqs_cis(T, s2.DiT.head_dim, s2.DiT.rope_base))

    # stacked CFG batch: rows [0, B) conditional, [B, 2B) null
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    prompt2 = jnp.concatenate([prompt_x, jnp.zeros_like(prompt_x)], axis=0)
    style2 = jnp.concatenate([style, jnp.zeros_like(style)], axis=0)
    lens2 = jnp.concatenate([x_lens, x_lens], axis=0)

    def euler_step(x, idx):
        t0 = t_span[idx]
        dt = t_span[idx + 1] - t0
        if inference_cfg_rate > 0:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.broadcast_to(t0, (2 * B,))
            v2 = dit_forward(params, s2, x2, prompt2, lens2, t2, style2, mu2,
                             freqs_cis=freqs, seq_sharding=seq_sharding)
            v_cond, v_null = jnp.split(v2, 2, axis=0)
            v = (1.0 + inference_cfg_rate) * v_cond - inference_cfg_rate * v_null
        else:
            v = dit_forward(params, s2, x, prompt_x, x_lens,
                            jnp.broadcast_to(t0, (B,)), style, mu,
                            freqs_cis=freqs, seq_sharding=seq_sharding)
        x = x + dt * v
        x = jnp.where(prompt_region, 0.0, x)
        return x, None

    x, _ = jax.lax.scan(euler_step, x, jnp.arange(n_timesteps))
    return x


def cfm_loss(params: Params, s2: S2MelConfig, x1: jnp.ndarray,
             x_lens: jnp.ndarray, prompt_lens: jnp.ndarray, mu: jnp.ndarray,
             style: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """OT-CFM training loss (reference `flow_matching.py:116-159`).

    x1: (B, T, 80) target mel. Loss is masked to [prompt_len, x_len) rows.
    """
    B, T, C = x1.shape
    sigma_min = 1e-6
    r_t, r_z = jax.random.split(rng)
    t = jax.random.uniform(r_t, (B, 1, 1))
    z = jax.random.normal(r_z, x1.shape, dtype=x1.dtype)

    y = (1 - (1 - sigma_min) * t) * z + t * x1
    u = x1 - (1 - sigma_min) * z

    prompt_region = nn.sequence_mask(prompt_lens, T)[:, :, None]
    prompt = jnp.where(prompt_region, x1, 0.0)
    y = jnp.where(prompt_region, 0.0, y)

    v = dit_forward(params, s2, y, prompt, x_lens, t[:, 0, 0], style, mu)
    valid = nn.sequence_mask(x_lens, T)[:, :, None] & ~prompt_region
    if s2.reg_loss_type == "l2":
        err = jnp.square(v - u)
    else:
        err = jnp.abs(v - u)
    err = jnp.where(valid, err, 0.0)
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)) * C, 1.0)
    return jnp.sum(err.astype(jnp.float32)) / denom

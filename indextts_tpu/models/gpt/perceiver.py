"""Perceiver resampler: learned latents cross-attending a context sequence.

Condenses a variable-length conditioning sequence into a fixed number of
latents (32 for speaker timbre, 1 for emotion). Queries are included in the
attention keys (cross_attn_include_queries=True).

Behavioral reference: `/root/reference/indextts/gpt/perceiver.py:224-317`
(lucidrains naturalspeech2 resampler). Rebuilt functionally for XLA: fixed
latent count -> everything is static-shape; masking handles variable context.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.nn import InitRng, Params


@dataclass(frozen=True)
class PerceiverDims:
    dim: int
    dim_context: int
    num_latents: int = 32
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    depth: int = 2

    @property
    def ff_inner(self) -> int:
        # FeedForward: dim_inner = int(dim * mult * 2 / 3), GEGLU halves 2*inner
        return int(self.dim * self.ff_mult * 2 / 3)


def init_perceiver(rng: InitRng, d: PerceiverDims) -> Params:
    dim_inner = d.dim_head * d.heads
    p: Params = {"latents": rng.normal((d.num_latents, d.dim), std=0.02)}
    if d.dim_context != d.dim:
        p["proj_context"] = nn.dense_init(rng, d.dim_context, d.dim)
    layers = []
    for _ in range(d.depth):
        layers.append({
            "attn": {
                "to_q": nn.dense_init(rng, d.dim, dim_inner, bias=False),
                "to_kv": nn.dense_init(rng, d.dim, dim_inner * 2, bias=False),
                "to_out": nn.dense_init(rng, dim_inner, d.dim, bias=False),
            },
            "ff": {
                "w_in": nn.dense_init(rng, d.dim, d.ff_inner * 2),
                "w_out": nn.dense_init(rng, d.ff_inner, d.dim),
            },
        })
    p["layers"] = layers
    p["norm"] = nn.l2norm_scale_init(rng, d.dim)
    return p


def _geglu_ff(fp: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = nn.dense(fp["w_in"], x)
    a, gate = jnp.split(h, 2, axis=-1)
    return nn.dense(fp["w_out"], jax.nn.gelu(gate, approximate=False) * a)


def perceiver_resample(p: Params, d: PerceiverDims, ctx: jnp.ndarray,
                       mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """ctx: (B, T, dim_context); mask: (B, num_latents + T) bool (True=keep).

    Matches the reference call contract where the mask is pre-padded with
    `num_latents` leading Trues for the included queries
    (`gpt/model_v2.py:560` cond_mask_pad). Returns (B, num_latents, dim).
    """
    B = ctx.shape[0]
    if "proj_context" in p:
        ctx = nn.dense(p["proj_context"], ctx)
    latents = jnp.broadcast_to(p["latents"].astype(ctx.dtype)[None],
                               (B, d.num_latents, d.dim))
    scale = 1.0 / math.sqrt(d.dim_head)
    for lp in p["layers"]:
        context = jnp.concatenate([latents, ctx], axis=1)  # include queries
        q = nn.dense(lp["attn"]["to_q"], latents)
        kv = nn.dense(lp["attn"]["to_kv"], context)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(B, d.num_latents, d.heads, d.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(B, context.shape[1], d.heads, d.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(B, context.shape[1], d.heads, d.dim_head).transpose(0, 2, 1, 3)
        m = None
        if mask is not None:
            m = mask[:, None, None, :].astype(bool)
        out = nn.mha(q, k, v, mask=m, scale=scale)
        out = out.transpose(0, 2, 1, 3).reshape(B, d.num_latents, d.heads * d.dim_head)
        latents = latents + nn.dense(lp["attn"]["to_out"], out)
        latents = latents + _geglu_ff(lp["ff"], latents)
    return nn.l2norm_scaled(p["norm"], latents, d.dim)

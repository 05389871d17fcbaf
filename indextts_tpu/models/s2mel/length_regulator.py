"""Length regulator: discrete semantic codes -> frame-rate features.

Behavioral reference: `/root/reference/indextts/s2mel/modules/length_regulator.py`
(InterpolateRegulator): embed codes, nearest-neighbor interpolate from code
rate (25 Hz) to mel rate (~86 Hz, target = 1.72 * code_len), then a
conv+GroupNorm(1)+Mish stack and a 1x1 out conv, masked by target lengths.

TPU-first: output length is a static bucket; the nearest-neighbor map is a
gather with dynamically computed indices (source/target valid lengths are
traced scalars), so one compile serves every (code_len, ylen) pair in a
bucket.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.config import LengthRegulatorConfig
from indextts_tpu.nn import InitRng, Params


def init_length_regulator(rng: InitRng, cfg: LengthRegulatorConfig) -> Params:
    ch = cfg.channels
    out_ch = cfg.out_channels or ch
    p: Params = {"embedding": nn.embedding_init(rng, cfg.content_codebook_size, ch)}
    if not cfg.is_discrete:
        p["content_in_proj"] = nn.dense_init(rng, cfg.in_channels, ch)
    convs = []
    for _ in cfg.sampling_ratios:
        convs.append({
            "conv": nn.conv1d_init(rng, ch, ch, 3),
            "norm": nn.group_norm_init(rng, ch),
        })
    p["convs"] = convs
    p["out_conv"] = nn.conv1d_init(rng, ch, out_ch, 1)
    return p


def nearest_interpolate(x: jnp.ndarray, in_len: jnp.ndarray, out_len: jnp.ndarray,
                        out_size: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') over (B, T_in, C) -> (B, out_size, C).

    Matches torch semantics src_idx = floor(i * T_in / T_out) with *valid*
    extents: each row's in_len source frames are stretched onto its out_len
    target frames (the reference always calls with B=1 exact-length tensors,
    so valid extent == tensor extent there). Positions >= out_len clamp to the
    last source frame and are masked downstream.
    """
    T_in = x.shape[1]
    i = jnp.arange(out_size, dtype=jnp.float32)[None, :]  # (1, T_out)
    ratio = in_len[:, None].astype(jnp.float32) / jnp.maximum(
        out_len[:, None].astype(jnp.float32), 1.0)
    src = jnp.floor(i * ratio)
    src = jnp.clip(src.astype(jnp.int32), 0, jnp.maximum(in_len[:, None] - 1, 0))
    src = jnp.minimum(src, T_in - 1)
    return jnp.take_along_axis(x, src[:, :, None], axis=1)


def length_regulate(p: Params, cfg: LengthRegulatorConfig, codes: jnp.ndarray,
                    code_lens: jnp.ndarray, ylens: jnp.ndarray,
                    out_size: Optional[int] = None,
                    features: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """codes: (B, T_code) int32; code_lens (B,); ylens (B,) target mel lengths.

    out_size: static output length (>= max(ylens)); defaults to codes-based
    static sizing by the caller. Returns (B, out_size, out_channels), zeroed
    past ylens. `features` (B, T, in_channels) is the continuous-input path.
    """
    if cfg.is_discrete:
        x = nn.embedding(p["embedding"], codes.astype(jnp.int32))
    else:
        x = nn.dense(p["content_in_proj"], features)
    if out_size is None:
        raise ValueError("out_size (static bucket) is required")
    x = nearest_interpolate(x, code_lens, ylens, out_size)
    mask = nn.sequence_mask(ylens, out_size)
    for cp in p["convs"]:
        # zero the padded tail so the conv sees the same zero right-boundary
        # as the reference's exact-length tensors
        x = jnp.where(mask[:, :, None], x, 0.0)
        x = nn.conv1d(cp["conv"], x, padding=1)
        x = nn.group_norm(cp["norm"], x, groups=1, mask=mask)
        x = nn.mish(x)
    x = nn.conv1d(p["out_conv"], x, padding="VALID")
    return jnp.where(mask[:, :, None], x, 0.0)

"""BigVGAN v1: GPT-latent-conditioned vocoder with ECAPA speaker embedding.

Behavioral reference: `/root/reference/indextts/BigVGAN/models.py:131-260`.
Structure = BigVGAN-v2 core (shared AMP-block machinery from
`vocoder/bigvgan.py`) plus:
- input is the GPT latent (gpt_dim), optionally linearly upsampled x4
- ECAPA-TDNN speaker embedding from the prompt mel, injected via 1x1 cond
  convs at the input and (optionally) after every upsample stage
- tanh output.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.config import BigVGANV1Config
from indextts_tpu.models.vocoder.bigvgan import _amp_block, _mask
from indextts_tpu.models.vocoder.ecapa import ecapa_forward, init_ecapa
from indextts_tpu.nn import InitRng, Params


def init_bigvgan_v1(rng: InitRng, h: BigVGANV1Config) -> Params:
    ch0 = h.upsample_initial_channel
    p: Params = {"conv_pre": nn.conv1d_init(rng, h.gpt_dim, ch0, 7)}
    ups, resblocks, conds = [], [], []
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        cin, cout = ch0 // (2 ** i), ch0 // (2 ** (i + 1))
        ups.append({"kernel": rng.normal((k, cin, cout), std=0.01),
                    "bias": rng.zeros((cout,))})
        if h.cond_d_vector_in_each_upsampling_layer:
            conds.append(nn.conv1d_init(rng, h.speaker_embedding_dim, cout, 1))
        for ks, dils in zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes):
            convs1 = [nn.conv1d_init(rng, cout, cout, ks) for _ in dils]
            convs2 = [nn.conv1d_init(rng, cout, cout, ks) for _ in dils]
            acts = []
            for _ in range(2 * len(dils)):
                a = {"alpha": rng.zeros((cout,))}
                if h.activation == "snakebeta":
                    a["beta"] = rng.zeros((cout,))
                acts.append(a)
            resblocks.append({"convs1": convs1, "convs2": convs2, "acts": acts})
    p["ups"] = ups
    p["resblocks"] = resblocks
    if conds:
        p["conds"] = conds
    ch_last = ch0 // (2 ** len(h.upsample_rates))
    ap = {"alpha": rng.zeros((ch_last,))}
    if h.activation == "snakebeta":
        ap["beta"] = rng.zeros((ch_last,))
    p["activation_post"] = ap
    p["conv_post"] = nn.conv1d_init(rng, ch_last, 1, 7)
    p["speaker_encoder"] = init_ecapa(rng, h.num_mels, h.speaker_embedding_dim)
    p["cond_layer"] = nn.conv1d_init(rng, h.speaker_embedding_dim, ch0, 1)
    return p


def _linear_upsample4(x: jnp.ndarray) -> jnp.ndarray:
    """torch F.interpolate(scale_factor=4, mode='linear', align_corners=False)
    over (B, T, C) -> (B, 4T, C)."""
    B, T, C = x.shape
    out_t = 4 * T
    i = jnp.arange(out_t, dtype=jnp.float32)
    src = (i + 0.5) / 4.0 - 0.5
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    w = jnp.clip(src - lo.astype(jnp.float32), 0.0, 1.0)[None, :, None].astype(x.dtype)
    xlo = jnp.take(x, lo, axis=1)
    xhi = jnp.take(x, hi, axis=1)
    return xlo * (1 - w) + xhi * w


def bigvgan_v1_forward(p: Params, h: BigVGANV1Config, latent: jnp.ndarray,
                       mel_ref: jnp.ndarray,
                       latent_lens: Optional[jnp.ndarray] = None,
                       mel_ref_lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """latent: (B, T, gpt_dim) GPT latents; mel_ref: (B, S, num_mels) prompt mel.

    Returns wav (B, T * total_upsample) in [-1, 1] (tanh).
    """
    spk = ecapa_forward(p["speaker_encoder"], mel_ref, mel_ref_lens)  # (B,1,512)

    if h.feat_upsample:
        latent = _linear_upsample4(latent)
        lens = latent_lens * 4 if latent_lens is not None else None
    else:
        lens = latent_lens

    x = _mask(latent, lens)
    x = nn.conv1d(p["conv_pre"], x, padding=3)
    x = x + nn.conv1d(p["cond_layer"], spk, padding="VALID")
    num_kernels = len(h.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        x = _mask(x, lens)
        x = nn.conv_transpose1d(p["ups"][i], x, stride=u, padding=(k - u) // 2)
        if lens is not None:
            lens = lens * u
        if "conds" in p:
            x = x + nn.conv1d(p["conds"][i], spk, padding="VALID")
        x = _mask(x, lens)
        xs = None
        for j, (ks, dils) in enumerate(zip(h.resblock_kernel_sizes,
                                           h.resblock_dilation_sizes)):
            r = _amp_block(p["resblocks"][i * num_kernels + j],
                           _V1AmpCfg(h), x, ks, dils, lens)
            xs = r if xs is None else xs + r
        x = xs / num_kernels
    ap = p["activation_post"]
    from indextts_tpu.ops.snake import antialias_activation

    x = antialias_activation(x, ap["alpha"], ap.get("beta"), lens, h.snake_logscale)
    x = _mask(x, lens)
    x = nn.conv1d(p["conv_post"], x, padding=3)
    x = jnp.tanh(x)
    x = _mask(x, lens)
    return x[..., 0]


class _V1AmpCfg:
    """Adapter exposing the fields _amp_block reads from BigVGANConfig."""

    def __init__(self, h: BigVGANV1Config):
        self.activation = h.activation
        self.snake_logscale = h.snake_logscale

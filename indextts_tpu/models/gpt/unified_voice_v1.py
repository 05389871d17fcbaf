"""UnifiedVoice v1 (IndexTTS-1/1.5): mel-conditioned AR speech-token decoder.

Behavioral reference: `/root/reference/indextts/gpt/model.py` (713 LoC).
Differences from v2 (`unified_voice.py`):
- conditioning input is the 100-mel spectrogram of the prompt (24 kHz front
  end), via either the conformer+perceiver (v1.5) or an AttentionBlock-stack
  ConditioningEncoder + perceiver (v1.0, condition_type="perceiver")
- no emotion vector, no duration tokens: prefix = [cond latents][text]
- the teacher-forced latents feed BigVGAN-v1 directly (no s2mel).

The GPT backbone, decode engine, and prefix preparation are shared with v2.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.config import GPTConfig
from indextts_tpu.models.gpt.conformer import (ConformerDims, conformer_encode,
                                               init_conformer)
from indextts_tpu.models.gpt.gpt2 import GPT2Dims, gpt2_forward, init_gpt2
from indextts_tpu.models.gpt.perceiver import (PerceiverDims, init_perceiver,
                                               perceiver_resample)
from indextts_tpu.nn import InitRng, Params


# ---------------------------------------------------------------------------
# AttentionBlock conditioning encoder (v1.0 "perceiver" condition type)
# ---------------------------------------------------------------------------

def _gn_groups(channels: int) -> int:
    """normalization() group count (reference `utils/arch_util.py:23-38`)."""
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups = int(groups / 2)
    assert groups > 2
    return groups


def init_attention_block(rng: InitRng, channels: int, heads: int) -> Params:
    return {
        "norm": nn.group_norm_init(rng, channels),
        "qkv": nn.conv1d_init(rng, channels, channels * 3, 1),
        "proj_out": {"kernel": rng.zeros((1, channels, channels)),
                     "bias": rng.zeros((channels,))},
    }


def attention_block(p: Params, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """QKVAttentionLegacy block over (B, T, C) activations.

    Reference `arch_util.py:40-120`: GroupNorm32 -> 1x1 qkv conv with
    *per-head-grouped* [q,k,v] channel layout -> scale 1/sqrt(sqrt(ch)) on both
    q and k -> softmax -> 1x1 zero-init out conv, residual.
    """
    B, T, C = x.shape
    ch = C // heads
    h = nn.group_norm(p["norm"], x, groups=_gn_groups(C))
    qkv = nn.conv1d(p["qkv"], h, padding="VALID")  # (B, T, 3C), per-head groups
    qkv = qkv.reshape(B, T, heads, 3 * ch)
    q, k, v = jnp.split(qkv, 3, axis=-1)  # each (B, T, H, ch)
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    a = jnp.einsum("bhts,bshc->bthc", w, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    a = a.reshape(B, T, C)
    out = nn.conv1d(p["proj_out"], a, padding="VALID")
    return x + out


def init_conditioning_encoder(rng: InitRng, spec_dim: int, embedding_dim: int,
                              attn_blocks: int = 6, heads: int = 4) -> Params:
    return {
        "init": nn.conv1d_init(rng, spec_dim, embedding_dim, 1),
        "attn": [init_attention_block(rng, embedding_dim, heads)
                 for _ in range(attn_blocks)],
    }


def conditioning_encoder(p: Params, x: jnp.ndarray, heads: int,
                         mean: bool = False) -> jnp.ndarray:
    """(B, T, spec_dim) -> (B, T, D) (or (B, D) when mean=True).

    Reference `model_v2.py:215-240` / `model.py` ConditioningEncoder.
    """
    h = nn.conv1d(p["init"], x, padding="VALID")
    for bp in p["attn"]:
        h = attention_block(bp, h, heads)
    if mean:
        return jnp.mean(h, axis=1)
    return h


# ---------------------------------------------------------------------------
# v1 model
# ---------------------------------------------------------------------------

def make_dims_v1(cfg: GPTConfig):
    dims = {"gpt": GPT2Dims(cfg.layers, cfg.model_dim, cfg.heads)}
    if cfg.condition_type == "conformer_perceiver":
        cm = cfg.condition_module
        dims["cond_conformer"] = ConformerDims(
            input_size=cfg.cond_input_dim, output_size=cm.output_size,
            attention_heads=cm.attention_heads, linear_units=cm.linear_units,
            num_blocks=cm.num_blocks, input_layer=cm.input_layer)
        dims["cond_perceiver"] = PerceiverDims(
            dim=cfg.model_dim, dim_context=cm.output_size,
            num_latents=cfg.condition_num_latent, heads=cm.attention_heads,
            ff_mult=cm.perceiver_mult)
    else:  # "perceiver"
        dims["cond_perceiver"] = PerceiverDims(
            dim=cfg.model_dim, dim_context=cfg.model_dim,
            num_latents=cfg.condition_num_latent, heads=8)
    return dims


def init_unified_voice_v1(rng: InitRng, cfg: GPTConfig) -> Params:
    dims = make_dims_v1(cfg)
    D = cfg.model_dim
    p: Params = {}
    if cfg.condition_type == "conformer_perceiver":
        p["conditioning_encoder"] = init_conformer(rng, dims["cond_conformer"])
    else:
        p["conditioning_encoder"] = init_conditioning_encoder(
            rng, cfg.cond_input_dim, D, attn_blocks=6, heads=cfg.heads)
    p["perceiver_encoder"] = init_perceiver(rng, dims["cond_perceiver"])
    p.update({
        "text_embedding": nn.embedding_init(rng, cfg.text_vocab_size, D),
        "mel_embedding": nn.embedding_init(rng, cfg.number_mel_codes, D),
        "text_pos_embedding": nn.embedding_init(rng, cfg.max_text_positions, D),
        "mel_pos_embedding": nn.embedding_init(rng, cfg.max_mel_positions, D),
        "gpt": init_gpt2(rng, dims["gpt"]),
        "final_norm": nn.layer_norm_init(rng, D),
        "mel_head": nn.dense_init(rng, D, cfg.number_mel_codes),
        "text_head": nn.dense_init(rng, D, cfg.text_vocab_size),
    })
    return p


def get_conditioning_v1(params: Params, cfg: GPTConfig, cond_mel: jnp.ndarray,
                        cond_lens: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 100) prompt mel -> (B, 32, dim) latents (reference
    `model.py:497-524` / get_conditioning)."""
    dims = make_dims_v1(cfg)
    if cfg.condition_type == "conformer_perceiver":
        enc, mask = conformer_encode(params["conditioning_encoder"],
                                     dims["cond_conformer"], cond_mel, cond_lens)
        lat_mask = jnp.concatenate(
            [jnp.ones((mask.shape[0], cfg.condition_num_latent), bool), mask],
            axis=1)
        return perceiver_resample(params["perceiver_encoder"],
                                  dims["cond_perceiver"], enc, lat_mask)
    enc = conditioning_encoder(params["conditioning_encoder"], cond_mel, cfg.heads)
    return perceiver_resample(params["perceiver_encoder"],
                              dims["cond_perceiver"], enc, None)


def forward_latents_v1(params: Params, cfg: GPTConfig, cond_latents: jnp.ndarray,
                       text_ids: jnp.ndarray, text_lens: jnp.ndarray,
                       mel_codes: jnp.ndarray, mel_lens: jnp.ndarray,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Teacher-forced latents for BigVGAN-v1 (reference `model.py:526-594`,
    return_latent=True)."""
    B, Lt = text_ids.shape
    arange_t = jnp.arange(Lt)[None, :]
    text_ids = jnp.where(arange_t < text_lens[:, None], text_ids, cfg.stop_text_token)
    text_in = jnp.concatenate(
        [jnp.full((B, 1), cfg.start_text_token, jnp.int32),
         text_ids.astype(jnp.int32),
         jnp.full((B, 1), cfg.stop_text_token, jnp.int32)], axis=1)

    Lm = mel_codes.shape[1]
    arange_m = jnp.arange(Lm)[None, :]
    mel_codes = jnp.where(arange_m < mel_lens[:, None], mel_codes, cfg.stop_mel_token)
    mel_in = jnp.concatenate(
        [jnp.full((B, 1), cfg.start_mel_token, jnp.int32),
         mel_codes.astype(jnp.int32),
         jnp.full((B, 1), cfg.stop_mel_token, jnp.int32)], axis=1)

    conds = cond_latents.astype(dtype)
    text_emb = nn.embedding(params["text_embedding"], text_in, dtype) \
        + params["text_pos_embedding"]["weight"][: text_in.shape[1]].astype(dtype)[None]
    mel_emb = nn.embedding(params["mel_embedding"], mel_in, dtype) \
        + params["mel_pos_embedding"]["weight"][: mel_in.shape[1]].astype(dtype)[None]
    emb = jnp.concatenate([conds, text_emb, mel_emb], axis=1)
    dims = make_dims_v1(cfg)["gpt"]
    hidden = gpt2_forward(params["gpt"], emb, dims)
    enc = nn.layer_norm(params["final_norm"], hidden[:, conds.shape[1]:])
    return enc[:, text_in.shape[1]:][:, :-2]

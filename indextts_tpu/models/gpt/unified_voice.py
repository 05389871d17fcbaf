"""UnifiedVoice v2 — the autoregressive speech-token decoder, TPU-native.

Token stream layout (reference `gpt/model_v2.py:589-631,698-783`):

    [cond(32 latents) + emo_vec] [dur_half] [dur] [text tokens] [mel codes]

- speaker conditioning: conformer encoder over w2v-bert features ->
  perceiver resampler -> 32 latents (`get_conditioning`)
- emotion conditioning: smaller conformer -> 1-latent perceiver -> 1024-d
  vector -> emovec_layer (1024->dim) -> emo_layer (dim->dim), added to every
  cond latent
- duration: 2-entry `speed_emb` table; inference uses [emb(1), emb(0)]
- text embeddings + learned text positions; mel embeddings + learned mel
  positions; final LayerNorm + mel head for logits; the *pre-head* hidden
  states over the mel segment are the "latents" consumed by s2mel.

This module owns parameter init and the pure forward functions; the jitted
decode loop lives in `engine/decode.py`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

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


def make_dims(cfg: GPTConfig):
    cond = cfg.condition_module
    emo = cfg.emo_condition_module
    return {
        "gpt": GPT2Dims(cfg.layers, cfg.model_dim, cfg.heads),
        "cond_conformer": ConformerDims(
            input_size=cfg.cond_input_dim, output_size=cond.output_size,
            attention_heads=cond.attention_heads, linear_units=cond.linear_units,
            num_blocks=cond.num_blocks, input_layer=cond.input_layer),
        "cond_perceiver": PerceiverDims(
            dim=cfg.model_dim, dim_context=cond.output_size,
            num_latents=cfg.condition_num_latent, heads=cond.attention_heads,
            ff_mult=cond.perceiver_mult),
        "emo_conformer": ConformerDims(
            input_size=cfg.cond_input_dim, output_size=emo.output_size,
            attention_heads=emo.attention_heads, linear_units=emo.linear_units,
            num_blocks=emo.num_blocks, input_layer=emo.input_layer),
        "emo_perceiver": PerceiverDims(
            dim=cfg.cond_input_dim, dim_context=emo.output_size, num_latents=1,
            heads=emo.attention_heads, ff_mult=emo.perceiver_mult),
    }


def init_unified_voice(rng: InitRng, cfg: GPTConfig) -> Params:
    dims = make_dims(cfg)
    D = cfg.model_dim
    return {
        "conditioning_encoder": init_conformer(rng, dims["cond_conformer"]),
        "perceiver_encoder": init_perceiver(rng, dims["cond_perceiver"]),
        "emo_conditioning_encoder": init_conformer(rng, dims["emo_conformer"]),
        "emo_perceiver_encoder": init_perceiver(rng, dims["emo_perceiver"]),
        "text_embedding": nn.embedding_init(rng, cfg.text_vocab_size, D),
        "mel_embedding": nn.embedding_init(rng, cfg.number_mel_codes, D),
        "text_pos_embedding": nn.embedding_init(rng, cfg.max_text_positions, D),
        "mel_pos_embedding": nn.embedding_init(rng, cfg.max_mel_positions, D),
        "emo_layer": nn.dense_init(rng, D, D),
        "emovec_layer": nn.dense_init(rng, cfg.cond_input_dim, D),
        "speed_emb": {"weight": rng.zeros((2, D))},  # init std 0 (model_v2.py:403)
        "gpt": init_gpt2(rng, dims["gpt"]),
        "final_norm": nn.layer_norm_init(rng, D),
        "mel_head": nn.dense_init(rng, D, cfg.number_mel_codes),
        "text_head": nn.dense_init(rng, D, cfg.text_vocab_size),
    }


# ---------------------------------------------------------------------------
# conditioning
# ---------------------------------------------------------------------------

def get_conditioning(params: Params, cfg: GPTConfig, cond_emb: jnp.ndarray,
                     cond_lens: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 1024) w2v-bert features -> (B, 32, dim) speaker latents.

    Reference `model_v2.py:549-578` (conformer_perceiver branch).
    """
    dims = make_dims(cfg)
    enc, mask = conformer_encode(params["conditioning_encoder"],
                                 dims["cond_conformer"], cond_emb, cond_lens)
    lat_mask = jnp.concatenate(
        [jnp.ones((mask.shape[0], cfg.condition_num_latent), dtype=bool), mask], axis=1)
    return perceiver_resample(params["perceiver_encoder"], dims["cond_perceiver"],
                              enc, lat_mask)


def get_emo_conditioning(params: Params, cfg: GPTConfig, emo_emb: jnp.ndarray,
                         emo_lens: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 1024) -> (B, 1024) raw emotion vector (pre-emovec_layer).

    Reference `model_v2.py:581-586`.
    """
    dims = make_dims(cfg)
    enc, mask = conformer_encode(params["emo_conditioning_encoder"],
                                 dims["emo_conformer"], emo_emb, emo_lens)
    lat_mask = jnp.concatenate([jnp.ones((mask.shape[0], 1), dtype=bool), mask], axis=1)
    out = perceiver_resample(params["emo_perceiver_encoder"], dims["emo_perceiver"],
                             enc, lat_mask)
    return out[:, 0, :]


def get_emovec(params: Params, cfg: GPTConfig, emo_emb: jnp.ndarray,
               emo_lens: jnp.ndarray) -> jnp.ndarray:
    """Full emotion vector: perceiver -> emovec_layer -> emo_layer (dim)."""
    v = get_emo_conditioning(params, cfg, emo_emb, emo_lens)
    v = nn.dense(params["emovec_layer"], v)
    return nn.dense(params["emo_layer"], v)


def merge_emovec(params: Params, cfg: GPTConfig, spk_emb: jnp.ndarray,
                 emo_emb: jnp.ndarray, spk_lens: jnp.ndarray,
                 emo_lens: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    """base + alpha * (emo - base), reference `model_v2.py:791-796`."""
    emo_vec = get_emovec(params, cfg, emo_emb, emo_lens)
    base_vec = get_emovec(params, cfg, spk_emb, spk_lens)
    return base_vec + alpha * (emo_vec - base_vec)


def build_conds_latent(params: Params, cond_latents: jnp.ndarray,
                       emo_vec: jnp.ndarray) -> jnp.ndarray:
    """[cond+emo, dur_half, dur] prefix (B, 34, dim), reference `model_v2.py:729-731`."""
    B = cond_latents.shape[0]
    dt = cond_latents.dtype
    speed = params["speed_emb"]["weight"].astype(dt)
    dur = jnp.broadcast_to(speed[0][None, None], (B, 1, speed.shape[1]))
    dur_half = jnp.broadcast_to(speed[1][None, None], (B, 1, speed.shape[1]))
    conds = cond_latents + emo_vec[:, None, :].astype(dt)
    return jnp.concatenate([conds, dur_half, dur], axis=1)


# ---------------------------------------------------------------------------
# embeddings / input prep
# ---------------------------------------------------------------------------

def embed_text(params: Params, text_ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Text embedding + learned positional (positions 0..T-1)."""
    T = text_ids.shape[-1]
    emb = nn.embedding(params["text_embedding"], text_ids, dtype)
    pos = params["text_pos_embedding"]["weight"][:T].astype(dtype)
    return emb + pos[None]


def embed_mel(params: Params, mel_ids: jnp.ndarray, pos_offset=0,
              dtype=jnp.float32) -> jnp.ndarray:
    T = mel_ids.shape[-1]
    emb = nn.embedding(params["mel_embedding"], mel_ids, dtype)
    pos = jax.lax.dynamic_slice_in_dim(params["mel_pos_embedding"]["weight"],
                                       pos_offset, T).astype(dtype)
    return emb + pos[None]


def prepare_prefix_embeds(params: Params, cfg: GPTConfig,
                          conds_latent: jnp.ndarray, text_ids: jnp.ndarray,
                          text_lens: jnp.ndarray, prefix_len: int,
                          dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the left-padded [pad][cond][text] prefix embedding batch.

    text_ids: (B, Lmax) raw segment token ids (no start/stop), text_lens (B,).
    Each row becomes [pad...][conds(34)][start_text][text][stop_text] with
    total static length ``prefix_len``; returns (embeds (B, prefix_len, D),
    attn_mask (B, prefix_len)). Mirrors `prepare_gpt_inputs`
    (`model_v2.py:633-696`) but fully vectorized / static-shape.
    """
    B, Lmax = text_ids.shape
    n_cond = conds_latent.shape[1]
    D = conds_latent.shape[2]
    text_total = Lmax + 2  # start + text + stop

    # per-row padded text: [start][tokens...][stop][stop-pad...]
    ids = jnp.full((B, text_total), cfg.stop_text_token, dtype=jnp.int32)
    ids = ids.at[:, 0].set(cfg.start_text_token)
    ids = jax.lax.dynamic_update_slice(ids, text_ids.astype(jnp.int32), (0, 1))
    # place stop token right after the real tokens
    stop_pos = text_lens + 1
    ids = jnp.where(jnp.arange(text_total)[None, :] == stop_pos[:, None],
                    cfg.stop_text_token, ids)
    valid = jnp.arange(text_total)[None, :] <= stop_pos[:, None]  # start..stop inclusive

    text_emb = nn.embedding(params["text_embedding"], ids, dtype)
    # positions count within each row's unpadded [start..stop] span: 0..len+1
    pos_ids = jnp.arange(text_total)[None, :]
    text_emb = text_emb + params["text_pos_embedding"]["weight"].astype(dtype)[pos_ids][0][None]

    seq = jnp.concatenate([conds_latent.astype(dtype), text_emb], axis=1)  # (B, n_cond+text_total, D)
    seq_valid = jnp.concatenate(
        [jnp.ones((B, n_cond), dtype=bool), valid], axis=1)

    # left-align per-row valid content to the *right* edge of the prefix buffer
    # (left padding). shift per row = prefix_len - (n_cond + stop_pos + 1)
    content_len = n_cond + stop_pos + 1
    shift = prefix_len - content_len  # (B,)
    idx = jnp.arange(prefix_len)[None, :] - shift[:, None]  # source index per slot
    in_range = (idx >= 0) & (idx < seq.shape[1])
    idx_c = jnp.clip(idx, 0, seq.shape[1] - 1)
    embeds = jnp.take_along_axis(seq, idx_c[:, :, None], axis=1)
    mask = jnp.take_along_axis(seq_valid, idx_c, axis=1) & in_range
    embeds = jnp.where(mask[:, :, None], embeds, 0.0)
    return embeds, mask


# ---------------------------------------------------------------------------
# teacher-forced forward (latent extraction / training)
# ---------------------------------------------------------------------------

def forward_latents(params: Params, cfg: GPTConfig,
                    cond_latents: jnp.ndarray, emo_vec: jnp.ndarray,
                    text_ids: jnp.ndarray, text_lens: jnp.ndarray,
                    mel_codes: jnp.ndarray, mel_lens: jnp.ndarray,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Teacher-forced pass returning mel latents (B, T_mel, dim).

    Matches reference `forward(...)` -> `mel_logits[:, :-2]`
    (`model_v2.py:589-631`): inputs are [conds][start_text + text + stop_text]
    [start_mel + mel + stop_mel]; output latents are the final-norm hidden
    states over the mel span minus the last two positions.
    """
    B, Lt = text_ids.shape
    # pad text rows with stop tokens beyond their length; input stream is
    # [start][text][stop] (one stop from F.pad(0,1); build_aligned adds start
    # to the *input* and the extra stop only to targets, model_v2.py:488-491)
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

    conds = build_conds_latent(params, cond_latents, emo_vec).astype(dtype)
    text_emb = nn.embedding(params["text_embedding"], text_in, dtype) \
        + params["text_pos_embedding"]["weight"][: text_in.shape[1]].astype(dtype)[None]
    mel_emb = nn.embedding(params["mel_embedding"], mel_in, dtype) \
        + params["mel_pos_embedding"]["weight"][: mel_in.shape[1]].astype(dtype)[None]

    emb = jnp.concatenate([conds, text_emb, mel_emb], axis=1)
    dims = make_dims(cfg)["gpt"]
    hidden = gpt2_forward(params["gpt"], emb, dims)  # includes backbone ln_f
    offset = conds.shape[1]
    enc = hidden[:, offset:]
    enc = nn.layer_norm(params["final_norm"], enc)
    mel_span = enc[:, text_in.shape[1]:]
    return mel_span[:, :-2]  # strip the two positions added here


def forward_logits(params: Params, cfg: GPTConfig,
                   cond_latents: jnp.ndarray, emo_vec: jnp.ndarray,
                   text_ids: jnp.ndarray, text_lens: jnp.ndarray,
                   mel_codes: jnp.ndarray, mel_lens: jnp.ndarray,
                   dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """Training-style forward: (text_logits, mel_logits, targets).

    The reference's training path computes CE over aligned inputs/targets
    (`gpt/model.py:526-594`); v2 keeps the same structure. Used by our
    training step (new capability) and by tests.
    """
    B, Lt = text_ids.shape
    arange_t = jnp.arange(Lt)[None, :]
    text_pad = jnp.where(arange_t < text_lens[:, None], text_ids, cfg.stop_text_token)
    text_full = jnp.concatenate(
        [text_pad.astype(jnp.int32), jnp.full((B, 1), cfg.stop_text_token, jnp.int32)], axis=1)
    text_in = jnp.pad(text_full, ((0, 0), (1, 0)), constant_values=cfg.start_text_token)
    text_tar = jnp.pad(text_full, ((0, 0), (0, 1)), constant_values=cfg.stop_text_token)

    Lm = mel_codes.shape[1]
    arange_m = jnp.arange(Lm)[None, :]
    mel_pad = jnp.where(arange_m < mel_lens[:, None], mel_codes, cfg.stop_mel_token)
    mel_full = jnp.concatenate(
        [mel_pad.astype(jnp.int32), jnp.full((B, 1), cfg.stop_mel_token, jnp.int32)], axis=1)
    mel_in = jnp.pad(mel_full, ((0, 0), (1, 0)), constant_values=cfg.start_mel_token)
    mel_tar = jnp.pad(mel_full, ((0, 0), (0, 1)), constant_values=cfg.stop_mel_token)

    conds = build_conds_latent(params, cond_latents, emo_vec).astype(dtype)
    text_emb = nn.embedding(params["text_embedding"], text_in, dtype) \
        + params["text_pos_embedding"]["weight"][: text_in.shape[1]].astype(dtype)[None]
    mel_emb = nn.embedding(params["mel_embedding"], mel_in, dtype) \
        + params["mel_pos_embedding"]["weight"][: mel_in.shape[1]].astype(dtype)[None]
    emb = jnp.concatenate([conds, text_emb, mel_emb], axis=1)

    dims = make_dims(cfg)["gpt"]
    hidden = gpt2_forward(params["gpt"], emb, dims)
    enc = nn.layer_norm(params["final_norm"], hidden[:, conds.shape[1]:])
    text_span = enc[:, : text_in.shape[1]]
    mel_span = enc[:, text_in.shape[1]:]
    text_logits = nn.dense(params["text_head"], text_span)
    mel_logits = nn.dense(params["mel_head"], mel_span)
    return text_logits, mel_logits, {"text_targets": text_tar, "mel_targets": mel_tar}


def mel_logits_from_hidden(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """lm_head = final_norm -> mel_head (reference `model_v2.py:53,447`).

    NOTE: the backbone's ln_f has already been applied inside gpt2_*; the HF
    inference model applies final_norm on top of transformer output (which
    itself ends with ln_f) — we match that exactly.
    """
    h = nn.layer_norm(params["final_norm"], hidden)
    return nn.dense(params["mel_head"], h)

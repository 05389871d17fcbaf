"""Wav2Vec2-BERT 2.0 encoder (facebook/w2v-bert-2.0) in JAX.

Conditioning feature extractor for IndexTTS2: the pipeline runs this over
16 kHz prompt audio and standardizes hidden layer 17 by precomputed mean/std
(`/root/reference/indextts/infer_v2.py:226-234`; model built by
`utils/maskgct/maskgct_utils.py:87-98` from HF Wav2Vec2BertModel).

Architecture (HF `modeling_wav2vec2_bert.py`, w2v-bert-2.0 defaults):
feature_projection(LayerNorm(160) + Linear 160->1024) -> 24 conformer layers
(half-step FFN1 -> self-attn with relative_key distance embeddings ->
causal-padded conv module -> half-step FFN2 -> final LayerNorm).

We return all hidden states up to the requested layer so `hidden_states[17]`
matches HF indexing (index 0 = projection output).
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu import nn
from indextts_tpu.config import W2VBertConfig
from indextts_tpu.nn import InitRng, Params


def init_w2vbert(rng: InitRng, cfg: W2VBertConfig) -> Params:
    D, I = cfg.hidden_size, cfg.intermediate_size
    num_pos = cfg.left_max_position_embeddings + cfg.right_max_position_embeddings + 1
    head = D // cfg.num_attention_heads

    def ffn():
        return {"intermediate_dense": nn.dense_init(rng, D, I),
                "output_dense": nn.dense_init(rng, I, D)}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append({
            "ffn1_layer_norm": nn.layer_norm_init(rng, D),
            "ffn1": ffn(),
            "self_attn_layer_norm": nn.layer_norm_init(rng, D),
            "attn": {
                "linear_q": nn.dense_init(rng, D, D),
                "linear_k": nn.dense_init(rng, D, D),
                "linear_v": nn.dense_init(rng, D, D),
                "linear_out": nn.dense_init(rng, D, D),
                "distance_embedding": nn.embedding_init(rng, num_pos, head),
            },
            "conv": {
                "layer_norm": nn.layer_norm_init(rng, D),
                "pointwise_conv1": nn.conv1d_init(rng, D, 2 * D, 1, bias=False),
                "depthwise_conv": nn.conv1d_init(rng, D, D,
                                                 cfg.conv_depthwise_kernel_size,
                                                 bias=False, groups=D),
                "depthwise_layer_norm": nn.layer_norm_init(rng, D),
                "pointwise_conv2": nn.conv1d_init(rng, D, D, 1, bias=False),
            },
            "ffn2_layer_norm": nn.layer_norm_init(rng, D),
            "ffn2": ffn(),
            "final_layer_norm": nn.layer_norm_init(rng, D),
        })
    return {
        "feature_projection": {
            "layer_norm": nn.layer_norm_init(rng, cfg.feature_projection_input_dim),
            "projection": nn.dense_init(rng, cfg.feature_projection_input_dim, D),
        },
        "layers": layers,
    }


def _ffn_half(fp: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = nn.dense(fp["intermediate_dense"], x)
    h = jax.nn.swish(h)  # hidden_act = "swish" for w2v-bert-2.0
    return nn.dense(fp["output_dense"], h)


def _rel_key_attention(ap: Params, cfg: W2VBertConfig, x: jnp.ndarray,
                       mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    B, T, D = x.shape
    H = cfg.num_attention_heads
    Dh = D // H
    q = nn.dense(ap["linear_q"], x).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    k = nn.dense(ap["linear_k"], x).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    v = nn.dense(ap["linear_v"], x).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(Dh)

    # relative_key distance embedding term
    pos_l = jnp.arange(T)[:, None]
    pos_r = jnp.arange(T)[None, :]
    dist = jnp.clip(pos_r - pos_l, -cfg.left_max_position_embeddings,
                    cfg.right_max_position_embeddings)
    pe = ap["distance_embedding"]["weight"].astype(x.dtype)[
        dist + cfg.left_max_position_embeddings]  # (T, T, Dh)
    rel = jnp.einsum("bhld,lrd->bhlr", q, pe, preferred_element_type=jnp.float32)
    scores = scores + rel / math.sqrt(Dh)

    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, jnp.float32(-1e9))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    return nn.dense(ap["linear_out"], out)


def _conv_module(cp: Params, cfg: W2VBertConfig, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    h = nn.layer_norm(cp["layer_norm"], x, cfg.layer_norm_eps)
    if mask is not None:
        h = jnp.where(mask[:, :, None], h, 0.0)
    h = nn.conv1d(cp["pointwise_conv1"], h, padding="VALID")
    h = nn.glu(h, axis=-1)
    # causal left padding (modeling_wav2vec2_bert: pad (k-1, 0))
    k = cfg.conv_depthwise_kernel_size
    h = jnp.pad(h, ((0, 0), (k - 1, 0), (0, 0)))
    h = nn.conv1d(cp["depthwise_conv"], h, padding="VALID", groups=h.shape[-1])
    h = nn.layer_norm(cp["depthwise_layer_norm"], h, cfg.layer_norm_eps)
    h = jax.nn.swish(h)
    return nn.conv1d(cp["pointwise_conv2"], h, padding="VALID")


def w2vbert_forward(params: Params, cfg: W2VBertConfig, features: jnp.ndarray,
                    lengths: Optional[jnp.ndarray] = None,
                    output_layer: Optional[int] = None) -> jnp.ndarray:
    """features: (B, T, 160) SeamlessM4T features -> hidden state of
    ``output_layer`` (default cfg.output_hidden_layer, HF indexing where 0 is
    the projection output). lengths: (B,) valid frames.
    """
    if output_layer is None:
        output_layer = cfg.output_hidden_layer
    fp = params["feature_projection"]
    h = nn.layer_norm(fp["layer_norm"], features, cfg.layer_norm_eps)
    h = nn.dense(fp["projection"], h)

    mask = None
    if lengths is not None:
        mask = nn.sequence_mask(lengths, h.shape[1])
        h = jnp.where(mask[:, :, None], h, 0.0)

    for li, lp in enumerate(params["layers"]):
        if li >= output_layer:
            break
        res = h
        t = nn.layer_norm(lp["ffn1_layer_norm"], h, cfg.layer_norm_eps)
        h = res + 0.5 * _ffn_half(lp["ffn1"], t)
        res = h
        t = nn.layer_norm(lp["self_attn_layer_norm"], h, cfg.layer_norm_eps)
        h = res + _rel_key_attention(lp["attn"], cfg, t, mask)
        res = h
        h = res + _conv_module(lp["conv"], cfg, h, mask)
        res = h
        t = nn.layer_norm(lp["ffn2_layer_norm"], h, cfg.layer_norm_eps)
        h = res + 0.5 * _ffn_half(lp["ffn2"], t)
        h = nn.layer_norm(lp["final_layer_norm"], h, cfg.layer_norm_eps)
    return h

"""RepCodec semantic codec: VQ-VAE over w2v-bert features.

Behavioral reference: `/root/reference/indextts/utils/maskgct/models/codec/
kmeans/repcodec_model.py` + `kmeans/vocos.py` (VocosBackbone of ConvNeXt
blocks) + `amphion_codec/quantize/{residual_vq,factorized_vector_quantize}.py`.

Inference surface used by the pipeline:
- ``quantize(features)`` -> (indices (B, T), quantized (B, T, hidden))
  (`infer_v2.py:454` for the speaker prompt)
- ``vq2emb(codes)`` -> (B, T, hidden) re-embedding of generated codes
  (`infer_v2.py:648`)

The shipped config uses num_quantizers=1 with a factorized (8-dim, L2
normalized) codebook of 8192 entries.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.config import SemanticCodecConfig
from indextts_tpu.nn import InitRng, Params


# ---------------------------------------------------------------------------
# Vocos ConvNeXt backbone
# ---------------------------------------------------------------------------

def init_vocos_backbone(rng: InitRng, input_ch: int, dim: int,
                        intermediate_dim: int, num_layers: int) -> Params:
    blocks = []
    for _ in range(num_layers):
        blocks.append({
            "dwconv": nn.conv1d_init(rng, dim, dim, 7, groups=dim),
            "norm": nn.layer_norm_init(rng, dim),
            "pwconv1": nn.dense_init(rng, dim, intermediate_dim, std=0.02),
            "pwconv2": nn.dense_init(rng, intermediate_dim, dim, std=0.02),
            "gamma": rng.ones((dim,)) * (1.0 / num_layers),
        })
    return {
        "embed": nn.conv1d_init(rng, input_ch, dim, 7),
        "norm": nn.layer_norm_init(rng, dim),
        "convnext": blocks,
        "final_layer_norm": nn.layer_norm_init(rng, dim),
    }


def vocos_backbone(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, C_in) -> (B, T, dim)."""
    x = nn.conv1d(p["embed"], x, padding=3)
    x = nn.layer_norm(p["norm"], x, eps=1e-6)
    for bp in p["convnext"]:
        res = x
        h = nn.conv1d(bp["dwconv"], x, padding=3, groups=x.shape[-1])
        h = nn.layer_norm(bp["norm"], h, eps=1e-6)
        h = nn.dense(bp["pwconv1"], h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.dense(bp["pwconv2"], h)
        h = h * bp["gamma"].astype(h.dtype)
        x = res + h
    return nn.layer_norm(p["final_layer_norm"], x, eps=1e-6)


# ---------------------------------------------------------------------------
# factorized VQ
# ---------------------------------------------------------------------------

def init_fvq(rng: InitRng, input_dim: int, codebook_size: int, codebook_dim: int) -> Params:
    p: Params = {"codebook": nn.embedding_init(rng, codebook_size, codebook_dim, std=1.0)}
    if input_dim != codebook_dim:
        # WNConv1d k=1 == dense; weight-norm folds at conversion
        p["in_project"] = nn.dense_init(rng, input_dim, codebook_dim)
        p["out_project"] = nn.dense_init(rng, codebook_dim, input_dim)
    return p


def _l2n(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), eps))


def fvq_quantize(p: Params, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """z: (B, T, D_in) -> (indices (B, T), z_q (B, T, D_in)).

    L2-normalized nearest-neighbor lookup in the factorized 8-dim space
    (`factorized_vector_quantize.py:104-121`), then out-projection.
    """
    z_e = nn.dense(p["in_project"], z) if "in_project" in p else z
    enc = _l2n(z_e.astype(jnp.float32))
    cb = _l2n(p["codebook"]["weight"].astype(jnp.float32))
    # cosine distance == L2 on normalized vectors; argmax of -dist == argmax dot
    dots = jnp.einsum("btd,kd->btk", enc, cb, preferred_element_type=jnp.float32)
    indices = jnp.argmax(dots, axis=-1).astype(jnp.int32)
    z_q = p["codebook"]["weight"].astype(z.dtype)[indices]
    if "out_project" in p:
        z_q = nn.dense(p["out_project"], z_q)
    return indices, z_q


def fvq_vq2emb(p: Params, codes: jnp.ndarray, out_proj: bool = True) -> jnp.ndarray:
    emb = p["codebook"]["weight"][codes]
    if out_proj and "out_project" in p:
        emb = nn.dense(p["out_project"], emb)
    return emb


# ---------------------------------------------------------------------------
# RepCodec
# ---------------------------------------------------------------------------

def init_repcodec(rng: InitRng, cfg: SemanticCodecConfig) -> Params:
    p: Params = {
        "encoder": init_vocos_backbone(rng, cfg.hidden_size, cfg.vocos_dim,
                                       cfg.vocos_intermediate_dim, cfg.vocos_num_layers),
        "encoder_out": nn.dense_init(rng, cfg.vocos_dim, cfg.hidden_size, std=0.02),
        "decoder": init_vocos_backbone(rng, cfg.hidden_size, cfg.vocos_dim,
                                       cfg.vocos_intermediate_dim, cfg.vocos_num_layers),
        "decoder_out": nn.dense_init(rng, cfg.vocos_dim, cfg.hidden_size, std=0.02),
        "quantizer": [init_fvq(rng, cfg.hidden_size, cfg.codebook_size, cfg.codebook_dim)
                      for _ in range(cfg.num_quantizers)],
    }
    if cfg.downsample_scale and cfg.downsample_scale > 1:
        p["down"] = nn.conv1d_init(rng, cfg.hidden_size, cfg.hidden_size, 3)
        p["up"] = nn.conv1d_init(rng, cfg.hidden_size, cfg.hidden_size, 3)
    return p


def repcodec_quantize(p: Params, cfg: SemanticCodecConfig,
                      x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (B, T, hidden) w2v-bert features -> (codes (B, T'), quantized (B, T', hidden)).

    Reference `repcodec_model.py:176-196` (single-quantizer path).
    """
    if "down" in p and cfg.downsample_scale > 1:
        x = nn.conv1d(p["down"], x, stride=2, padding=1)
        x = jax.nn.gelu(x, approximate=False)
    h = vocos_backbone(p["encoder"], x)
    h = nn.dense(p["encoder_out"], h)
    quantized = jnp.zeros_like(h)
    residual = h
    all_indices = []
    for q in p["quantizer"]:
        idx, z_q = fvq_quantize(q, residual)
        quantized = quantized + z_q
        residual = residual - z_q
        all_indices.append(idx)
    return all_indices[0] if len(all_indices) == 1 else jnp.stack(all_indices), quantized


def repcodec_vq2emb(p: Params, codes: jnp.ndarray) -> jnp.ndarray:
    """codes (B, T) (single quantizer) -> (B, T, hidden); `residual_vq.py:144-152`."""
    return fvq_vq2emb(p["quantizer"][0], codes.astype(jnp.int32))

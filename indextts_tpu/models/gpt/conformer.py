"""Wenet-style conformer encoder for speaker/emotion conditioning.

Behavioral reference: `/root/reference/indextts/gpt/conformer_encoder.py` and
`conformer/{attention,embedding,subsampling}.py`:

- input layer: 'linear' (LinearNoSubsampling) or 'conv2d2' (Conv2dSubsampling2)
- positional encoding: rel_pos — sinusoidal table, scaled input (x * sqrt(d)),
  *without* rel_shift (the reference removes it, `conformer/attention.py:305-307`)
- layer = MHA(rel-pos, with u/v biases) -> conv module (GLU + depthwise +
  LayerNorm + SiLU) -> FFN, each pre-norm with residual, final norm per block
  (macaron off, normalize_before on — the config the reference instantiates,
  `gpt/model_v2.py:352-376` -> `conformer_encoder.py:439-520`)
- encoder-level after_norm at the end.

TPU-first notes: the sinusoidal pos table is a trace-time constant; all paths
are (B, T, C) static-shape with boolean masks, so one compile per cond-length
bucket serves any prompt.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu import nn
from indextts_tpu.nn import InitRng, Params


@dataclass(frozen=True)
class ConformerDims:
    input_size: int = 1024
    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    input_layer: str = "conv2d2"
    cnn_module_kernel: int = 15

    @property
    def head_dim(self) -> int:
        return self.output_size // self.attention_heads


def sinusoidal_pos_table(max_len: int, d_model: int) -> np.ndarray:
    """Wenet PositionalEncoding table (reference `conformer/embedding.py:47-55`)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def init_conformer(rng: InitRng, d: ConformerDims) -> Params:
    D, H = d.output_size, d.attention_heads
    p: Params = {}
    if d.input_layer == "linear":
        p["embed"] = {
            "linear": nn.dense_init(rng, d.input_size, D),
            "norm": nn.layer_norm_init(rng, D),
        }
    elif d.input_layer == "conv2d2":
        f_out = (d.input_size - 1) // 2
        p["embed"] = {
            "conv": nn.conv2d_init(rng, 1, D, 3, 3),
            "out": nn.dense_init(rng, D * f_out, D),
        }
    elif d.input_layer == "conv2d":     # Conv2dSubsampling4 (wenet naming)
        f_out = ((d.input_size - 1) // 2 - 1) // 2
        p["embed"] = {
            "conv": nn.conv2d_init(rng, 1, D, 3, 3),
            "conv2": nn.conv2d_init(rng, D, D, 3, 3),
            "out": nn.dense_init(rng, D * f_out, D),
        }
    elif d.input_layer == "conv2d6":
        f_out = ((d.input_size - 1) // 2 - 2) // 3
        p["embed"] = {
            "conv": nn.conv2d_init(rng, 1, D, 3, 3),
            "conv2": nn.conv2d_init(rng, D, D, 5, 5),
            "out": nn.dense_init(rng, D * f_out, D),
        }
    elif d.input_layer == "conv2d8":
        f_out = (((d.input_size - 1) // 2 - 1) // 2 - 1) // 2
        p["embed"] = {
            "conv": nn.conv2d_init(rng, 1, D, 3, 3),
            "conv2": nn.conv2d_init(rng, D, D, 3, 3),
            "conv3": nn.conv2d_init(rng, D, D, 3, 3),
            "out": nn.dense_init(rng, D * f_out, D),
        }
    else:
        raise ValueError(f"unsupported conformer input_layer {d.input_layer!r}")

    blocks = []
    for _ in range(d.num_blocks):
        blocks.append({
            "norm_mha": nn.layer_norm_init(rng, D),
            "attn": {
                "linear_q": nn.dense_init(rng, D, D),
                "linear_k": nn.dense_init(rng, D, D),
                "linear_v": nn.dense_init(rng, D, D),
                "linear_out": nn.dense_init(rng, D, D),
                "linear_pos": nn.dense_init(rng, D, D, bias=False),
                "pos_bias_u": rng.xavier_uniform((H, d.head_dim)),
                "pos_bias_v": rng.xavier_uniform((H, d.head_dim)),
            },
            "norm_conv": nn.layer_norm_init(rng, D),
            "conv": {
                "pointwise_conv1": nn.conv1d_init(rng, D, 2 * D, 1),
                "depthwise_conv": nn.conv1d_init(rng, D, D, d.cnn_module_kernel, groups=D),
                "norm": nn.layer_norm_init(rng, D),
                "pointwise_conv2": nn.conv1d_init(rng, D, D, 1),
            },
            "norm_ff": nn.layer_norm_init(rng, D),
            "ff": {
                "w_1": nn.dense_init(rng, D, d.linear_units),
                "w_2": nn.dense_init(rng, d.linear_units, D),
            },
            "norm_final": nn.layer_norm_init(rng, D),
        })
    p["encoders"] = blocks
    p["after_norm"] = nn.layer_norm_init(rng, D)
    return p


def _rel_pos_mha(ap: Params, x: jnp.ndarray, pos_emb: jnp.ndarray,
                 mask: Optional[jnp.ndarray], d: ConformerDims) -> jnp.ndarray:
    """Transformer-XL style attention without rel_shift (wenet variant)."""
    B, T, D = x.shape
    H, Dh = d.attention_heads, d.head_dim
    q = nn.dense(ap["linear_q"], x).reshape(B, T, H, Dh)
    k = nn.dense(ap["linear_k"], x).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    v = nn.dense(ap["linear_v"], x).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    pe = nn.dense(ap["linear_pos"], pos_emb.astype(x.dtype))  # (1, T, D)
    pm = pe.reshape(1, -1, H, Dh).transpose(0, 2, 1, 3)       # (1, H, T, Dh)

    q_u = (q + ap["pos_bias_u"].astype(x.dtype)[None, None]).transpose(0, 2, 1, 3)
    q_v = (q + ap["pos_bias_v"].astype(x.dtype)[None, None]).transpose(0, 2, 1, 3)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k, preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, jnp.broadcast_to(pm, k.shape),
                    preferred_element_type=jnp.float32)
    scores = (ac + bd) / math.sqrt(Dh)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, jnp.float32(-jnp.inf))
    probs = jax.nn.softmax(scores, axis=-1)
    if mask is not None:
        probs = jnp.where(mask[:, None, None, :], probs, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    return nn.dense(ap["linear_out"], out)


def _conv_module(cp: Params, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 d: ConformerDims) -> jnp.ndarray:
    """Conformer conv module (reference `conformer_encoder.py:55-167`)."""
    if mask is not None:
        x = jnp.where(mask[:, :, None], x, 0.0)
    h = nn.conv1d(cp["pointwise_conv1"], x, padding="VALID")
    h = nn.glu(h, axis=-1)
    pad = (d.cnn_module_kernel - 1) // 2
    h = nn.conv1d(cp["depthwise_conv"], h, padding=pad, groups=h.shape[-1])
    h = nn.layer_norm(cp["norm"], h)
    h = jax.nn.silu(h)
    h = nn.conv1d(cp["pointwise_conv2"], h, padding="VALID")
    if mask is not None:
        h = jnp.where(mask[:, :, None], h, 0.0)
    return h


def conformer_encode(p: Params, d: ConformerDims, xs: jnp.ndarray,
                     xs_lens: jnp.ndarray,
                     pos_table: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """xs: (B, T, input_size), xs_lens: (B,) -> (out (B, T', D), mask (B, T')).

    T' = T for 'linear', (T-1)//2 for 'conv2d2' (mask strided as x[2::2]).
    """
    B, T, _ = xs.shape
    D = d.output_size
    mask = nn.sequence_mask(xs_lens, T)

    if d.input_layer == "linear":
        x = nn.dense(p["embed"]["linear"], xs)
        x = nn.layer_norm(p["embed"]["norm"], x)
    else:
        # Conv2dSubsampling{2,4,6,8}: stacked VALID Conv2d(3 or 5, stride 2/3)
        # over (B, T, F, 1) with ReLU between, flattened freq x channel ->
        # linear. Mask strides follow the reference exactly
        # (subsampling.py:132,186,242,293,348).
        h = nn.conv2d(p["embed"]["conv"], xs[..., None], stride=(2, 2),
                      padding="VALID")
        h = jax.nn.relu(h)  # (B, T', F', D)
        mask = mask[:, 2::2]
        if d.input_layer == "conv2d":
            h = jax.nn.relu(nn.conv2d(p["embed"]["conv2"], h, stride=(2, 2),
                                      padding="VALID"))
            mask = mask[:, 2::2]
        elif d.input_layer == "conv2d6":
            h = jax.nn.relu(nn.conv2d(p["embed"]["conv2"], h, stride=(3, 3),
                                      padding="VALID"))
            mask = mask[:, 4::3]
        elif d.input_layer == "conv2d8":
            h = jax.nn.relu(nn.conv2d(p["embed"]["conv2"], h, stride=(2, 2),
                                      padding="VALID"))
            h = jax.nn.relu(nn.conv2d(p["embed"]["conv3"], h, stride=(2, 2),
                                      padding="VALID"))
            mask = mask[:, 2::2][:, 2::2]
        Bh, Tp, Fp, _ = h.shape
        x = nn.dense(p["embed"]["out"],
                     h.transpose(0, 1, 3, 2).reshape(Bh, Tp, D * Fp))
        mask = mask[:, : x.shape[1]]

    Tp = x.shape[1]
    if pos_table is None:
        pos_table = jnp.asarray(sinusoidal_pos_table(Tp, D))
    pos_emb = pos_table[None, :Tp, :]
    x = x * math.sqrt(D)  # xscale (reference embedding.py:43,141)

    for bp in p["encoders"]:
        # MHA
        res = x
        h = nn.layer_norm(bp["norm_mha"], x)
        x = res + _rel_pos_mha(bp["attn"], h, pos_emb, mask, d)
        # conv module
        res = x
        h = nn.layer_norm(bp["norm_conv"], x)
        x = res + _conv_module(bp["conv"], h, mask, d)
        # FFN (SiLU)
        res = x
        h = nn.layer_norm(bp["norm_ff"], x)
        h = nn.dense(bp["ff"]["w_2"], jax.nn.silu(nn.dense(bp["ff"]["w_1"], h)))
        x = res + h
        x = nn.layer_norm(bp["norm_final"], x)

    x = nn.layer_norm(p["after_norm"], x)
    return x, mask

"""CAMPPlus D-TDNN speaker embedder (80-mel Kaldi fbank -> 192-d x-vector).

Behavioral reference: `/root/reference/indextts/s2mel/modules/campplus/`
(DTDNN.py + layers.py, 3D-Speaker). Inference-only: BatchNorm runs in eval
mode with stored running statistics (folded into scale/shift at conversion;
identity at random init).

Layout: activations are (B, T, C) throughout; the FCM 2-D front operates on
(B, F, T) images as (B, T(freq axis W), ...) — we keep (B, freq, time, ch)
NHWC with freq as H so torch's stride=(s,1) maps to stride=(s,1) on H.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.nn import InitRng, Params


# -- batchnorm (eval mode) ---------------------------------------------------

def bn_init(rng: InitRng, ch: int, affine: bool = True) -> Params:
    p = {"running_mean": rng.zeros((ch,)), "running_var": rng.ones((ch,))}
    if affine:
        p["weight"] = rng.ones((ch,))
        p["bias"] = rng.zeros((ch,))
    return p


def bn_apply(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    scale = jax.lax.rsqrt(p["running_var"].astype(jnp.float32) + eps)
    y = (x.astype(jnp.float32) - p["running_mean"]) * scale
    if "weight" in p:
        y = y * p["weight"] + p["bias"]
    return y.astype(x.dtype)


# -- FCM 2-D front -----------------------------------------------------------

def _res_block_init(rng: InitRng, in_planes: int, planes: int, stride: int) -> Params:
    p = {
        "conv1": nn.conv2d_init(rng, in_planes, planes, 3, 3, bias=False),
        "bn1": bn_init(rng, planes),
        "conv2": nn.conv2d_init(rng, planes, planes, 3, 3, bias=False),
        "bn2": bn_init(rng, planes),
    }
    if stride != 1 or in_planes != planes:
        p["shortcut_conv"] = nn.conv2d_init(rng, in_planes, planes, 1, 1, bias=False)
        p["shortcut_bn"] = bn_init(rng, planes)
    return p


def _res_block(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    h = nn.conv2d(p["conv1"], x, stride=(stride, 1), padding=((1, 1), (1, 1)))
    h = jax.nn.relu(bn_apply(p["bn1"], h))
    h = nn.conv2d(p["conv2"], h, stride=(1, 1), padding=((1, 1), (1, 1)))
    h = bn_apply(p["bn2"], h)
    if "shortcut_conv" in p:
        sc = nn.conv2d(p["shortcut_conv"], x, stride=(stride, 1), padding="VALID")
        sc = bn_apply(p["shortcut_bn"], sc)
    else:
        sc = x
    return jax.nn.relu(h + sc)


def init_campplus(rng: InitRng, feat_dim: int = 80, embedding_size: int = 192,
                  growth_rate: int = 32, bn_size: int = 4,
                  init_channels: int = 128) -> Params:
    m = 32
    p: Params = {
        "fcm": {
            "conv1": nn.conv2d_init(rng, 1, m, 3, 3, bias=False),
            "bn1": bn_init(rng, m),
            "layer1": [_res_block_init(rng, m, m, 2), _res_block_init(rng, m, m, 1)],
            "layer2": [_res_block_init(rng, m, m, 2), _res_block_init(rng, m, m, 1)],
            "conv2": nn.conv2d_init(rng, m, m, 3, 3, bias=False),
            "bn2": bn_init(rng, m),
        }
    }
    channels = m * (feat_dim // 8)
    p["tdnn"] = {
        "conv": nn.conv1d_init(rng, channels, init_channels, 5, bias=False),
        "bn": bn_init(rng, init_channels),
    }
    channels = init_channels
    blocks = []
    for num_layers, ksz, dil in zip((12, 24, 16), (3, 3, 3), (1, 2, 2)):
        layers = []
        for i in range(num_layers):
            in_ch = channels + i * growth_rate
            bn_ch = bn_size * growth_rate
            layers.append({
                "bn1": bn_init(rng, in_ch),
                "linear1": nn.conv1d_init(rng, in_ch, bn_ch, 1, bias=False),
                "bn2": bn_init(rng, bn_ch),
                "cam": {
                    "linear_local": nn.conv1d_init(rng, bn_ch, growth_rate, ksz, bias=False),
                    "linear1": nn.conv1d_init(rng, bn_ch, bn_ch // 2, 1),
                    "linear2": nn.conv1d_init(rng, bn_ch // 2, growth_rate, 1),
                },
            })
        channels += num_layers * growth_rate
        transit = {"bn": bn_init(rng, channels),
                   "linear": nn.conv1d_init(rng, channels, channels // 2, 1, bias=False)}
        channels //= 2
        blocks.append({"layers": layers, "transit": transit})
    p["blocks"] = blocks
    p["out_bn"] = bn_init(rng, channels)
    p["dense"] = {"linear": nn.conv1d_init(rng, channels * 2, embedding_size, 1, bias=False),
                  "bn": bn_init(rng, embedding_size, affine=False)}
    return p


def _cam_layer(cp: Params, x: jnp.ndarray, ksz: int, dil: int,
               n_frames: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Context-aware mask layer (reference `layers.py:72-114`). x: (B, T, C)."""
    pad = (ksz - 1) // 2 * dil
    y = nn.conv1d(cp["linear_local"], x, padding=pad, dilation=dil)
    # global context: mean over time + segment (100-frame) average pooling
    if n_frames is None:
        gmean = jnp.mean(x, axis=1, keepdims=True)
    else:
        m = nn.sequence_mask(n_frames, x.shape[1]).astype(x.dtype)[:, :, None]
        gmean = jnp.sum(x * m, axis=1, keepdims=True) / jnp.maximum(
            jnp.sum(m, axis=1, keepdims=True), 1.0)
    seg_len = 100
    T = x.shape[1]
    n_seg = -(-T // seg_len)
    xp = jnp.pad(x, ((0, 0), (0, n_seg * seg_len - T), (0, 0)))
    seg_sum = jnp.sum(xp.reshape(x.shape[0], n_seg, seg_len, -1), axis=2)
    # torch avg_pool1d(ceil_mode=True, padding=0) divides the clipped tail
    # window by its true size, not seg_len
    seg_cnt = jnp.minimum(seg_len, T - jnp.arange(n_seg) * seg_len).astype(x.dtype)
    seg = seg_sum / seg_cnt[None, :, None]
    seg = jnp.repeat(seg, seg_len, axis=1)[:, :T]
    context = gmean + seg
    h = jax.nn.relu(nn.conv1d(cp["linear1"], context, padding="VALID"))
    mgate = jax.nn.sigmoid(nn.conv1d(cp["linear2"], h, padding="VALID"))
    return y * mgate


def campplus_forward(p: Params, feats: jnp.ndarray,
                     n_frames: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """feats: (B, T, 80) mean-normalized Kaldi fbank -> (B, 192) x-vector.

    NOTE: torch avg_pool1d(ceil_mode=True) averages a short final segment over
    its true size; with padded buckets the tail segment statistics differ
    slightly — campplus embeddings are used for style lookup (cosine argmax),
    robust to this. Exact-length inputs match exactly.
    """
    # FCM: (B, T, F) -> NHWC (B, F, T, 1)
    x = feats.transpose(0, 2, 1)[..., None]
    f = p["fcm"]
    h = nn.conv2d(f["conv1"], x, padding=((1, 1), (1, 1)))
    h = jax.nn.relu(bn_apply(f["bn1"], h))
    for i, bp in enumerate(f["layer1"]):
        h = _res_block(bp, h, 2 if i == 0 else 1)
    for i, bp in enumerate(f["layer2"]):
        h = _res_block(bp, h, 2 if i == 0 else 1)
    h = nn.conv2d(f["conv2"], h, stride=(2, 1), padding=((1, 1), (1, 1)))
    h = jax.nn.relu(bn_apply(f["bn2"], h))
    # (B, F/8, T, 32) -> (B, T, 32 * F/8); torch reshape stacks (C, F) per time
    B, F8, T, C = h.shape
    x = h.transpose(0, 2, 3, 1).reshape(B, T, C * F8)

    # TDNN stem: k=5, stride 2, padding 2
    x = nn.conv1d(p["tdnn"]["conv"], x, stride=2, padding=2)
    x = jax.nn.relu(bn_apply(p["tdnn"]["bn"], x))
    if n_frames is not None:
        n_frames = (n_frames + 2 * 2 - 5) // 2 + 1

    # static block metadata (kernel, dilation) — kept out of the params pytree
    # so jit doesn't trace them
    block_meta = ((3, 1), (3, 2), (3, 2))
    for blk, (ksz, dil) in zip(p["blocks"], block_meta):
        for lp in blk["layers"]:
            h = jax.nn.relu(bn_apply(lp["bn1"], x))
            h = nn.conv1d(lp["linear1"], h, padding="VALID")
            h = jax.nn.relu(bn_apply(lp["bn2"], h))
            h = _cam_layer(lp["cam"], h, ksz, dil, n_frames)
            x = jnp.concatenate([x, h], axis=-1)
        x = jax.nn.relu(bn_apply(blk["transit"]["bn"], x))
        x = nn.conv1d(blk["transit"]["linear"], x, padding="VALID")

    x = jax.nn.relu(bn_apply(p["out_bn"], x))

    # stats pooling (unbiased std, eps via torch.std semantics)
    if n_frames is None:
        mean = jnp.mean(x, axis=1)
        var = jnp.sum(jnp.square(x - mean[:, None, :]), axis=1) / jnp.maximum(x.shape[1] - 1, 1)
    else:
        m = nn.sequence_mask(n_frames, x.shape[1]).astype(jnp.float32)[:, :, None]
        cnt = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        mean = jnp.sum(x * m, axis=1) / cnt
        var = jnp.sum(jnp.square(x - mean[:, None, :]) * m, axis=1) / jnp.maximum(cnt - 1.0, 1.0)
    stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)[:, None, :]  # (B, 1, 2C)

    out = nn.conv1d(p["dense"]["linear"], stats, padding="VALID")
    out = bn_apply(p["dense"]["bn"], out)
    return out[:, 0, :]

"""ECAPA-TDNN speaker encoder (v1 vocoder conditioning).

Behavioral reference: `/root/reference/indextts/BigVGAN/ECAPA_TDNN.py`
(speechbrain-derived, 656 LoC) + `BigVGAN/nnet/{CNN,normalization}.py`:
channels (512,512,512,512,1536), kernels (5,3,3,3,1), dilations (1,2,3,4,1),
res2net scale 8, SE blocks, attentive statistics pooling with global context,
BatchNorm eval mode, convs use symmetric *reflect* 'same' padding.

All activations (B, T, C); masked variants keep static length buckets faithful
to exact-length semantics (reference is called with lengths=None at inference,
`BigVGAN/models.py:201-205`, on exact-length prompt mels).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.models.s2mel.campplus import bn_apply, bn_init
from indextts_tpu.nn import InitRng, Params

CHANNELS = (512, 512, 512, 512, 1536)
KERNELS = (5, 3, 3, 3, 1)
DILATIONS = (1, 2, 3, 4, 1)
RES2NET_SCALE = 8
SE_CHANNELS = 128
ATT_CHANNELS = 128


def _same_reflect_conv(p: Params, x: jnp.ndarray, k: int, d: int,
                       lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """speechbrain Conv1d(padding='same', padding_mode='reflect')."""
    if k == 1:
        return nn.conv1d(p, x, padding="VALID")
    pad = (d * (k - 1)) // 2
    if lengths is None:
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    else:
        xp = nn.masked_reflect_pad(x, lengths, pad, pad)
    return nn.conv1d(p, xp, padding="VALID", dilation=d)


def _tdnn_init(rng: InitRng, in_ch: int, out_ch: int, k: int) -> Params:
    return {"conv": nn.conv1d_init(rng, in_ch, out_ch, k), "bn": bn_init(rng, out_ch)}


def _tdnn(p: Params, x: jnp.ndarray, k: int, d: int,
          lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    h = _same_reflect_conv(p["conv"], x, k, d, lengths)
    return bn_apply(p["bn"], jax.nn.relu(h))


def init_ecapa(rng: InitRng, input_size: int = 100, lin_neurons: int = 512) -> Params:
    p: Params = {"block0": _tdnn_init(rng, input_size, CHANNELS[0], KERNELS[0])}
    blocks = []
    for i in range(1, len(CHANNELS) - 1):
        in_ch, out_ch = CHANNELS[i - 1], CHANNELS[i]
        scale_ch = out_ch // RES2NET_SCALE
        blocks.append({
            "tdnn1": _tdnn_init(rng, in_ch, out_ch, 1),
            "res2net": [_tdnn_init(rng, scale_ch, scale_ch, KERNELS[i])
                        for _ in range(RES2NET_SCALE - 1)],
            "tdnn2": _tdnn_init(rng, out_ch, out_ch, 1),
            "se": {"conv1": nn.conv1d_init(rng, out_ch, SE_CHANNELS, 1),
                   "conv2": nn.conv1d_init(rng, SE_CHANNELS, out_ch, 1)},
        })
    p["blocks"] = blocks
    p["mfa"] = _tdnn_init(rng, CHANNELS[-2] * (len(CHANNELS) - 2), CHANNELS[-1],
                          KERNELS[-1])
    p["asp"] = {
        "tdnn": _tdnn_init(rng, CHANNELS[-1] * 3, ATT_CHANNELS, 1),
        "conv": nn.conv1d_init(rng, ATT_CHANNELS, CHANNELS[-1], 1),
    }
    p["asp_bn"] = bn_init(rng, CHANNELS[-1] * 2)
    p["fc"] = nn.conv1d_init(rng, CHANNELS[-1] * 2, lin_neurons, 1)
    return p


def _masked_mean(x, mask):
    if mask is None:
        return jnp.mean(x, axis=1, keepdims=True)
    m = mask.astype(x.dtype)[:, :, None]
    return jnp.sum(x * m, axis=1, keepdims=True) / jnp.maximum(
        jnp.sum(m, axis=1, keepdims=True), 1.0)


def ecapa_forward(p: Params, x: jnp.ndarray,
                  lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (B, T, input_size) mel -> (B, 1, lin_neurons) speaker embedding."""
    mask = None
    if lengths is not None:
        mask = nn.sequence_mask(lengths, x.shape[1])
        x = jnp.where(mask[:, :, None], x, 0.0)

    h = _tdnn(p["block0"], x, KERNELS[0], DILATIONS[0], lengths)
    feats: List[jnp.ndarray] = []
    for i, bp in enumerate(p["blocks"], start=1):
        res = h
        t = _tdnn(bp["tdnn1"], h, 1, 1, lengths)
        # res2net: chunk on channels, cascade TDNNs (reference `ECAPA_TDNN.py:179-193`)
        chunks = jnp.split(t, RES2NET_SCALE, axis=-1)
        ys = [chunks[0]]
        y_prev = None
        for j in range(1, RES2NET_SCALE):
            inp = chunks[j] if j == 1 else chunks[j] + y_prev
            y_prev = _tdnn(bp["res2net"][j - 1], inp, KERNELS[i], DILATIONS[i],
                           lengths)
            ys.append(y_prev)
        t = jnp.concatenate(ys, axis=-1)
        t = _tdnn(bp["tdnn2"], t, 1, 1, lengths)
        # SE block
        s = _masked_mean(t, mask)
        s = jax.nn.relu(nn.conv1d(bp["se"]["conv1"], s, padding="VALID"))
        s = jax.nn.sigmoid(nn.conv1d(bp["se"]["conv2"], s, padding="VALID"))
        h = t * s + res
        feats.append(h)

    h = jnp.concatenate(feats, axis=-1)
    h = _tdnn(p["mfa"], h, KERNELS[-1], DILATIONS[-1], lengths)

    # attentive statistics pooling with global context
    eps = 1e-12
    if mask is None:
        m = jnp.ones(h.shape[:2], h.dtype)[:, :, None]
    else:
        m = mask.astype(h.dtype)[:, :, None]
    total = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    gmean = jnp.sum(h * m / total, axis=1, keepdims=True)
    gstd = jnp.sqrt(jnp.clip(
        jnp.sum(m / total * jnp.square(h - gmean), axis=1, keepdims=True), eps))
    T = h.shape[1]
    attn_in = jnp.concatenate(
        [h, jnp.broadcast_to(gmean, h.shape), jnp.broadcast_to(gstd, h.shape)],
        axis=-1)
    a = _tdnn(p["asp"]["tdnn"], attn_in, 1, 1, lengths)
    a = nn.conv1d(p["asp"]["conv"], jnp.tanh(a), padding="VALID")
    if mask is not None:
        a = jnp.where(mask[:, :, None], a, -jnp.inf)
    w = jax.nn.softmax(a.astype(jnp.float32), axis=1).astype(h.dtype)
    mean = jnp.sum(w * h, axis=1, keepdims=True)
    std = jnp.sqrt(jnp.clip(
        jnp.sum(w * jnp.square(h - mean), axis=1, keepdims=True), eps))
    pooled = jnp.concatenate([mean, std], axis=-1)  # (B, 1, 2C)
    pooled = bn_apply(p["asp_bn"], pooled)
    return nn.conv1d(p["fc"], pooled, padding="VALID")  # (B, 1, lin)

"""DiscreteVAE (DVAE) — origin of the 8192-entry mel-token vocabulary.

Behavioral reference: `/root/reference/indextts/vqvae/xtts_dvae.py` (395 LoC).
Debug-only in the reference (commented out of the v1 loader, `infer.py:67-79`)
but kept as the authority on mel-token semantics (silence token 52 etc.).
Implemented 1-D (positional_dims=1) for mel inputs: strided conv encoder ->
EMA codebook nearest-neighbor quantization -> transposed-conv decoder.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu import nn
from indextts_tpu.nn import InitRng, Params
from indextts_tpu.ops.mel import mel_filterbank
from indextts_tpu.ops.stft import hann_window, stft_magnitude


def dvae_wav_to_mel(wav: jnp.ndarray, mel_norms: Optional[jnp.ndarray] = None
                    ) -> jnp.ndarray:
    """22.05 kHz power-mel for DVAE tokenization (reference `xtts_dvae.py:27-48`):
    torchaudio MelSpectrogram(power=2, f_max 8000, slaney norm, htk scale),
    log-clamped, divided by per-bin norms."""
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0, scale="htk", norm="slaney")
    win = hann_window(1024)
    mag = stft_magnitude(wav, jnp.asarray(win), n_fft=1024, hop=256,
                         win_length=1024, center=True, pad_mode="reflect")
    mel = jnp.einsum("mf,bft->bmt", jnp.asarray(fb), mag ** 2)
    mel = jnp.log(jnp.clip(mel, min=1e-5))
    if mel_norms is not None:
        mel = mel / mel_norms[None, :, None]
    return mel


def init_dvae(rng: InitRng, num_tokens: int = 8192, codebook_dim: int = 512,
              num_layers: int = 2, hidden_dim: int = 512, channels: int = 80,
              stride: int = 2, kernel_size: int = 4,
              num_resnet_blocks: int = 3) -> Params:
    enc_chans = [hidden_dim * 2 ** i for i in range(num_layers)]
    dec_chans = list(reversed(enc_chans))
    enc_io = list(zip([channels] + enc_chans, enc_chans))
    dec_init = dec_chans[0] if num_resnet_blocks > 0 else codebook_dim
    dec_io = list(zip([dec_init] + dec_chans, dec_chans))
    p: Params = {
        "enc_convs": [nn.conv1d_init(rng, i, o, kernel_size) for i, o in enc_io],
        "dec_convs": [{"kernel": rng.normal((kernel_size, i, o), std=0.02),
                       "bias": rng.zeros((o,))} for i, o in dec_io],
        "enc_res": [
            {"c1": nn.conv1d_init(rng, enc_chans[-1], enc_chans[-1], 3),
             "c2": nn.conv1d_init(rng, enc_chans[-1], enc_chans[-1], 3),
             "c3": nn.conv1d_init(rng, enc_chans[-1], enc_chans[-1], 1)}
            for _ in range(num_resnet_blocks)],
        "dec_res": [
            {"c1": nn.conv1d_init(rng, dec_init, dec_init, 3),
             "c2": nn.conv1d_init(rng, dec_init, dec_init, 3),
             "c3": nn.conv1d_init(rng, dec_init, dec_init, 1)}
            for _ in range(num_resnet_blocks)],
        "enc_out": nn.conv1d_init(rng, enc_chans[-1], codebook_dim, 1),
        "dec_out": nn.conv1d_init(rng, dec_chans[-1], channels, 1),
        "codebook": {"embed": rng.normal((codebook_dim, num_tokens), std=1.0)},
    }
    if num_resnet_blocks > 0:
        p["dec_in"] = nn.conv1d_init(rng, codebook_dim, dec_init, 1)
    return p


def _res_block(bp: Params, x: jnp.ndarray) -> jnp.ndarray:
    """ResBlock (reference `xtts_dvae.py:171-184`):
    conv3-act-conv3-act-conv1, + residual (no activation after the sum)."""
    h = jax.nn.relu(nn.conv1d(bp["c1"], x, padding=1))
    h = jax.nn.relu(nn.conv1d(bp["c2"], h, padding=1))
    h = nn.conv1d(bp["c3"], h, padding="VALID")
    return h + x


def dvae_encode(p: Params, mel: jnp.ndarray, kernel_size: int = 4,
                stride: int = 2) -> jnp.ndarray:
    """(B, T, 80) normalized mel -> (B, T', codebook_dim) logits."""
    x = mel
    pad = (kernel_size - 1) // 2
    for cp in p["enc_convs"]:
        x = jax.nn.relu(nn.conv1d(cp, x, stride=stride, padding=pad))
    for bp in p["enc_res"]:
        x = _res_block(bp, x)
    return nn.conv1d(p["enc_out"], x, padding="VALID")


def dvae_codebook_indices(p: Params, mel: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 80) -> (B, T') code ids (nearest neighbor in the EMA codebook,
    reference Quantize.forward `xtts_dvae.py:71-127`)."""
    logits = dvae_encode(p, mel)
    embed = p["codebook"]["embed"].astype(jnp.float32)  # (dim, n)
    flat = logits.astype(jnp.float32)
    dist = (jnp.sum(flat ** 2, axis=-1, keepdims=True)
            - 2 * jnp.einsum("btd,dn->btn", flat, embed)
            + jnp.sum(embed ** 2, axis=0)[None, None, :])
    return jnp.argmax(-dist, axis=-1).astype(jnp.int32)


def dvae_decode(p: Params, codes: jnp.ndarray, kernel_size: int = 4,
                stride: int = 2) -> jnp.ndarray:
    """(B, T') codes -> (B, T, 80) reconstructed mel."""
    embed = p["codebook"]["embed"]  # (dim, n)
    x = embed.T[codes]  # (B, T', dim)
    if "dec_in" in p:
        x = nn.conv1d(p["dec_in"], x, padding="VALID")
    for bp in p["dec_res"]:
        x = _res_block(bp, x)
    pad = (kernel_size - 1) // 2
    for cp in p["dec_convs"]:
        x = jax.nn.relu(nn.conv_transpose1d(cp, x, stride=stride, padding=pad))
    return nn.conv1d(p["dec_out"], x, padding="VALID")

"""Golden-parity: JAX BigVGAN-v2 + anti-alias ops vs the torch reference."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
import reference_shim

reference_shim.install()

import jax.numpy as jnp

from indextts_tpu.config import BigVGANConfig
from indextts_tpu.models.vocoder.bigvgan import bigvgan_forward, init_bigvgan
from indextts_tpu.ops.snake import (antialias_activation, downsample2,
                                    kaiser_sinc_filter1d, snake_beta, upsample2)
from indextts_tpu.utils import convert

torch.manual_seed(0)


def test_kaiser_filter_matches_torch():
    from indextts.s2mel.modules.bigvgan.alias_free_activation.torch.filter import (
        kaiser_sinc_filter1d as ref_filter)

    for cutoff, hw, ks in ((0.25, 0.3, 12), (0.5, 0.6, 12), (0.125, 0.15, 24)):
        ours = kaiser_sinc_filter1d(cutoff, hw, ks)
        theirs = ref_filter(cutoff, hw, ks).numpy().reshape(-1)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_up_down_sample_match_torch(rng):
    from indextts.s2mel.modules.bigvgan.alias_free_activation.torch.resample import (
        DownSample1d, UpSample1d)

    B, C, T = 2, 3, 50
    x = rng.standard_normal((B, C, T)).astype(np.float32)
    up_ref = UpSample1d(2)(torch.tensor(x)).numpy()
    down_ref = DownSample1d(2)(torch.tensor(x)).numpy()

    xj = jnp.asarray(x.transpose(0, 2, 1))
    up = np.asarray(upsample2(xj)).transpose(0, 2, 1)
    down = np.asarray(downsample2(xj)).transpose(0, 2, 1)
    assert up.shape == up_ref.shape
    assert down.shape == down_ref.shape
    np.testing.assert_allclose(up, up_ref, atol=1e-5)
    np.testing.assert_allclose(down, down_ref, atol=1e-5)


def test_antialias_activation_matches_torch(rng):
    from indextts.s2mel.modules.bigvgan.activations import SnakeBeta
    from indextts.s2mel.modules.bigvgan.alias_free_activation.torch.act import (
        Activation1d)

    C = 4
    act = SnakeBeta(C, alpha_logscale=True)
    with torch.no_grad():
        act.alpha.uniform_(-1, 1)
        act.beta.uniform_(-1, 1)
    a1 = Activation1d(activation=act)

    x = rng.standard_normal((1, C, 40)).astype(np.float32) * 2
    ref = a1(torch.tensor(x)).detach().numpy()
    out = antialias_activation(jnp.asarray(x.transpose(0, 2, 1)),
                               jnp.asarray(act.alpha.detach().numpy()),
                               jnp.asarray(act.beta.detach().numpy()))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=1e-5, rtol=1e-4)


TINY_H = BigVGANConfig(
    num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=16, resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)), activation="snakebeta",
    snake_logscale=True, use_tanh_at_final=False, use_bias_at_final=False)


def _ref_bigvgan(h: BigVGANConfig):
    from indextts.s2mel.modules.bigvgan.bigvgan import BigVGAN
    from indextts.s2mel.modules.bigvgan.env import AttrDict

    cfg = AttrDict({
        "num_mels": h.num_mels, "upsample_rates": list(h.upsample_rates),
        "upsample_kernel_sizes": list(h.upsample_kernel_sizes),
        "upsample_initial_channel": h.upsample_initial_channel,
        "resblock": "1", "resblock_kernel_sizes": list(h.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(d) for d in h.resblock_dilation_sizes],
        "activation": h.activation, "snake_logscale": h.snake_logscale,
        "use_tanh_at_final": h.use_tanh_at_final,
        "use_bias_at_final": h.use_bias_at_final,
    })
    m = BigVGAN(cfg, use_cuda_kernel=False).eval()
    # randomize snake params so the fold is exercised
    with torch.no_grad():
        for name, prm in m.named_parameters():
            if name.endswith("alpha") or name.endswith("beta"):
                prm.uniform_(-0.5, 0.5)
    return m


@pytest.mark.slow
def test_bigvgan_parity(rng):
    h = TINY_H
    ref = _ref_bigvgan(h)
    sd = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}
    params = convert.convert_bigvgan(sd, h)

    T = 23
    mel = rng.standard_normal((1, h.num_mels, T)).astype(np.float32)
    with torch.no_grad():
        wav_ref = ref(torch.tensor(mel)).numpy()[:, 0, :]
    wav = np.asarray(bigvgan_forward(params, h, jnp.asarray(mel.transpose(0, 2, 1))))
    assert wav.shape == wav_ref.shape
    np.testing.assert_allclose(wav, wav_ref, atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_bigvgan_parity_bucketed(rng):
    """A padded length bucket must reproduce the exact-length wav."""
    h = TINY_H
    ref = _ref_bigvgan(h)
    sd = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}
    params = convert.convert_bigvgan(sd, h)

    T, T_buf = 23, 32
    total_up = h.total_upsample
    mel = rng.standard_normal((1, h.num_mels, T)).astype(np.float32)
    with torch.no_grad():
        wav_ref = ref(torch.tensor(mel)).numpy()[:, 0, :]
    mel_pad = np.pad(mel, ((0, 0), (0, 0), (0, T_buf - T)))
    wav = np.asarray(bigvgan_forward(params, h,
                                     jnp.asarray(mel_pad.transpose(0, 2, 1)),
                                     mel_lens=jnp.asarray([T])))
    np.testing.assert_allclose(wav[:, : T * total_up], wav_ref, atol=1e-4, rtol=1e-3)
    assert np.abs(wav[:, T * total_up:]).max() == 0.0

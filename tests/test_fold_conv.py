"""fold_conv1d == nn.conv1d on every (k, d, f) combination BigVGAN uses."""

import numpy as np
import pytest

import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.nn import InitRng
from indextts_tpu.ops.fold_conv import fold_conv1d, fold_factor


@pytest.mark.parametrize("k,d,C,Cout,f", [
    (11, 1, 24, 24, 16), (11, 3, 24, 24, 16), (11, 5, 24, 24, 16),
    (7, 1, 48, 48, 8), (7, 3, 48, 48, 8), (7, 5, 48, 48, 8),
    (3, 1, 96, 96, 4), (3, 5, 96, 96, 4),
    (11, 1, 192, 192, 2), (7, 1, 24, 48, 16),
])
def test_fold_conv_matches_conv1d(k, d, C, Cout, f):
    rng = InitRng(0)
    p = nn.conv1d_init(rng, C, Cout, k)
    r = np.random.default_rng(1)
    B, T = 2, 160
    x = jnp.asarray(r.standard_normal((B, T, C)), jnp.float32)
    pad = (k * d - d) // 2
    ref = np.asarray(nn.conv1d(p, x, padding=pad, dilation=d))
    got = np.asarray(fold_conv1d(p, x, f, dilation=d, padding=pad))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_bigvgan_folded_matches_plain(monkeypatch):
    """Whole tiny vocoder with forced folding == the plain conv path."""
    from indextts_tpu.config import BigVGANConfig
    from indextts_tpu.models.vocoder.bigvgan import bigvgan_forward, init_bigvgan

    h = BigVGANConfig(num_mels=8, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                      upsample_initial_channel=48, resblock_kernel_sizes=(3, 7),
                      resblock_dilation_sizes=((1, 3), (1, 3)))
    params = init_bigvgan(InitRng(2), h)
    r = np.random.default_rng(3)
    mel = jnp.asarray(r.standard_normal((2, 32, 8)), jnp.float32)
    lens = jnp.asarray([32, 20], jnp.int32)
    monkeypatch.setenv("INDEXTTS_FOLDED_CONV", "0")
    ref = np.asarray(bigvgan_forward(params, h, mel, lens))
    monkeypatch.setenv("INDEXTTS_FOLDED_CONV", "force")
    got = np.asarray(bigvgan_forward(params, h, mel, lens))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_fold_factor():
    assert fold_factor(24, 256) == 16
    assert fold_factor(48, 256) == 8
    assert fold_factor(96, 256) == 4
    assert fold_factor(192, 256) == 2
    assert fold_factor(768, 256) == 1
    assert fold_factor(24, 8) == 8  # bounded by divisibility


def test_bigvgan_grouped_mrf_matches_plain(monkeypatch):
    """Grouped-MRF stages (3 resblocks in lockstep on stacked lanes, zero-
    padded 3/7/11 kernels in one feature_group conv) == per-resblock path."""
    from indextts_tpu.config import BigVGANConfig
    from indextts_tpu.models.vocoder.bigvgan import (bigvgan_forward,
                                                     init_bigvgan)

    h = BigVGANConfig(num_mels=8, upsample_rates=(4, 4),
                      upsample_kernel_sizes=(8, 8),
                      upsample_initial_channel=96,
                      resblock_kernel_sizes=(3, 7, 11),
                      resblock_dilation_sizes=((1, 3, 5),) * 3)
    params = init_bigvgan(InitRng(5), h)
    r = np.random.default_rng(7)
    mel = jnp.asarray(r.standard_normal((2, 32, 8)), jnp.float32)
    lens = jnp.asarray([32, 20], jnp.int32)
    monkeypatch.setenv("INDEXTTS_GROUPED_MRF", "0")
    ref = np.asarray(bigvgan_forward(params, h, mel, lens))
    monkeypatch.setenv("INDEXTTS_GROUPED_MRF", "force")
    got = np.asarray(bigvgan_forward(params, h, mel, lens))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

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
    (7, 3, 384, 384, 1), (11, 5, 768, 768, 1),
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


@pytest.mark.parametrize("k,d,C,f", [(11, 5, 24, 16), (7, 3, 48, 8),
                                     (3, 1, 96, 4)])
def test_fold_conv_prefolded_matches(k, d, C, f):
    """Stage-carried form: folded in, folded out, no repack."""
    from indextts_tpu.ops.fold_conv import fold_conv1d_prefolded

    rng = InitRng(5)
    p = nn.conv1d_init(rng, C, C, k)
    r = np.random.default_rng(6)
    B, T = 2, 160
    x = jnp.asarray(r.standard_normal((B, T, C)), jnp.float32)
    pad = (k * d - d) // 2
    ref = np.asarray(nn.conv1d(p, x, padding=pad, dilation=d))
    got = np.asarray(fold_conv1d_prefolded(
        p, x.reshape(B, T // f, f * C), f, C, dilation=d, padding=pad))
    np.testing.assert_allclose(got.reshape(B, T, C), ref, atol=1e-4,
                               rtol=1e-4)


def test_bigvgan_stage_folded_matches_plain(monkeypatch):
    """Whole tiny vocoder with stage-carried folded MRF == the plain path.

    upsample_initial_channel=384 puts the two stages at C=192 (f=2) and
    C=96 (f=4); varlen rows exercise the folded masks and the prefolded
    anti-alias edge handling."""
    from indextts_tpu.config import BigVGANConfig
    from indextts_tpu.models.vocoder.bigvgan import (bigvgan_forward,
                                                     init_bigvgan)

    h = BigVGANConfig(num_mels=8, upsample_rates=(4, 4),
                      upsample_kernel_sizes=(8, 8),
                      upsample_initial_channel=384,
                      resblock_kernel_sizes=(3, 7),
                      resblock_dilation_sizes=((1, 3), (1, 3)))
    params = init_bigvgan(InitRng(7), h)
    r = np.random.default_rng(8)
    mel = jnp.asarray(r.standard_normal((2, 32, 8)), jnp.float32)
    lens = jnp.asarray([32, 20], jnp.int32)
    monkeypatch.setenv("INDEXTTS_STAGE_FOLDED", "0")
    ref = np.asarray(bigvgan_forward(params, h, mel, lens))
    monkeypatch.setenv("INDEXTTS_STAGE_FOLDED", "force")
    got = np.asarray(bigvgan_forward(params, h, mel, lens))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_amp_stage_folded_interpret_kernel():
    """_amp_stage_folded with the Pallas prefolded AA kernel (interpret) ==
    plain mean-of-resblocks — the exact device configuration."""
    from indextts_tpu.config import BigVGANConfig
    from indextts_tpu.models.vocoder.bigvgan import (_amp_block,
                                                     _amp_stage_folded)

    h = BigVGANConfig(num_mels=8, upsample_rates=(4,),
                      upsample_kernel_sizes=(8,),
                      upsample_initial_channel=96,
                      resblock_kernel_sizes=(3, 7),
                      resblock_dilation_sizes=((1, 3), (1, 3)))
    rng = InitRng(9)
    C = 48
    blocks = []
    for ks, dils in zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes):
        blocks.append({
            "convs1": [nn.conv1d_init(rng, C, C, ks) for _ in dils],
            "convs2": [nn.conv1d_init(rng, C, C, ks) for _ in dils],
            "acts": [{"alpha": rng.normal((C,), std=0.2),
                      "beta": rng.normal((C,), std=0.2)}
                     for _ in range(2 * len(dils))],
        })
    r = np.random.default_rng(10)
    B, T = 2, 128   # f = 8, R = 16 -> r_tile 16
    x = jnp.asarray(r.standard_normal((B, T, C)), jnp.float32)
    lens = jnp.asarray([128, 77], jnp.int32)
    ref = None
    for bp, ks, dils in zip(blocks, h.resblock_kernel_sizes,
                            h.resblock_dilation_sizes):
        rb = _amp_block(bp, h, x, ks, dils, lens)
        ref = rb if ref is None else ref + rb
    ref = np.asarray(ref / len(blocks))
    got = np.asarray(_amp_stage_folded(blocks, h, x, lens, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_bigvgan_matmul_conv_matches_plain(monkeypatch):
    """Wide-stage shifted-matmul convs (INDEXTTS_MATMUL_CONV) == plain."""
    from indextts_tpu.config import BigVGANConfig
    from indextts_tpu.models.vocoder.bigvgan import (bigvgan_forward,
                                                     init_bigvgan)

    h = BigVGANConfig(num_mels=8, upsample_rates=(2, 2),
                      upsample_kernel_sizes=(4, 4),
                      upsample_initial_channel=512,
                      resblock_kernel_sizes=(3, 7),
                      resblock_dilation_sizes=((1, 3), (1, 3)))
    params = init_bigvgan(InitRng(11), h)
    r = np.random.default_rng(12)
    mel = jnp.asarray(r.standard_normal((2, 32, 8)), jnp.float32)
    lens = jnp.asarray([32, 21], jnp.int32)
    monkeypatch.setenv("INDEXTTS_MATMUL_CONV", "0")
    ref = np.asarray(bigvgan_forward(params, h, mel, lens))
    monkeypatch.setenv("INDEXTTS_MATMUL_CONV", "force")
    got = np.asarray(bigvgan_forward(params, h, mel, lens))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("u,k,cin,cout", [(4, 8, 16, 8), (2, 4, 8, 8),
                                          (2, 4, 3, 5), (4, 8, 8, 16)])
def test_subpixel_convt_matches(u, k, cin, cout):
    """conv_transpose1d_subpixel == conv_transpose1d on BigVGAN's (u, k)."""
    rng = InitRng(13)
    p = {"kernel": rng.normal((k, cin, cout), std=0.1),
         "bias": rng.normal((cout,), std=0.1)}
    r = np.random.default_rng(14)
    x = jnp.asarray(r.standard_normal((2, 40, cin)), jnp.float32)
    ref = np.asarray(nn.conv_transpose1d(p, x, stride=u, padding=(k - u) // 2))
    got = np.asarray(nn.conv_transpose1d_subpixel(p, x, u,
                                                  padding=(k - u) // 2))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_bigvgan_subpixel_matches_plain(monkeypatch):
    from indextts_tpu.config import BigVGANConfig
    from indextts_tpu.models.vocoder.bigvgan import (bigvgan_forward,
                                                     init_bigvgan)

    h = BigVGANConfig(num_mels=8, upsample_rates=(4, 2),
                      upsample_kernel_sizes=(8, 4),
                      upsample_initial_channel=48,
                      resblock_kernel_sizes=(3, 7),
                      resblock_dilation_sizes=((1, 3), (1, 3)))
    params = init_bigvgan(InitRng(15), h)
    r = np.random.default_rng(16)
    mel = jnp.asarray(r.standard_normal((2, 32, 8)), jnp.float32)
    lens = jnp.asarray([32, 19], jnp.int32)
    monkeypatch.setenv("INDEXTTS_SUBPIXEL_CONVT", "0")
    ref = np.asarray(bigvgan_forward(params, h, mel, lens))
    monkeypatch.setenv("INDEXTTS_SUBPIXEL_CONVT", "force")
    got = np.asarray(bigvgan_forward(params, h, mel, lens))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)

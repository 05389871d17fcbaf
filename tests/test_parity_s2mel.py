"""Golden-parity tests: JAX s2mel stack vs the torch reference (tiny configs).

Each test: instantiate the reference torch module (random init, eval mode),
convert its state_dict with utils/convert.py, run both on the same inputs,
compare. This is the per-module golden coverage the reference repo lacks
(SURVEY.md §4).
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
import reference_shim

reference_shim.install()

import jax.numpy as jnp

from indextts_tpu.config import (DiTConfig, LengthRegulatorConfig, S2MelConfig,
                                 SemanticCodecConfig, StyleEncoderConfig,
                                 WaveNetConfig)
from indextts_tpu.models.s2mel import campplus as jcampplus
from indextts_tpu.models.s2mel.dit import dit_forward
from indextts_tpu.models.s2mel.length_regulator import length_regulate
from indextts_tpu.models.codec.repcodec import repcodec_quantize, repcodec_vq2emb
from indextts_tpu.utils import convert

torch.manual_seed(0)


def _sd(m):
    return {k: v.detach().float().numpy() for k, v in m.state_dict().items()}


class _NS:
    """Tiny attr-dict for reference configs."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


TINY_S2 = S2MelConfig(
    DiT=DiTConfig(hidden_dim=64, num_heads=4, depth=2, in_channels=8,
                  content_dim=16, final_layer_type="wavenet"),
    wavenet=WaveNetConfig(hidden_dim=64, num_layers=3, kernel_size=5,
                          dilation_rate=1, p_dropout=0.0, style_condition=True),
    style_encoder=StyleEncoderConfig(dim=12),
    length_regulator=LengthRegulatorConfig(channels=16, is_discrete=True,
                                           content_codebook_size=32,
                                           sampling_ratios=(1, 1)),
)


def _ref_dit(s2: S2MelConfig):
    from indextts.s2mel.modules.diffusion_transformer import DiT

    c = s2.DiT
    args = _NS(
        DiT=_NS(time_as_token=False, style_as_token=False, uvit_skip_connection=False,
                depth=c.depth, num_heads=c.num_heads, hidden_dim=c.hidden_dim,
                in_channels=c.in_channels, content_type="discrete",
                content_codebook_size=32, content_dim=c.content_dim,
                is_causal=False, final_layer_type="wavenet",
                class_dropout_prob=0.1, style_condition=True,
                long_skip_connection=True),
        wavenet=_NS(hidden_dim=s2.wavenet.hidden_dim, kernel_size=s2.wavenet.kernel_size,
                    dilation_rate=s2.wavenet.dilation_rate, num_layers=s2.wavenet.num_layers,
                    p_dropout=0.0, style_condition=True),
        style_encoder=_NS(dim=s2.style_encoder.dim),
    )
    m = DiT(args).eval()
    m.setup_caches(max_batch_size=2, max_seq_length=512)
    return m


def test_dit_parity():
    s2 = TINY_S2
    ref = _ref_dit(s2)
    params = convert.convert_dit(_sd(ref), s2, prefix="")

    B, T = 2, 24
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, s2.DiT.in_channels, T)).astype(np.float32)
    prompt_x = rng.standard_normal((B, s2.DiT.in_channels, T)).astype(np.float32)
    style = rng.standard_normal((B, s2.style_encoder.dim)).astype(np.float32)
    cond = rng.standard_normal((B, T, s2.DiT.content_dim)).astype(np.float32)
    t = np.asarray([0.3, 0.7], np.float32)
    x_lens = np.asarray([T, T], np.int64)

    with torch.no_grad():
        out_ref = ref(torch.tensor(x), torch.tensor(prompt_x),
                      torch.tensor(x_lens), torch.tensor(t),
                      torch.tensor(style), torch.tensor(cond)).numpy()

    out = dit_forward(params, s2, jnp.asarray(x.transpose(0, 2, 1)),
                      jnp.asarray(prompt_x.transpose(0, 2, 1)),
                      jnp.asarray(x_lens), jnp.asarray(t), jnp.asarray(style),
                      jnp.asarray(cond))
    out = np.asarray(out).transpose(0, 2, 1)
    np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=1e-3)


def test_dit_parity_varlen():
    """Rows shorter than the buffer must match the reference on valid frames."""
    s2 = TINY_S2
    ref = _ref_dit(s2)
    params = convert.convert_dit(_sd(ref), s2, prefix="")

    rng = np.random.default_rng(1)
    T_short, T_buf = 17, 24
    x = rng.standard_normal((1, s2.DiT.in_channels, T_short)).astype(np.float32)
    prompt_x = rng.standard_normal((1, s2.DiT.in_channels, T_short)).astype(np.float32)
    style = rng.standard_normal((1, s2.style_encoder.dim)).astype(np.float32)
    cond = rng.standard_normal((1, T_short, s2.DiT.content_dim)).astype(np.float32)
    t = np.asarray([0.5], np.float32)

    with torch.no_grad():
        out_ref = ref(torch.tensor(x), torch.tensor(prompt_x),
                      torch.tensor(np.asarray([T_short], np.int64)), torch.tensor(t),
                      torch.tensor(style), torch.tensor(cond)).numpy()

    pad = T_buf - T_short
    xp = np.pad(x, ((0, 0), (0, 0), (0, pad)))
    pp = np.pad(prompt_x, ((0, 0), (0, 0), (0, pad)))
    cp = np.pad(cond, ((0, 0), (0, pad), (0, 0)))
    out = dit_forward(params, s2, jnp.asarray(xp.transpose(0, 2, 1)),
                      jnp.asarray(pp.transpose(0, 2, 1)),
                      jnp.asarray([T_short]), jnp.asarray(t), jnp.asarray(style),
                      jnp.asarray(cp))
    out = np.asarray(out).transpose(0, 2, 1)[:, :, :T_short]
    np.testing.assert_allclose(out, out_ref, atol=5e-4, rtol=1e-2)


def test_length_regulator_parity():
    from indextts.s2mel.modules.length_regulator import InterpolateRegulator

    cfg = TINY_S2.length_regulator
    ref = InterpolateRegulator(channels=cfg.channels, sampling_ratios=cfg.sampling_ratios,
                               is_discrete=True, codebook_size=cfg.content_codebook_size).eval()
    params = convert.convert_length_regulator(_sd(ref), cfg)

    rng = np.random.default_rng(2)
    T_code, ylen = 11, 19
    codes = rng.integers(0, cfg.content_codebook_size, size=(1, T_code))
    with torch.no_grad():
        out_ref = ref(torch.tensor(codes), ylens=torch.tensor([ylen]))[0].numpy()

    out = length_regulate(params, cfg, jnp.asarray(codes), jnp.asarray([T_code]),
                          jnp.asarray([ylen]), out_size=24)
    out = np.asarray(out)[:, :ylen, :]
    np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=1e-3)


def test_length_regulator_continuous_parity():
    """The shipped config path: continuous 1024-d content (infer_v2.py:648-656)."""
    from indextts.s2mel.modules.length_regulator import InterpolateRegulator

    cfg = LengthRegulatorConfig(channels=16, is_discrete=False, in_channels=24,
                                content_codebook_size=32, sampling_ratios=(1, 1))
    ref = InterpolateRegulator(channels=cfg.channels, sampling_ratios=cfg.sampling_ratios,
                               is_discrete=False, in_channels=cfg.in_channels,
                               codebook_size=cfg.content_codebook_size).eval()
    params = convert.convert_length_regulator(_sd(ref), cfg)

    rng = np.random.default_rng(7)
    T_code, ylen = 11, 19
    feats = rng.standard_normal((1, T_code, cfg.in_channels)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(feats), ylens=torch.tensor([ylen]))[0].numpy()

    out = length_regulate(params, cfg, jnp.zeros((1, T_code), jnp.int32),
                          jnp.asarray([T_code]), jnp.asarray([ylen]),
                          out_size=24, features=jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(out)[:, :ylen, :], out_ref,
                               atol=2e-4, rtol=1e-3)


def test_campplus_parity():
    from indextts.s2mel.modules.campplus.DTDNN import CAMPPlus

    ref = CAMPPlus(feat_dim=80, embedding_size=192).eval()
    # randomize BN stats so the eval-mode fold is actually exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    params = convert.convert_campplus(_sd(ref))

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((1, 130, 80)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(feats)).numpy()
    out = np.asarray(jcampplus.campplus_forward(params, jnp.asarray(feats)))
    np.testing.assert_allclose(out, out_ref, atol=5e-4, rtol=1e-2)


def test_repcodec_parity():
    from indextts.utils.maskgct.models.codec.kmeans.repcodec_model import RepCodec

    cfg = SemanticCodecConfig(codebook_size=64, hidden_size=32, codebook_dim=8,
                              vocos_dim=24, vocos_intermediate_dim=48,
                              vocos_num_layers=2, num_quantizers=1, downsample_scale=1)
    ref = RepCodec(codebook_size=cfg.codebook_size, hidden_size=cfg.hidden_size,
                   codebook_dim=cfg.codebook_dim, vocos_dim=cfg.vocos_dim,
                   vocos_intermediate_dim=cfg.vocos_intermediate_dim,
                   vocos_num_layers=cfg.vocos_num_layers,
                   num_quantizers=1, downsample_scale=1).eval()
    params = convert.convert_repcodec(_sd(ref), cfg)

    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 13, cfg.hidden_size)).astype(np.float32)
    with torch.no_grad():
        idx_ref, q_ref = ref.quantize(torch.tensor(x))
    idx, q = repcodec_quantize(params, cfg, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(idx)[0], idx_ref.numpy()[0])
    # reference quantize() already returns (B, T, hidden)
    np.testing.assert_allclose(np.asarray(q), q_ref.numpy(), atol=2e-4, rtol=1e-3)

    # vq2emb path (infer_v2.py:648): reference returns (B, hidden, T)
    codes = np.asarray(idx)
    with torch.no_grad():
        emb_ref = ref.quantizer.vq2emb(torch.tensor(codes).unsqueeze(1)).numpy()
    emb = np.asarray(repcodec_vq2emb(params, jnp.asarray(codes)))
    np.testing.assert_allclose(emb, emb_ref.transpose(0, 2, 1), atol=2e-4, rtol=1e-3)


def test_mel22k_matches_reference_torch(rng):
    """Our jax mel front-end vs the reference torch mel_spectrogram
    (`s2mel/modules/audio.py:45-82`) — validates torch.stft framing/pad
    semantics end to end (the mel filterbank itself is shim-shared)."""
    from indextts.s2mel.modules.audio import mel_spectrogram as ref_mel

    from indextts_tpu.ops.mel import mel_spectrogram as our_mel

    y = (rng.standard_normal(22050) * 0.4).astype(np.float32)
    ref = ref_mel(torch.tensor(y)[None, :], n_fft=1024, num_mels=80,
                  sampling_rate=22050, hop_size=256, win_size=1024,
                  fmin=0, fmax=None, center=False).numpy()
    ours = np.asarray(our_mel(jnp.asarray(y)[None, :]))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)

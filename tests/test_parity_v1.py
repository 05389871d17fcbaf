"""Golden-parity tests for the v1 family (ECAPA, BigVGAN-v1, UnifiedVoice-v1)."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
import reference_shim

reference_shim.install()

import jax.numpy as jnp

from indextts_tpu.config import BigVGANV1Config, ConditionModuleConfig, GPTConfig
from indextts_tpu.models.gpt import unified_voice_v1 as juv1
from indextts_tpu.models.vocoder.bigvgan_v1 import bigvgan_v1_forward
from indextts_tpu.models.vocoder.ecapa import ecapa_forward
from indextts_tpu.utils import convert

torch.manual_seed(0)


def _sd(m):
    return {k: v.detach().float().numpy() for k, v in m.state_dict().items()}


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.running_mean.uniform_(-0.1, 0.1)
                mod.running_var.uniform_(0.5, 1.5)


def test_ecapa_parity(rng):
    from indextts.BigVGAN.ECAPA_TDNN import ECAPA_TDNN

    ref = ECAPA_TDNN(input_size=24, lin_neurons=32).eval()
    _randomize_bn(ref)
    params = convert.convert_ecapa(_sd(ref), "")

    x = rng.standard_normal((2, 150, 24)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x)).numpy()
    out = np.asarray(ecapa_forward(params, jnp.asarray(x)))
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, atol=2e-3, rtol=1e-2)


TINY_H = BigVGANV1Config(
    gpt_dim=16, num_mels=24, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=16, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3, 5),), speaker_embedding_dim=32,
    feat_upsample=True, cond_d_vector_in_each_upsampling_layer=True)


def test_bigvgan_v1_parity(rng):
    from indextts.BigVGAN.models import BigVGAN as RefBigVGAN
    from indextts.s2mel.modules.bigvgan.env import AttrDict

    h = TINY_H
    cfg = AttrDict({
        "gpt_dim": h.gpt_dim, "num_mels": h.num_mels,
        "upsample_rates": list(h.upsample_rates),
        "upsample_kernel_sizes": list(h.upsample_kernel_sizes),
        "upsample_initial_channel": h.upsample_initial_channel,
        "resblock": "1", "resblock_kernel_sizes": list(h.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(d) for d in h.resblock_dilation_sizes],
        "activation": "snakebeta", "snake_logscale": True,
        "feat_upsample": True, "cond_d_vector_in_each_upsampling_layer": True,
        "speaker_embedding_dim": h.speaker_embedding_dim,
    })
    ref = RefBigVGAN(cfg, use_cuda_kernel=False).eval()
    _randomize_bn(ref)
    with torch.no_grad():
        for name, prm in ref.named_parameters():
            if name.endswith("alpha") or name.endswith("beta"):
                prm.uniform_(-0.5, 0.5)
    params = convert.convert_bigvgan_v1(_sd(ref), h)

    T, S = 13, 80
    latent = rng.standard_normal((1, T, h.gpt_dim)).astype(np.float32)
    # ECAPA takes (B, time, mels): infer.py passes cond_mel.transpose(1, 2)
    mel_ref = rng.standard_normal((1, S, h.num_mels)).astype(np.float32)
    with torch.no_grad():
        wav_ref, _ = ref(torch.tensor(latent), torch.tensor(mel_ref))
    wav_ref = wav_ref.numpy()[:, 0, :]
    wav = np.asarray(bigvgan_v1_forward(params, h, jnp.asarray(latent),
                                        jnp.asarray(mel_ref)))
    assert wav.shape == wav_ref.shape
    np.testing.assert_allclose(wav, wav_ref, atol=2e-4, rtol=1e-2)


TINY_V1 = GPTConfig(
    layers=2, model_dim=32, heads=4, max_text_tokens=30, max_mel_tokens=60,
    number_text_tokens=40, number_mel_codes=50, start_mel_token=48,
    stop_mel_token=49, cond_input_dim=24, condition_type="conformer_perceiver",
    condition_module=ConditionModuleConfig(output_size=16, linear_units=32,
                                           attention_heads=4, num_blocks=1,
                                           input_layer="conv2d2",
                                           perceiver_mult=2))


@pytest.fixture(scope="module")
def ref_uv1():
    from indextts.gpt.model import UnifiedVoice

    cm = dict(output_size=16, linear_units=32, attention_heads=4, num_blocks=1,
              input_layer="conv2d2", perceiver_mult=2)
    m = UnifiedVoice(layers=2, model_dim=32, heads=4, max_text_tokens=30,
                     max_mel_tokens=60, number_text_tokens=40,
                     number_mel_codes=50, start_mel_token=48, stop_mel_token=49,
                     checkpointing=False, condition_type="conformer_perceiver",
                     condition_module=cm).eval()
    # v1 ConformerEncoder input_size is hardcoded 100 in model.py:353; our
    # tiny test uses input 24 via a monkeypatched conformer — instead rebuild
    # conditioning encoder at input 24
    from indextts.gpt.conformer_encoder import ConformerEncoder

    m.conditioning_encoder = ConformerEncoder(
        input_size=24, output_size=16, linear_units=32, attention_heads=4,
        num_blocks=1, input_layer="conv2d2").eval()
    return m


def test_unified_voice_v1_parity(ref_uv1, rng):
    params = convert.convert_unified_voice_v1(_sd(ref_uv1), TINY_V1)
    B, Tc, Lt, Lm = 1, 40, 7, 11
    mel = rng.standard_normal((B, 24, Tc)).astype(np.float32)
    text = rng.integers(2, 40, size=(B, Lt)).astype(np.int64)
    codes = rng.integers(0, 48, size=(B, Lm)).astype(np.int64)

    with torch.no_grad():
        cond_ref = ref_uv1.get_conditioning(torch.tensor(mel),
                                            torch.tensor([Tc]))
        # reference v1 forward computes mel_codes_lengths from wav_lengths
        wav_lengths = torch.tensor([(Lm - 1) * ref_uv1.mel_length_compression])
        lat_ref = ref_uv1(torch.tensor(mel), torch.tensor(text),
                          torch.tensor([Lt]), torch.tensor(codes), wav_lengths,
                          cond_mel_lengths=torch.tensor([Tc]),
                          return_latent=True, clip_inputs=False).numpy()

    cond = juv1.get_conditioning_v1(params, TINY_V1,
                                    jnp.asarray(mel.transpose(0, 2, 1)),
                                    jnp.asarray([Tc]))
    np.testing.assert_allclose(np.asarray(cond), cond_ref.numpy(), atol=5e-4,
                               rtol=1e-2)

    mel_code_lens = int(np.ceil(wav_lengths.numpy()[0] / 1024)) + 1
    lat = np.asarray(juv1.forward_latents_v1(
        params, TINY_V1, cond, jnp.asarray(text.astype(np.int32)),
        jnp.asarray([Lt]), jnp.asarray(codes.astype(np.int32)),
        jnp.asarray([min(mel_code_lens, Lm)])))
    assert lat.shape == lat_ref.shape
    np.testing.assert_allclose(lat, lat_ref, atol=1e-3, rtol=1e-2)

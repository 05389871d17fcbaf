"""Golden-parity tests for the GPT side: backbone vs installed HF GPT-2,
conformer/perceiver/UnifiedVoice vs the torch reference."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
import reference_shim

reference_shim.install()

import jax.numpy as jnp

from indextts_tpu.config import ConditionModuleConfig, GPTConfig
from indextts_tpu.models.gpt import gpt2 as jgpt2
from indextts_tpu.models.gpt.conformer import ConformerDims, conformer_encode
from indextts_tpu.models.gpt.perceiver import PerceiverDims, perceiver_resample
from indextts_tpu.models.gpt import unified_voice as juv
from indextts_tpu.utils import convert

torch.manual_seed(0)


def _sd(m):
    return {k: v.detach().float().numpy() for k, v in m.state_dict().items()}


def test_gpt2_backbone_matches_hf():
    from transformers import GPT2Config, GPT2Model

    L, D, H, T, B = 2, 32, 4, 10, 2
    hf = GPT2Model(GPT2Config(vocab_size=64, n_positions=T, n_embd=D,
                              n_layer=L, n_head=H)).eval()
    params = convert.convert_gpt2(_sd(hf), L)
    dims = jgpt2.GPT2Dims(L, D, H)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    with torch.no_grad():
        # null positional embeddings, like the reference (model_v2.py:272-274)
        hf.wpe.weight.zero_()
        out_ref = hf(inputs_embeds=torch.tensor(x)).last_hidden_state.numpy()
    out = np.asarray(jgpt2.gpt2_forward(params, jnp.asarray(x), dims))
    np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=1e-3)


def test_conformer_parity_subsampling_4_6_8():
    """Conv2dSubsampling4/6/8 input layers vs the executing torch reference
    (reference gpt/conformer/subsampling.py:189-348)."""
    from indextts.gpt.conformer_encoder import ConformerEncoder

    for input_layer in ("conv2d", "conv2d6", "conv2d8"):
        ref = ConformerEncoder(input_size=40, output_size=16, attention_heads=4,
                               linear_units=32, num_blocks=1,
                               input_layer=input_layer).eval()
        d = ConformerDims(input_size=40, output_size=16, attention_heads=4,
                          linear_units=32, num_blocks=1,
                          input_layer=input_layer)
        params = convert.convert_conformer(_sd(ref), 1, input_layer)

        rng = np.random.default_rng(2)
        B, T = 2, 45
        x = rng.standard_normal((B, T, 40)).astype(np.float32)
        lens = np.asarray([T, 30], np.int64)
        with torch.no_grad():
            out_ref, mask_ref = ref(torch.tensor(x), torch.tensor(lens))
        out, mask = conformer_encode(params, d, jnp.asarray(x),
                                     jnp.asarray(lens))
        assert out.shape == tuple(out_ref.shape), (input_layer, out.shape,
                                                   out_ref.shape)
        np.testing.assert_array_equal(np.asarray(mask),
                                      mask_ref.squeeze(1).numpy())
        mr = mask_ref.squeeze(1).numpy()
        np.testing.assert_allclose(np.asarray(out)[mr],
                                   out_ref.numpy()[mr], atol=2e-4, rtol=1e-3)


def test_conformer_parity_linear_and_conv2d2():
    from indextts.gpt.conformer_encoder import ConformerEncoder

    for input_layer in ("linear", "conv2d2"):
        ref = ConformerEncoder(input_size=24, output_size=16, attention_heads=4,
                               linear_units=32, num_blocks=2,
                               input_layer=input_layer).eval()
        d = ConformerDims(input_size=24, output_size=16, attention_heads=4,
                          linear_units=32, num_blocks=2, input_layer=input_layer)
        params = convert.convert_conformer(_sd(ref), 2, input_layer)

        rng = np.random.default_rng(1)
        B, T = 2, 21
        x = rng.standard_normal((B, T, 24)).astype(np.float32)
        lens = np.asarray([T, 15], np.int64)
        with torch.no_grad():
            out_ref, mask_ref = ref(torch.tensor(x), torch.tensor(lens))
        out, mask = conformer_encode(params, d, jnp.asarray(x), jnp.asarray(lens))
        assert out.shape == tuple(out_ref.shape), (out.shape, out_ref.shape)
        np.testing.assert_array_equal(np.asarray(mask), mask_ref.squeeze(1).numpy())
        # compare only valid positions (reference computes padded junk too)
        m = np.asarray(mask)
        np.testing.assert_allclose(np.asarray(out)[m], out_ref.numpy()[m],
                                   atol=5e-4, rtol=1e-2)


def test_perceiver_parity():
    from indextts.gpt.perceiver import PerceiverResampler

    ref = PerceiverResampler(dim=16, dim_context=24, num_latents=4, dim_head=8,
                             heads=2, ff_mult=2).eval()
    d = PerceiverDims(dim=16, dim_context=24, num_latents=4, dim_head=8,
                      heads=2, ff_mult=2)
    params = convert.convert_perceiver(_sd(ref))

    rng = np.random.default_rng(2)
    B, T = 2, 13
    x = rng.standard_normal((B, T, 24)).astype(np.float32)
    mask = np.ones((B, 4 + T), bool)
    mask[1, 4 + 9:] = False  # row 1: only 9 valid ctx frames (+4 latents)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x), mask=torch.tensor(mask)).numpy()
    out = np.asarray(perceiver_resample(params, d, jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(out, out_ref, atol=5e-4, rtol=1e-2)


TINY = GPTConfig(
    layers=2, model_dim=32, heads=4, max_text_tokens=30, max_mel_tokens=60,
    number_text_tokens=40, number_mel_codes=50, start_mel_token=48, stop_mel_token=49,
    condition_module=ConditionModuleConfig(output_size=16, linear_units=32,
                                           attention_heads=4, num_blocks=1,
                                           input_layer="conv2d2", perceiver_mult=2),
    emo_condition_module=ConditionModuleConfig(output_size=16, linear_units=32,
                                               attention_heads=4, num_blocks=1,
                                               input_layer="conv2d2", perceiver_mult=2),
)


@pytest.fixture(scope="module")
def ref_uv():
    from indextts.gpt.model_v2 import UnifiedVoice

    cm = dict(output_size=16, linear_units=32, attention_heads=4, num_blocks=1,
              input_layer="conv2d2", perceiver_mult=2)
    m = UnifiedVoice(layers=2, model_dim=32, heads=4, max_text_tokens=30,
                     max_mel_tokens=60, number_text_tokens=40,
                     number_mel_codes=50, start_mel_token=48, stop_mel_token=49,
                     checkpointing=False, condition_type="conformer_perceiver",
                     condition_module=cm, emo_condition_module=dict(cm)).eval()
    return m


@pytest.fixture(scope="module")
def uv_params(ref_uv):
    return convert.convert_unified_voice(_sd(ref_uv), TINY)


def test_unified_voice_conditioning_parity(ref_uv, uv_params):
    rng = np.random.default_rng(3)
    B, T = 1, 40
    cond = rng.standard_normal((B, T, 1024)).astype(np.float32)
    lens = np.asarray([T], np.int64)
    with torch.no_grad():
        # reference takes (b, d, s) and transposes internally
        out_ref = ref_uv.get_conditioning(torch.tensor(cond).transpose(1, 2),
                                          torch.tensor(lens)).numpy()
    out = np.asarray(juv.get_conditioning(uv_params, TINY, jnp.asarray(cond),
                                          jnp.asarray(lens)))
    np.testing.assert_allclose(out, out_ref, atol=5e-4, rtol=1e-2)


def test_unified_voice_emovec_parity(ref_uv, uv_params):
    rng = np.random.default_rng(4)
    B, T = 1, 36
    spk = rng.standard_normal((B, T, 1024)).astype(np.float32)
    emo = rng.standard_normal((B, T, 1024)).astype(np.float32)
    lens = np.asarray([T], np.int64)
    with torch.no_grad():
        # merge_emovec takes (B, T, 1024) directly (it transposes internally
        # twice through get_emovec -> get_emo_conditioning, `model_v2.py:785-796`)
        out_ref = ref_uv.merge_emovec(
            torch.tensor(spk), torch.tensor(emo),
            torch.tensor(lens), torch.tensor(lens), alpha=0.65).numpy()
    out = np.asarray(juv.merge_emovec(uv_params, TINY, jnp.asarray(spk),
                                      jnp.asarray(emo), jnp.asarray(lens),
                                      jnp.asarray(lens), alpha=0.65))
    np.testing.assert_allclose(out, out_ref, atol=5e-4, rtol=1e-2)


def test_unified_voice_forward_latents_parity(ref_uv, uv_params):
    """Teacher-forced latent extraction — the exact call used at inference
    (`infer_v2.py:628-639`)."""
    rng = np.random.default_rng(5)
    B, Tc, Lt, Lm = 1, 40, 7, 11
    spk = rng.standard_normal((B, Tc, 1024)).astype(np.float32)
    emo_vec_t = torch.tensor(rng.standard_normal((B, 32)).astype(np.float32))
    text = rng.integers(2, 40, size=(B, Lt)).astype(np.int64)
    codes = rng.integers(0, 48, size=(B, Lm)).astype(np.int64)
    lens = np.asarray([Tc], np.int64)

    with torch.no_grad():
        cond_latents_ref = ref_uv.get_conditioning(torch.tensor(spk).transpose(1, 2),
                                                   torch.tensor(lens))
        lat_ref = ref_uv(
            cond_latents_ref,
            torch.tensor(text), torch.tensor([Lt]),
            torch.tensor(codes), torch.tensor([Lm]),
            torch.tensor(spk).transpose(1, 2),
            cond_mel_lengths=torch.tensor(lens),
            emo_cond_mel_lengths=torch.tensor(lens),
            emo_vec=emo_vec_t,
            use_speed=torch.zeros(B).long(),
        ).numpy()

    cond_latents = juv.get_conditioning(uv_params, TINY, jnp.asarray(spk), jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(cond_latents), cond_latents_ref.numpy(),
                               atol=5e-4, rtol=1e-2)
    lat = np.asarray(juv.forward_latents(
        uv_params, TINY, cond_latents, jnp.asarray(emo_vec_t.numpy()),
        jnp.asarray(text.astype(np.int32)), jnp.asarray([Lt]),
        jnp.asarray(codes.astype(np.int32)), jnp.asarray([Lm])))
    assert lat.shape == lat_ref.shape, (lat.shape, lat_ref.shape)
    np.testing.assert_allclose(lat, lat_ref, atol=1e-3, rtol=1e-2)

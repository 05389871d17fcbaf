"""int4 weight-only quantization: pack/unpack roundtrip, XLA dense parity,
fused decode-kernel parity (interpret mode), and engine integration.

The parity strategy makes everything bit-exact: an int4-quantized tensor
re-expressed as int8 params ("q" = unpacked int4 values in [-7, 7], same
per-channel scale) must produce IDENTICAL outputs on every path — the only
difference is the nibble packing in HBM and the in-kernel unpack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indextts_tpu import nn
from indextts_tpu.models.gpt.gpt2 import (GPT2Dims, gpt2_decode_step,
                                          init_gpt2, init_kv_cache,
                                          quantize_gpt2_int4)
from indextts_tpu.nn import InitRng
from indextts_tpu.ops.pallas.decode_step import fused_decode_step

DIMS = GPT2Dims(layers=2, dim=1280, heads=20)


def _as_int8_params(p4):
    """int4 dense params -> equivalent int8-keyed params (bit-identical
    math: same values, same scale)."""
    out = {"q": nn.unpack_int4(p4["q4"]), "scale": p4["scale"]}
    if "bias" in p4:
        out["bias"] = p4["bias"]
    return out


def _tree_as_int8(params4):
    p = dict(params4)
    h = dict(p["h"])
    h["attn"] = {k: _as_int8_params(v) for k, v in p["h"]["attn"].items()}
    h["mlp"] = {k: _as_int8_params(v) for k, v in p["h"]["mlp"].items()}
    p["h"] = h
    return p


@pytest.mark.parametrize("K,N", [(1280, 640), (640, 2560), (5120, 1280),
                                 (32, 48)])
def test_int4_pack_unpack_roundtrip(K, N):
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.5, (K, N)).astype(np.float32)
    p4 = nn.quantize_dense_int4({"kernel": w, "bias": np.zeros(N)})
    assert p4["q4"].shape == (K // 2, N) and p4["q4"].dtype == np.int8
    vals = np.asarray(nn.unpack_int4(jnp.asarray(p4["q4"])))
    assert vals.shape == (K, N)
    assert vals.min() >= -7 and vals.max() <= 7
    # unpacked values must equal the direct quantization (natural row order)
    scale = np.maximum(np.max(np.abs(w), axis=0, keepdims=True), 1e-8) / 7.0
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    np.testing.assert_array_equal(vals, q)
    # quantization error bounded by scale/2 per element
    err = np.abs(vals * p4["scale"] - w)
    assert np.all(err <= np.broadcast_to(p4["scale"], w.shape) * 0.5 + 1e-6)


def test_int4_dense_matches_equivalent_int8():
    rng = InitRng(3)
    p = nn.dense_init(rng, 1280, 640)
    p4 = nn.quantize_dense_int4(p)
    p8 = _as_int8_params(p4)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (4, 1280)),
                    jnp.bfloat16)
    y4 = nn.dense(p4, x)
    y8 = nn.dense(p8, x)
    np.testing.assert_array_equal(np.asarray(y4, np.float32),
                                  np.asarray(y8, np.float32))


def test_int4_stacked_layers_pack():
    """quantize_gpt2_int4 packs stacked (L, K, N) kernels per layer."""
    params = init_gpt2(InitRng(0), DIMS)
    p4 = quantize_gpt2_int4(params)
    ca = p4["h"]["attn"]["c_attn"]
    assert ca["q4"].shape == (DIMS.layers, DIMS.dim // 2, 3 * DIMS.dim)
    p2 = p4["h"]["mlp"]["c_proj"]
    assert p2["q4"].shape == (DIMS.layers, 2 * DIMS.dim, DIMS.dim)
    # per-layer roundtrip matches per-layer direct quantization
    w = np.asarray(params["h"]["attn"]["c_attn"]["kernel"], np.float32)
    vals = np.asarray(nn.unpack_int4(jnp.asarray(ca["q4"])))
    scale = np.maximum(np.max(np.abs(w), axis=1, keepdims=True), 1e-8) / 7.0
    np.testing.assert_array_equal(
        vals, np.clip(np.round(w / scale), -7, 7).astype(np.int8))


def _setup(B=4, S=128, pos=70, seed=0):
    rng = InitRng(seed)
    params4 = quantize_gpt2_int4(init_gpt2(rng, DIMS))
    nprng = np.random.default_rng(seed + 1)
    kv = nprng.normal(0, 1.0, size=(2, DIMS.layers, B, S, DIMS.dim))
    kv[:, :, :, pos:] = 0.0
    mask = np.zeros((B, S), bool)
    for b in range(B):
        mask[b, b:pos] = True
        mask[b, pos] = True
    cache = {"k": jnp.asarray(kv[0], jnp.bfloat16),
             "v": jnp.asarray(kv[1], jnp.bfloat16)}
    x = jnp.asarray(nprng.normal(0, 1.0, size=(B, DIMS.dim)), jnp.bfloat16)
    return params4, x, cache, jnp.asarray(mask), jnp.asarray(pos, jnp.int32)


@pytest.mark.parametrize("w4f", ["shift", "f32"])
def test_fused_decode_step_int4_bitexact_vs_int8(w4f):
    """The int4 kernel (either unpack formulation) must be BIT-identical to
    the int8 kernel fed the same values with the same scales."""
    params4, x, cache, mask, posv = _setup()
    params8 = _tree_as_int8(params4)

    ref_h, ref_cache = fused_decode_step(params8, x, DIMS, posv, cache, mask,
                                         interpret=True)
    got_h, got_cache = fused_decode_step(params4, x, DIMS, posv, cache, mask,
                                         interpret=True, w4f=w4f)
    np.testing.assert_array_equal(np.asarray(got_h, np.float32),
                                  np.asarray(ref_h, np.float32))
    for key in ("k", "v"):
        np.testing.assert_array_equal(
            np.asarray(got_cache[key][:, :, int(posv)], np.float32),
            np.asarray(ref_cache[key][:, :, int(posv)], np.float32))


def test_fused_decode_step_int4_vs_xla():
    """int4 fused kernel vs the XLA decode step on the SAME int4 params
    (nn.dense unpacks q4): agreement to the usual kernel bf16 noise."""
    params4, x, cache, mask, posv = _setup(B=2, S=128, pos=50)
    cache5 = {k: v.reshape(DIMS.layers, 2, 128, DIMS.heads, DIMS.head_dim)
              for k, v in cache.items()}
    ref_h, _ = gpt2_decode_step(params4, x, DIMS, posv, cache5, mask)
    got_h, _ = fused_decode_step(params4, x, DIMS, posv, cache, mask,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got_h, np.float32),
                               np.asarray(ref_h, np.float32),
                               rtol=0.05, atol=0.05)


def test_generate_fused_int4_runs(monkeypatch):
    """generate() with int4 params routes through the fused kernel
    (interpret): deterministic, and the prefill-driven first token matches
    the equivalent-int8 run exactly."""
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig
    from indextts_tpu.engine import decode as dec
    from indextts_tpu.engine.decode import SamplingConfig
    from indextts_tpu.models.gpt.unified_voice import init_unified_voice

    cfg = GPTConfig(
        layers=2, model_dim=640, heads=10, max_text_tokens=30,
        max_mel_tokens=60, number_text_tokens=40, number_mel_codes=50,
        start_mel_token=48, stop_mel_token=49,
        condition_module=ConditionModuleConfig(
            output_size=32, linear_units=48, attention_heads=2, num_blocks=1,
            input_layer="linear", perceiver_mult=2),
        emo_condition_module=ConditionModuleConfig(
            output_size=32, linear_units=48, attention_heads=2, num_blocks=1,
            input_layer="linear", perceiver_mult=2))
    dims = GPT2Dims(cfg.layers, cfg.model_dim, cfg.heads)
    params = init_unified_voice(InitRng(0), cfg)
    params4 = dict(params)
    params4["gpt"] = quantize_gpt2_int4(params["gpt"])
    params8 = dict(params)
    params8["gpt"] = _tree_as_int8(params4["gpt"])
    rng = np.random.default_rng(3)
    B, P = 2, 7
    prefix = jnp.asarray(rng.normal(0, 0.3, (B, P, cfg.model_dim)),
                         jnp.bfloat16)
    mask = jnp.ones((B, P), bool).at[0, 0].set(False)
    key = jax.random.PRNGKey(5)
    sampling = SamplingConfig(do_sample=False)

    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")
    assert dec._fused_decode_ok(params4, dims, B, kv_quant=False)
    dec.generate.clear_cache()
    toks_4, lens_4 = dec.generate(params4, cfg, dims, prefix, mask, key,
                                  max_new_tokens=4, sampling=sampling)
    toks_4b, _ = dec.generate(params4, cfg, dims, prefix, mask, key,
                              max_new_tokens=4, sampling=sampling)
    toks_8, _ = dec.generate(params8, cfg, dims, prefix, mask, key,
                             max_new_tokens=4, sampling=sampling)
    dec.generate.clear_cache()
    np.testing.assert_array_equal(np.asarray(toks_4), np.asarray(toks_4b))
    # identical weight values + scales -> identical trajectories
    np.testing.assert_array_equal(np.asarray(toks_4), np.asarray(toks_8))
    assert np.all(np.asarray(lens_4) >= 0)


def test_beam_int4_matches_equivalent_int8(monkeypatch):
    """generate_beam with int4 params (fused kernel, in-kernel ancestry,
    interpret mode) is token-identical to the equivalent-int8 run."""
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig
    from indextts_tpu.engine import beam as bm
    from indextts_tpu.engine.decode import SamplingConfig
    from indextts_tpu.models.gpt.unified_voice import init_unified_voice

    cfg = GPTConfig(
        layers=2, model_dim=640, heads=10, max_text_tokens=30,
        max_mel_tokens=60, number_text_tokens=40, number_mel_codes=50,
        start_mel_token=48, stop_mel_token=49,
        condition_module=ConditionModuleConfig(
            output_size=32, linear_units=48, attention_heads=2, num_blocks=1,
            input_layer="linear", perceiver_mult=2),
        emo_condition_module=ConditionModuleConfig(
            output_size=32, linear_units=48, attention_heads=2, num_blocks=1,
            input_layer="linear", perceiver_mult=2))
    dims = GPT2Dims(cfg.layers, cfg.model_dim, cfg.heads)
    params = init_unified_voice(InitRng(0), cfg)
    params4 = dict(params)
    params4["gpt"] = quantize_gpt2_int4(params["gpt"])
    params8 = dict(params)
    params8["gpt"] = _tree_as_int8(params4["gpt"])
    rng = np.random.default_rng(3)
    B, P = 1, 7
    prefix = jnp.asarray(rng.normal(0, 0.3, (B, P, cfg.model_dim)),
                         jnp.bfloat16)
    mask = jnp.ones((B, P), bool)
    key = jax.random.PRNGKey(5)
    sampling = SamplingConfig(do_sample=False, num_beams=2)

    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")
    bm.generate_beam.clear_cache()
    t4, l4 = bm.generate_beam(params4, cfg, dims, prefix, mask, key,
                              max_new_tokens=4, sampling=sampling)
    t8, l8 = bm.generate_beam(params8, cfg, dims, prefix, mask, key,
                              max_new_tokens=4, sampling=sampling)
    bm.generate_beam.clear_cache()
    np.testing.assert_array_equal(np.asarray(t4), np.asarray(t8))
    np.testing.assert_array_equal(np.asarray(l4), np.asarray(l8))


def test_int4_with_int8kv_cache():
    """int4 weights compose with the flat int8 KV cache."""
    from indextts_tpu.models.gpt.gpt2 import kv_quantize_flat

    params4, x, cache, mask, posv = _setup(B=2, S=128, pos=50)
    kq, vq, kvs = kv_quantize_flat(cache["k"], cache["v"], DIMS.heads)
    qc = {"k": kq, "v": vq, "kvs": kvs}
    ref_h, _ = fused_decode_step(_tree_as_int8(params4), x, DIMS, posv, qc,
                                 mask, interpret=True)
    got_h, got_cache = fused_decode_step(params4, x, DIMS, posv, qc, mask,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(got_h, np.float32),
                                  np.asarray(ref_h, np.float32))
    assert got_cache["k"].dtype == jnp.int8

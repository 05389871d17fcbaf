"""Parity tests for the fused multi-layer decode kernel (interpret mode).

Verifies `ops/pallas/decode_step.fused_decode_step` against the XLA
reference `models/gpt/gpt2.gpt2_decode_step` on int8-quantized params with
a bf16 cache: same rounding chain, so outputs should agree to bf16 noise
accumulated over the flash-vs-exact softmax reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indextts_tpu.models.gpt.gpt2 import (GPT2Dims, gpt2_decode_step,
                                          init_gpt2, init_kv_cache,
                                          quantize_gpt2_int8)
from indextts_tpu.nn import InitRng
from indextts_tpu.ops.pallas.decode_step import fused_decode_step

DIMS = GPT2Dims(layers=2, dim=1280, heads=20)


def _setup(B=4, S=128, pos=70, seed=0):
    rng = InitRng(seed)
    params = quantize_gpt2_int8(init_gpt2(rng, DIMS))
    cache = init_kv_cache(DIMS, B, S, jnp.bfloat16)
    nprng = np.random.default_rng(seed + 1)
    # pre-populate the cache region [0, pos) with plausible values
    kv = nprng.normal(0, 1.0, size=(2, DIMS.layers, B, S, DIMS.heads,
                                    DIMS.head_dim)).astype(np.float32)
    mask = np.zeros((B, S), bool)
    for b in range(B):
        start = b  # staggered left-pad starts
        mask[b, start:pos] = True
        mask[b, pos] = True  # the slot being written this step
    kv[:, :, :, pos:] = 0.0
    cache = {"k": jnp.asarray(kv[0], jnp.bfloat16),
             "v": jnp.asarray(kv[1], jnp.bfloat16)}
    x = jnp.asarray(nprng.normal(0, 1.0, size=(B, DIMS.dim)), jnp.bfloat16)
    return params, x, cache, jnp.asarray(mask), jnp.asarray(pos, jnp.int32)


def _flat(cache):
    """5D test cache -> the fused kernel's (L, B, S, D) layout."""
    L, B, S, H, Dh = cache["k"].shape
    return {k: v.reshape(L, B, S, H * Dh) for k, v in cache.items()}


@pytest.mark.parametrize("B,S,pos", [(4, 128, 70), (8, 256, 255), (2, 128, 0),
                                     (16, 128, 70), (24, 128, 100)])
def test_fused_decode_step_parity(B, S, pos):
    params, x, cache, mask, posv = _setup(B=B, S=S, pos=pos)
    ref_h, ref_cache = gpt2_decode_step(params, x, DIMS, posv, cache, mask)
    got_h, got_cache = fused_decode_step(params, x, DIMS, posv, _flat(cache),
                                         mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got_h, np.float32),
                               np.asarray(ref_h, np.float32),
                               rtol=0.05, atol=0.05)
    for key in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(got_cache[key], np.float32),
            np.asarray(_flat(ref_cache)[key], np.float32),
            rtol=0.02, atol=0.02)


def test_fused_decode_multi_step_drift():
    """Run 8 consecutive steps through both paths; hidden states must track."""
    params, x, cache, mask, _ = _setup(B=2, S=128, pos=60)
    cache_f = _flat(cache)
    x_f = x
    x_r = x
    cache_r = cache
    m = np.array(mask)
    for step in range(8):
        pos = jnp.asarray(60 + step, jnp.int32)
        m[:, 60 + step] = True
        mk = jnp.asarray(m)
        r_h, cache_r = gpt2_decode_step(params, x_r, DIMS, pos, cache_r, mk)
        f_h, cache_f = fused_decode_step(params, x_f, DIMS, pos, cache_f, mk,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(f_h, np.float32),
                                   np.asarray(r_h, np.float32),
                                   rtol=0.08, atol=0.08)
        x_r = r_h.astype(jnp.bfloat16)[:, :1280]
        x_f = f_h.astype(jnp.bfloat16)[:, :1280]


def test_generate_fused_token_parity(monkeypatch):
    """End-to-end: generate() with the fused kernel (interpret mode) emits
    exactly the same tokens as the XLA decode path, including the 128-aligned
    cache sizing."""
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
    params["gpt"] = quantize_gpt2_int8(params["gpt"])
    rng = np.random.default_rng(3)
    B, P = 2, 7
    prefix = jnp.asarray(rng.normal(0, 0.3, (B, P, cfg.model_dim)),
                         jnp.bfloat16)
    mask = jnp.ones((B, P), bool).at[0, 0].set(False)
    key = jax.random.PRNGKey(5)
    sampling = SamplingConfig(do_sample=False)

    toks_ref, lens_ref = dec.generate(params, cfg, dims, prefix, mask, key,
                                      max_new_tokens=4, sampling=sampling)
    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")
    assert dec._fused_decode_ok(params, dims, B, kv_quant=False)
    dec.generate.clear_cache()
    toks_f, lens_f = dec.generate(params, cfg, dims, prefix, mask, key,
                                  max_new_tokens=4, sampling=sampling)
    toks_f2, _ = dec.generate(params, cfg, dims, prefix, mask, key,
                              max_new_tokens=4, sampling=sampling)
    dec.generate.clear_cache()
    # token-exact agreement with the XLA path is NOT guaranteed (the kernel
    # rounds q*k products to bf16 before the summation, ~1% logit noise,
    # which can flip near-tie argmaxes on random weights); numeric parity is
    # asserted by the kernel-level tests above. Here: the integration runs
    # (128-aligned cache sizing, while_loop glue), is deterministic, and
    # emits the same first token (prefill logits are bit-identical paths).
    assert toks_f.shape == toks_ref.shape
    np.testing.assert_array_equal(np.asarray(toks_f), np.asarray(toks_f2))
    np.testing.assert_array_equal(np.asarray(toks_ref[:, 0]),
                                  np.asarray(toks_f[:, 0]))
    assert np.all(np.asarray(lens_f) >= 0)


def test_beam_fused_runs(monkeypatch):
    """generate_beam routes through the fused kernel (interpret mode) when
    B*K <= 8 and produces sane outputs."""
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
    params["gpt"] = quantize_gpt2_int8(params["gpt"])
    rng = np.random.default_rng(3)
    B, P = 1, 7
    prefix = jnp.asarray(rng.normal(0, 0.3, (B, P, cfg.model_dim)),
                         jnp.bfloat16)
    mask = jnp.ones((B, P), bool)
    key = jax.random.PRNGKey(5)
    sampling = SamplingConfig(do_sample=False, num_beams=2)

    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")
    toks, lens = bm.generate_beam(params, cfg, dims, prefix, mask, key,
                                  max_new_tokens=4, sampling=sampling)
    assert toks.shape == (B, 4)
    assert np.all(np.asarray(lens) >= 0)
    assert np.all((np.asarray(toks) >= 0) & (np.asarray(toks) < 50))


@pytest.mark.parametrize("K,B", [(2, 4), (2, 14), (3, 24)])
def test_fused_decode_step_anc_parity(K, B):
    """Beam-ancestry selection (group=K, unordered cache + anc map) must be
    BIT-identical to running the kernel on a physically ancestry-gathered
    cache — the whole point of the design is replacing the HF per-step cache
    gather without changing a single output bit. B=14/24 exercise the
    32-slot kv-block layout (B*K > 12, VERDICT r3 item 3)."""
    from indextts_tpu.engine.beam import _anc_bs, _anc_flat

    S, pos = 128, 70
    params, x, cache, mask, posv = _setup(B=B, S=S, pos=pos)
    nprng = np.random.default_rng(42)
    anc = nprng.integers(0, K, size=(B, S)).astype(np.int32)
    flat = _flat(cache)
    idx = (np.arange(B)[:, None] // K) * K + anc            # (B, S) abs rows
    gathered = {kk: jnp.asarray(np.asarray(v)[:, idx, np.arange(S), :])
                for kk, v in flat.items()}

    ref_h, ref_cache = fused_decode_step(params, x, DIMS, posv, gathered,
                                         mask, interpret=True)
    got_h, got_cache = fused_decode_step(params, x, DIMS, posv, flat, mask,
                                         interpret=True,
                                         anc=_anc_flat(jnp.asarray(anc), S,
                                                       _anc_bs(B)),
                                         group=K)
    np.testing.assert_array_equal(np.asarray(got_h, np.float32),
                                  np.asarray(ref_h, np.float32))
    # the newly written row is each slot's own k/v in both schemes
    for key in ("k", "v"):
        np.testing.assert_array_equal(
            np.asarray(got_cache[key][:, :, pos], np.float32),
            np.asarray(ref_cache[key][:, :, pos], np.float32))


@pytest.mark.parametrize("B", [2, 5])
def test_beam_anc_matches_gather(monkeypatch, B):
    """generate_beam with the in-kernel ancestry map (INDEXTTS_BEAM_ANC=1,
    default) is token-identical to the per-step cache-gather path, through
    the fused kernel in interpret mode, sampled + deterministic. B=5 with
    K=3 (15 flat rows) exercises the 32-slot anc layout."""
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
    params["gpt"] = quantize_gpt2_int8(params["gpt"])
    rng = np.random.default_rng(3)
    P = 7
    prefix = jnp.asarray(rng.normal(0, 0.3, (B, P, cfg.model_dim)),
                         jnp.bfloat16)
    mask = jnp.ones((B, P), bool).at[0, 0].set(False)
    key = jax.random.PRNGKey(5)
    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")

    for samp in (SamplingConfig(do_sample=False, num_beams=3,
                                repetition_penalty=1.0),
                 SamplingConfig(do_sample=True, num_beams=3, temperature=0.9,
                                top_k=10, top_p=0.95, repetition_penalty=2.0)):
        monkeypatch.setenv("INDEXTTS_BEAM_ANC", "0")
        bm.generate_beam.clear_cache()
        t_ref, l_ref = bm.generate_beam(params, cfg, dims, prefix, mask, key,
                                        max_new_tokens=8, sampling=samp)
        monkeypatch.setenv("INDEXTTS_BEAM_ANC", "1")
        bm.generate_beam.clear_cache()
        t_anc, l_anc = bm.generate_beam(params, cfg, dims, prefix, mask, key,
                                        max_new_tokens=8, sampling=samp)
        bm.generate_beam.clear_cache()
        np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_anc))
        np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_anc))


def test_generate_adaptive_fused_span_growth(monkeypatch):
    """generate_adaptive with the fused kernel (interpret): cache growth
    across span buckets keeps the 128-aligned flat layout consistent."""
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
    params["gpt"] = quantize_gpt2_int8(params["gpt"])
    rng = np.random.default_rng(7)
    B, P = 2, 5
    prefix = jnp.asarray(rng.normal(0, 0.3, (B, P, cfg.model_dim)),
                         jnp.bfloat16)
    mask = jnp.ones((B, P), bool)
    key = jax.random.PRNGKey(11)
    # min_new_tokens pins the decode length past the first span so the
    # grow-and-continue path actually runs (spans (4, 10))
    sampling = SamplingConfig(do_sample=False, min_new_tokens=9)

    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")
    toks, lens = dec.generate_adaptive(params, cfg, dims, prefix, mask, key,
                                       max_new_tokens=10, sampling=sampling,
                                       spans=(4,))
    assert toks.shape == (B, 10)
    # min_new_tokens guarantees at least 9 non-stop tokens per row
    assert np.all(np.asarray(lens) >= 9)


def test_fused_decode_step_int8kv_parity():
    """Flat int8 cache (packed bf16 scale rows, in-kernel folded dequant)
    vs (a) the bf16-cache fused kernel — error bounded by int8 KV noise —
    and (b) the XLA 5D int8kv path quantized from the same raw values.
    Known divergences vs (b): bf16-rounded scales, and the fused path
    attends the CURRENT token unquantized (the XLA path round-trips it)."""
    from indextts_tpu.models.gpt.gpt2 import (_kv_quantize, kv_quantize_flat)

    params, x, cache, mask, posv = _setup(B=4, S=128, pos=70)

    ref_h, _ = fused_decode_step(params, x, DIMS, posv, _flat(cache), mask,
                                 interpret=True)

    flat = _flat(cache)
    kq, vq, kvs = kv_quantize_flat(flat["k"], flat["v"], DIMS.heads)
    got_h, got_cache = fused_decode_step(
        params, x, DIMS, posv, {"k": kq, "v": vq, "kvs": kvs}, mask,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got_h, np.float32),
                               np.asarray(ref_h, np.float32),
                               rtol=0.08, atol=0.08)
    # the written row at pos must be the quantized current k/v
    assert got_cache["k"].dtype == jnp.int8
    assert got_cache["kvs"].shape == (DIMS.layers, 4, 128, 256)

    kq5, ks5 = _kv_quantize(cache["k"].reshape(DIMS.layers, 4, 128,
                                               DIMS.heads, DIMS.head_dim))
    vq5, vs5 = _kv_quantize(cache["v"].reshape(DIMS.layers, 4, 128,
                                               DIMS.heads, DIMS.head_dim))
    qc5 = {"k": kq5, "v": vq5, "ks": ks5, "vs": vs5}
    ref2_h, _ = gpt2_decode_step(params, x, DIMS, posv, qc5, mask)
    np.testing.assert_allclose(np.asarray(got_h, np.float32),
                               np.asarray(ref2_h, np.float32),
                               rtol=0.1, atol=0.1)


def test_fused_decode_int8kv_multi_step_drift():
    """10 decode steps, fused flat-int8 vs XLA 5D int8kv from the same
    start: trajectories must stay close (both quantize each new row)."""
    from indextts_tpu.models.gpt.gpt2 import _kv_quantize, kv_quantize_flat

    params, x, cache, mask, posv = _setup(B=2, S=128, pos=40)
    flat = _flat(cache)
    kq, vq, kvs = kv_quantize_flat(flat["k"], flat["v"], DIMS.heads)
    cache_f = {"k": kq, "v": vq, "kvs": kvs}
    kq5, ks5 = _kv_quantize(cache["k"].reshape(DIMS.layers, 2, 128,
                                               DIMS.heads, DIMS.head_dim))
    vq5, vs5 = _kv_quantize(cache["v"].reshape(DIMS.layers, 2, 128,
                                               DIMS.heads, DIMS.head_dim))
    cache_x = {"k": kq5, "v": vq5, "ks": ks5, "vs": vs5}
    mk = np.asarray(mask).copy()
    nprng = np.random.default_rng(9)
    for step in range(10):
        pos = int(posv) + step
        mk[:, pos] = True
        m = jnp.asarray(mk)
        x_s = jnp.asarray(nprng.normal(0, 1.0, size=(2, DIMS.dim)),
                          jnp.bfloat16)
        p = jnp.asarray(pos, jnp.int32)
        f_h, cache_f = fused_decode_step(params, x_s, DIMS, p, cache_f, m,
                                         interpret=True)
        x_h, cache_x = gpt2_decode_step(params, x_s, DIMS, p, cache_x, m)
        np.testing.assert_allclose(np.asarray(f_h, np.float32),
                                   np.asarray(x_h, np.float32),
                                   rtol=0.15, atol=0.15)


def test_generate_fused_int8kv_runs(monkeypatch):
    """generate() with kv_quant=True routes through the fused kernel with
    the flat int8 cache (interpret mode): integration must run, be
    deterministic, and share the prefill-driven first token with the
    bf16-cache run."""
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
    params["gpt"] = quantize_gpt2_int8(params["gpt"])
    rng = np.random.default_rng(3)
    B, P = 2, 7
    prefix = jnp.asarray(rng.normal(0, 0.3, (B, P, cfg.model_dim)),
                         jnp.bfloat16)
    mask = jnp.ones((B, P), bool).at[0, 0].set(False)
    key = jax.random.PRNGKey(5)

    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")
    assert dec._fused_decode_ok(params, dims, B, kv_quant=True)
    # beam + int8kv composes too (ancestry selects bf16-cast values and
    # scale rows together)
    assert dec._fused_decode_ok(params, dims, B, kv_quant=True, beam=True)
    dec.generate.clear_cache()
    sq = SamplingConfig(do_sample=False, kv_quant=True)
    toks_q, lens_q = dec.generate(params, cfg, dims, prefix, mask, key,
                                  max_new_tokens=4, sampling=sq)
    toks_q2, _ = dec.generate(params, cfg, dims, prefix, mask, key,
                              max_new_tokens=4, sampling=sq)
    sb = SamplingConfig(do_sample=False)
    toks_b, _ = dec.generate(params, cfg, dims, prefix, mask, key,
                             max_new_tokens=4, sampling=sb)
    dec.generate.clear_cache()
    np.testing.assert_array_equal(np.asarray(toks_q), np.asarray(toks_q2))
    np.testing.assert_array_equal(np.asarray(toks_q[:, 0]),
                                  np.asarray(toks_b[:, 0]))
    assert np.all(np.asarray(lens_q) >= 0)


def test_generate_adaptive_int8kv_span_growth(monkeypatch):
    """generate_adaptive + kv_quant: the span-growth pad must extend all
    three flat-int8 cache arrays (values AND the packed scale rows)."""
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
    params["gpt"] = quantize_gpt2_int8(params["gpt"])
    rng = np.random.default_rng(7)
    B, P = 2, 5
    prefix = jnp.asarray(rng.normal(0, 0.3, (B, P, cfg.model_dim)),
                         jnp.bfloat16)
    mask = jnp.ones((B, P), bool)
    key = jax.random.PRNGKey(11)
    sampling = SamplingConfig(do_sample=False, min_new_tokens=9,
                              kv_quant=True)

    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")
    toks, lens = dec.generate_adaptive(params, cfg, dims, prefix, mask, key,
                                       max_new_tokens=10, sampling=sampling,
                                       spans=(4,))
    assert toks.shape == (B, 10)
    assert np.all(np.asarray(lens) >= 9)


@pytest.mark.parametrize("K,B", [(2, 4), (3, 24)])
def test_fused_decode_step_anc_int8kv_parity(K, B):
    """Beam ancestry + int8 KV: selection on bf16-cast values with the
    packed scale rows riding the same selection must be BIT-identical to
    running the KVQ kernel on a physically ancestry-gathered int8 cache
    (B=24 exercises the 32-slot kv-block layout)."""
    from indextts_tpu.engine.beam import _anc_bs, _anc_flat
    from indextts_tpu.models.gpt.gpt2 import kv_quantize_flat

    S, pos = 128, 70
    params, x, cache, mask, posv = _setup(B=B, S=S, pos=pos)
    flat = _flat(cache)
    kq, vq, kvs = kv_quantize_flat(flat["k"], flat["v"], DIMS.heads)
    qflat = {"k": kq, "v": vq, "kvs": kvs}
    nprng = np.random.default_rng(42)
    anc = nprng.integers(0, K, size=(B, S)).astype(np.int32)
    idx = (np.arange(B)[:, None] // K) * K + anc
    gathered = {kk: jnp.asarray(np.asarray(v)[:, idx, np.arange(S), :])
                for kk, v in qflat.items()}

    ref_h, ref_cache = fused_decode_step(params, x, DIMS, posv, gathered,
                                         mask, interpret=True)
    got_h, got_cache = fused_decode_step(params, x, DIMS, posv, qflat, mask,
                                         interpret=True,
                                         anc=_anc_flat(jnp.asarray(anc), S,
                                                       _anc_bs(B)),
                                         group=K)
    np.testing.assert_array_equal(np.asarray(got_h, np.float32),
                                  np.asarray(ref_h, np.float32))
    for key in ("k", "v", "kvs"):
        np.testing.assert_array_equal(
            np.asarray(got_cache[key][:, :, pos], np.float32),
            np.asarray(ref_cache[key][:, :, pos], np.float32))


def test_beam_fused_int8kv_runs(monkeypatch):
    """generate_beam + kv_quant routes through the fused kernel with the
    flat int8 cache and in-kernel ancestry (interpret mode)."""
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
    params["gpt"] = quantize_gpt2_int8(params["gpt"])
    rng = np.random.default_rng(3)
    B, P = 1, 7
    prefix = jnp.asarray(rng.normal(0, 0.3, (B, P, cfg.model_dim)),
                         jnp.bfloat16)
    mask = jnp.ones((B, P), bool)
    key = jax.random.PRNGKey(5)
    sampling = SamplingConfig(do_sample=False, num_beams=2, kv_quant=True)

    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")
    toks, lens = bm.generate_beam(params, cfg, dims, prefix, mask, key,
                                  max_new_tokens=4, sampling=sampling)
    assert toks.shape == (B, 4)
    assert np.all(np.asarray(lens) >= 0)
    assert np.all((np.asarray(toks) >= 0) & (np.asarray(toks) < 50))


def test_group_beam_anc_matches_gather(monkeypatch):
    """generate_group_beam's in-kernel ancestry (group=Kg: reorders never
    cross a sub-group) is token-identical to the per-step cache-gather
    path through the fused kernel in interpret mode. K=4 G=2 at B=2 (8
    flat rows, 64-slot layout) and B=4 (16 rows, 32-slot layout)."""
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
    params["gpt"] = quantize_gpt2_int8(params["gpt"])
    rng = np.random.default_rng(3)
    key = jax.random.PRNGKey(5)
    samp = SamplingConfig(do_sample=False, num_beams=4, num_beam_groups=2,
                          diversity_penalty=1.0, repetition_penalty=1.3,
                          length_penalty=1.0)
    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")
    for B in (2, 4):
        P = 7
        prefix = jnp.asarray(rng.normal(0, 0.3, (B, P, cfg.model_dim)),
                             jnp.bfloat16)
        mask = jnp.ones((B, P), bool).at[0, 0].set(False)
        monkeypatch.setenv("INDEXTTS_BEAM_ANC", "0")
        bm.generate_group_beam.clear_cache()
        t_ref, l_ref = bm.generate_group_beam(
            params, cfg, dims, prefix, mask, key, max_new_tokens=8,
            sampling=samp)
        assert bm.last_use_anc is False
        monkeypatch.setenv("INDEXTTS_BEAM_ANC", "1")
        bm.generate_group_beam.clear_cache()
        t_anc, l_anc = bm.generate_group_beam(
            params, cfg, dims, prefix, mask, key, max_new_tokens=8,
            sampling=samp)
        assert bm.last_use_anc is True
        bm.generate_group_beam.clear_cache()
        np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_anc))
        np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_anc))

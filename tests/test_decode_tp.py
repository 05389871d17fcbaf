"""tp=2 fused decode kernel (shard_map + in-kernel RDMA all-reduce).

Cross-chip correctness is provable in this no-multichip environment via
`pltpu.InterpretParams`, which emulates the remote DMAs and semaphores of
`ops/pallas/decode_step_tp.py` across two CPU mesh devices. Parity target
is the single-chip fused kernel on the same int8 params: the tp split
changes only where the two row-parallel contractions are cut (1280 -> 2x640
and 5120 -> 2x2560, f32 partials summed in fixed lo+hi order), so hidden
states agree to f32-reassociation noise and the newly written k/v rows are
bit-identical (each is the same full-D contraction either way).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh

from indextts_tpu.models.gpt.gpt2 import GPT2Dims
from indextts_tpu.ops.pallas.decode_step import fused_decode_step
from indextts_tpu.ops.pallas.decode_step_tp import (gpt_tp_layout,
                                                    tp_decode_step)

from tests.test_decode_kernel import DIMS, _flat, _setup


def _tp_mesh():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 (virtual) devices")
    return Mesh(np.array(devs[:2]), ("tp",))


@pytest.mark.parametrize("B,S,pos", [(2, 128, 70), (4, 128, 0)])
def test_tp_decode_step_parity(B, S, pos):
    params, x, cache, mask, posv = _setup(B=B, S=S, pos=pos)
    flat = _flat(cache)
    mesh = _tp_mesh()

    ref_h, ref_cache = fused_decode_step(params, x, DIMS, posv, flat, mask,
                                         interpret=True)

    gpt_tp = gpt_tp_layout(params)
    got_pre, got_cache = tp_decode_step(
        mesh, gpt_tp, x, DIMS, posv, flat, mask,
        interpret=pltpu.InterpretParams())
    from indextts_tpu import nn

    got_h = nn.layer_norm(params["ln_f"], got_pre)

    np.testing.assert_allclose(np.asarray(got_h, np.float32),
                               np.asarray(ref_h, np.float32),
                               rtol=0.05, atol=0.05)
    # the new k/v row is the same full-D contraction on both paths
    for key in ("k", "v"):
        np.testing.assert_array_equal(
            np.asarray(got_cache[key][:, :, pos], np.float32),
            np.asarray(ref_cache[key][:, :, pos], np.float32))
    # untouched cache regions pass through unchanged
    for key in ("k", "v"):
        keep = np.arange(S) != pos
        np.testing.assert_array_equal(
            np.asarray(got_cache[key][:, :, keep], np.float32),
            np.asarray(flat[key][:, :, keep], np.float32))


def test_tp_decode_multi_step_drift():
    """3 consecutive tp steps track the single-chip kernel."""
    from indextts_tpu import nn

    params, x, cache, mask, _ = _setup(B=2, S=128, pos=60)
    mesh = _tp_mesh()
    gpt_tp = gpt_tp_layout(params)
    cache_t = _flat(cache)
    cache_f = _flat(cache)
    x_t = x_f = x
    m = np.array(mask)
    for step in range(3):
        pos = jnp.asarray(60 + step, jnp.int32)
        m[:, 60 + step] = True
        mk = jnp.asarray(m)
        f_h, cache_f = fused_decode_step(params, x_f, DIMS, pos, cache_f, mk,
                                         interpret=True)
        t_pre, cache_t = tp_decode_step(mesh, gpt_tp, x_t, DIMS, pos,
                                        cache_t, mk,
                                        interpret=pltpu.InterpretParams())
        t_h = nn.layer_norm(params["ln_f"], t_pre)
        np.testing.assert_allclose(np.asarray(t_h, np.float32),
                                   np.asarray(f_h, np.float32),
                                   rtol=0.08, atol=0.08)
        x_f = f_h.astype(jnp.bfloat16)[:, :1280]
        x_t = t_h.astype(jnp.bfloat16)[:, :1280]


def test_generate_tp_kernel_runs(monkeypatch):
    """generate() routes through the tp kernel when TP_MESH is set and the
    params carry the head-aligned layout; deterministic across calls."""
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig
    from indextts_tpu.engine import decode as dec
    from indextts_tpu.engine.decode import SamplingConfig
    from indextts_tpu.models.gpt.unified_voice import init_unified_voice
    from indextts_tpu.models.gpt.gpt2 import quantize_gpt2_int8
    from indextts_tpu.nn import InitRng

    cfg = GPTConfig(
        layers=2, model_dim=1280, heads=20, max_text_tokens=30,
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
    params["gpt"] = gpt_tp_layout(quantize_gpt2_int8(params["gpt"]))
    rng = np.random.default_rng(3)
    B, P = 2, 7
    prefix = jnp.asarray(rng.normal(0, 0.3, (B, P, cfg.model_dim)),
                         jnp.bfloat16)
    mask = jnp.ones((B, P), bool)
    key = jax.random.PRNGKey(5)
    sampling = SamplingConfig(do_sample=False)
    mesh = _tp_mesh()

    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")
    monkeypatch.setattr(dec, "TP_MESH", mesh)
    assert dec._fused_decode_ok(params, dims, B, kv_quant=False) == "tp"
    dec.generate.clear_cache()
    toks, lens = dec.generate(params, cfg, dims, prefix, mask, key,
                              max_new_tokens=3, sampling=sampling)
    toks2, _ = dec.generate(params, cfg, dims, prefix, mask, key,
                            max_new_tokens=3, sampling=sampling)
    dec.generate.clear_cache()
    assert toks.shape == (B, 3)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
    assert np.all((np.asarray(toks) >= 0) & (np.asarray(toks) < 50))
    assert np.all(np.asarray(lens) >= 0)


@pytest.mark.parametrize("K,B", [(2, 4), (3, 12)])
def test_tp_decode_step_anc_parity(K, B):
    """Beam-ancestry selection composes with the tp=2 shard (r5): the
    where-chain acts on batch rows, orthogonal to the head-sliced Dl axis,
    so the unordered-cache + anc-map run must be BIT-identical to the tp
    kernel on a physically ancestry-gathered cache — same guarantee the
    single-chip kernel proves in test_decode_kernel.py. B*K <= 12 is the
    gate (64-slot kv blocks; engine/decode.py::_fused_decode_ok)."""
    from indextts_tpu.engine.beam import _anc_flat

    S, pos = 128, 70
    params, x, cache, mask, posv = _setup(B=B, S=S, pos=pos)
    nprng = np.random.default_rng(42)
    anc = nprng.integers(0, K, size=(B, S)).astype(np.int32)
    flat = _flat(cache)
    idx = (np.arange(B)[:, None] // K) * K + anc            # (B, S) abs rows
    gathered = {kk: jnp.asarray(np.asarray(v)[:, idx, np.arange(S), :])
                for kk, v in flat.items()}
    mesh = _tp_mesh()
    gpt_tp = gpt_tp_layout(params)

    ref_h, ref_cache = tp_decode_step(mesh, gpt_tp, x, DIMS, posv, gathered,
                                      mask, interpret=pltpu.InterpretParams())
    got_h, got_cache = tp_decode_step(mesh, gpt_tp, x, DIMS, posv, flat, mask,
                                      anc=_anc_flat(jnp.asarray(anc), S, 64),
                                      group=K,
                                      interpret=pltpu.InterpretParams())
    np.testing.assert_array_equal(np.asarray(got_h, np.float32),
                                  np.asarray(ref_h, np.float32))
    # the newly written row is each slot's own k/v in both schemes
    for key in ("k", "v"):
        np.testing.assert_array_equal(
            np.asarray(got_cache[key][:, :, pos], np.float32),
            np.asarray(ref_cache[key][:, :, pos], np.float32))


def test_generate_beam_tp_kernel(monkeypatch):
    """generate_beam routes through the tp kernel with in-kernel ancestry
    (the reference's DEFAULT decode is num_beams=3, infer_v2.py:532) and is
    token-identical to the gather path on the same tp kernel."""
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig
    from indextts_tpu.engine import decode as dec
    from indextts_tpu.engine.beam import generate_beam
    from indextts_tpu.engine.decode import SamplingConfig
    from indextts_tpu.models.gpt.unified_voice import init_unified_voice
    from indextts_tpu.models.gpt.gpt2 import quantize_gpt2_int8
    from indextts_tpu.nn import InitRng

    cfg = GPTConfig(
        layers=2, model_dim=1280, heads=20, max_text_tokens=30,
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
    params["gpt"] = gpt_tp_layout(quantize_gpt2_int8(params["gpt"]))
    rng = np.random.default_rng(3)
    B, P, K = 1, 7, 3
    prefix = jnp.asarray(rng.normal(0, 0.3, (B, P, cfg.model_dim)),
                         jnp.bfloat16)
    mask = jnp.ones((B, P), bool)
    key = jax.random.PRNGKey(5)
    sampling = SamplingConfig(do_sample=False, num_beams=K)
    mesh = _tp_mesh()

    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")
    monkeypatch.setattr(dec, "TP_MESH", mesh)
    assert dec._fused_decode_ok(params, dims, B * K, kv_quant=False,
                                beam=True) == "tp"
    generate_beam.clear_cache()
    monkeypatch.setenv("INDEXTTS_BEAM_ANC", "1")
    toks_a, lens_a = generate_beam(params, cfg, dims, prefix, mask, key,
                                   max_new_tokens=3, sampling=sampling)
    generate_beam.clear_cache()
    monkeypatch.setenv("INDEXTTS_BEAM_ANC", "0")
    toks_g, lens_g = generate_beam(params, cfg, dims, prefix, mask, key,
                                   max_new_tokens=3, sampling=sampling)
    generate_beam.clear_cache()
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_g))
    np.testing.assert_array_equal(np.asarray(lens_a), np.asarray(lens_g))
    assert np.all((np.asarray(toks_a) >= 0) & (np.asarray(toks_a) < 50))


def test_generate_group_beam_tp_kernel(monkeypatch):
    """generate_group_beam composes with the tp=2 fused kernel: the
    ancestry where-chain runs at group=Kg (reorders never cross a
    sub-group) on batch rows, orthogonal to the head-sliced Dl axis;
    anc and gather paths are token-identical."""
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig
    from indextts_tpu.engine import decode as dec
    from indextts_tpu.engine import beam as bm
    from indextts_tpu.engine.decode import SamplingConfig
    from indextts_tpu.models.gpt.unified_voice import init_unified_voice
    from indextts_tpu.models.gpt.gpt2 import quantize_gpt2_int8
    from indextts_tpu.nn import InitRng

    cfg = GPTConfig(
        layers=2, model_dim=1280, heads=20, max_text_tokens=30,
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
    params["gpt"] = gpt_tp_layout(quantize_gpt2_int8(params["gpt"]))
    rng = np.random.default_rng(3)
    B, P, K, G = 1, 7, 4, 2
    prefix = jnp.asarray(rng.normal(0, 0.3, (B, P, cfg.model_dim)),
                         jnp.bfloat16)
    mask = jnp.ones((B, P), bool)
    key = jax.random.PRNGKey(5)
    sampling = SamplingConfig(do_sample=False, num_beams=K,
                              num_beam_groups=G, diversity_penalty=1.0,
                              repetition_penalty=1.3, length_penalty=1.0)
    mesh = _tp_mesh()

    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")
    monkeypatch.setattr(dec, "TP_MESH", mesh)
    assert dec._fused_decode_ok(params, dims, B * K, kv_quant=False,
                                beam=True) == "tp"
    bm.generate_group_beam.clear_cache()
    monkeypatch.setenv("INDEXTTS_BEAM_ANC", "1")
    toks_a, lens_a = bm.generate_group_beam(params, cfg, dims, prefix, mask,
                                            key, max_new_tokens=3,
                                            sampling=sampling)
    assert bm.last_use_anc is True
    bm.generate_group_beam.clear_cache()
    monkeypatch.setenv("INDEXTTS_BEAM_ANC", "0")
    toks_g, lens_g = bm.generate_group_beam(params, cfg, dims, prefix, mask,
                                            key, max_new_tokens=3,
                                            sampling=sampling)
    bm.generate_group_beam.clear_cache()
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_g))
    np.testing.assert_array_equal(np.asarray(lens_a), np.asarray(lens_g))
    assert np.all((np.asarray(toks_a) >= 0) & (np.asarray(toks_a) < 50))

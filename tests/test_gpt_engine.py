"""GPT backbone + decode engine tests (tiny dims, CPU).

Key invariant: the incremental KV-cached decode path must produce exactly the
same hidden states as the full-sequence forward (this is what the reference
relies on HF past-KV for).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indextts_tpu.config import ConditionModuleConfig, GPTConfig
from indextts_tpu.engine.decode import SamplingConfig, generate
from indextts_tpu.models.gpt import gpt2
from indextts_tpu.models.gpt.unified_voice import (init_unified_voice,
                                                   prepare_prefix_embeds)
from indextts_tpu.nn import InitRng


TINY = GPTConfig(
    layers=2, model_dim=64, heads=4, max_text_tokens=30, max_mel_tokens=60,
    number_text_tokens=40, number_mel_codes=50, start_mel_token=48,
    stop_mel_token=49,
    condition_module=ConditionModuleConfig(output_size=32, linear_units=48,
                                           attention_heads=2, num_blocks=1,
                                           input_layer="linear", perceiver_mult=2),
    emo_condition_module=ConditionModuleConfig(output_size=32, linear_units=48,
                                               attention_heads=2, num_blocks=1,
                                               input_layer="linear", perceiver_mult=2),
)


@pytest.fixture(scope="module")
def dims():
    return gpt2.GPT2Dims(TINY.layers, TINY.model_dim, TINY.heads)


@pytest.fixture(scope="module")
def gpt_params(dims):
    return gpt2.init_gpt2(InitRng(0), dims)


def test_prefill_matches_forward(gpt_params, dims, rng):
    B, T = 2, 9
    x = jnp.asarray(rng.standard_normal((B, T, dims.dim)), jnp.float32)
    mask = jnp.ones((B, T), bool)
    full = gpt2.gpt2_forward(gpt_params, x, dims, attn_mask=mask)
    kv = gpt2.init_kv_cache(dims, B, T + 4, dtype=jnp.float32)
    pre, kv = gpt2.gpt2_prefill(gpt_params, x, dims, mask, kv)
    np.testing.assert_allclose(np.asarray(full), np.asarray(pre), atol=1e-5)


def test_decode_step_matches_forward(gpt_params, dims, rng):
    """Full forward over T+K tokens == prefill(T) + K decode steps."""
    B, T, K = 2, 6, 4
    S = T + K
    x = jnp.asarray(rng.standard_normal((B, S, dims.dim)), jnp.float32)
    mask = jnp.ones((B, S), bool)
    full = gpt2.gpt2_forward(gpt_params, x, dims, attn_mask=mask)

    kv = gpt2.init_kv_cache(dims, B, S, dtype=jnp.float32)
    _, kv = gpt2.gpt2_prefill(gpt_params, x[:, :T], dims, mask[:, :T], kv)
    kv_valid = jnp.concatenate([jnp.ones((B, T), bool), jnp.zeros((B, K), bool)], 1)
    outs = []
    for i in range(K):
        pos = T + i
        kv_valid = kv_valid.at[:, pos].set(True)
        h, kv = gpt2.gpt2_decode_step(gpt_params, x[:, pos], dims, pos, kv, kv_valid)
        outs.append(h)
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full[:, T:]), np.asarray(inc), atol=2e-5)


def test_left_padded_prefix_equivalence(gpt_params, dims, rng):
    """A left-padded row must produce the same last-position hidden state as
    the unpadded sequence (the contract prepare_gpt_inputs relies on)."""
    T, P = 5, 8
    x = jnp.asarray(rng.standard_normal((1, T, dims.dim)), jnp.float32)
    full = gpt2.gpt2_forward(gpt_params, x, dims, attn_mask=jnp.ones((1, T), bool))

    xp = jnp.concatenate([jnp.zeros((1, P - T, dims.dim), jnp.float32), x], axis=1)
    maskp = jnp.concatenate([jnp.zeros((1, P - T), bool), jnp.ones((1, T), bool)], 1)
    fullp = gpt2.gpt2_forward(gpt_params, xp, dims, attn_mask=maskp)
    np.testing.assert_allclose(np.asarray(full[:, -1]), np.asarray(fullp[:, -1]), atol=1e-5)


@pytest.fixture(scope="module")
def uv_params():
    return init_unified_voice(InitRng(1), TINY)


def test_prepare_prefix_embeds_layout(uv_params):
    cfg = TINY
    B, L = 2, 6
    text = jnp.asarray([[5, 6, 7, 8, 0, 0], [9, 10, 11, 12, 13, 14]], jnp.int32)
    lens = jnp.asarray([4, 6], jnp.int32)
    conds = jnp.asarray(np.random.default_rng(3).standard_normal((B, 3, cfg.model_dim)), jnp.float32)
    P = 3 + L + 2
    emb, mask = prepare_prefix_embeds(uv_params, cfg, conds, text, lens, P)
    assert emb.shape == (B, P, cfg.model_dim)
    # row 0: content len = 3 + 4 + 2 = 9, so 2 pad slots on the left
    assert not bool(mask[0, 0]) and not bool(mask[0, 1]) and bool(mask[0, 2])
    assert bool(mask.all(axis=1)[1])  # row 1 exactly fills the buffer
    # left pads are zeroed
    np.testing.assert_allclose(np.asarray(emb[0, :2]), 0.0)
    # conds land right after the pads
    np.testing.assert_allclose(np.asarray(emb[0, 2:5]), np.asarray(conds[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[1, 0:3]), np.asarray(conds[1]), atol=1e-6)


def test_generate_shapes_and_stop(uv_params, dims):
    cfg = TINY
    B, L = 2, 4
    text = jnp.asarray([[5, 6, 7, 8], [9, 10, 11, 3]], jnp.int32)
    lens = jnp.asarray([4, 4], jnp.int32)
    conds = jnp.zeros((B, 3, cfg.model_dim), jnp.float32)
    P = 3 + L + 2
    emb, mask = prepare_prefix_embeds(uv_params, cfg, conds, text, lens, P)
    codes, lengths = generate(
        uv_params, cfg, dims, emb, mask, jax.random.PRNGKey(0),
        max_new_tokens=12, sampling=SamplingConfig(temperature=1.0, top_k=0,
                                                   top_p=1.0, repetition_penalty=1.0),
        dtype=jnp.float32)
    codes = np.asarray(codes)
    lengths = np.asarray(lengths)
    assert codes.shape == (B, 12)
    assert lengths.shape == (B,)
    for b in range(B):
        # everything past the first stop is stop-padded
        stops = np.where(codes[b] == cfg.stop_mel_token)[0]
        if len(stops) and stops[0] < 12:
            assert lengths[b] == stops[0]
            assert (codes[b, stops[0]:] == cfg.stop_mel_token).all()


def test_generate_greedy_deterministic(uv_params, dims):
    cfg = TINY
    text = jnp.asarray([[5, 6, 7]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)
    conds = jnp.zeros((1, 2, cfg.model_dim), jnp.float32)
    emb, mask = prepare_prefix_embeds(uv_params, cfg, conds, text, lens, 7)
    s = SamplingConfig(do_sample=False, repetition_penalty=1.0)
    c1, _ = generate(uv_params, cfg, dims, emb, mask, jax.random.PRNGKey(0),
                     max_new_tokens=8, sampling=s, dtype=jnp.float32)
    c2, _ = generate(uv_params, cfg, dims, emb, mask, jax.random.PRNGKey(7),
                     max_new_tokens=8, sampling=s, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_min_new_tokens_blocks_stop(uv_params, dims):
    """HF MinNewTokensLengthLogitsProcessor semantics: stop cannot be emitted
    before min_new_tokens codes exist, in both decode paths."""
    from indextts_tpu.engine.decode import generate_adaptive

    cfg = TINY
    text = jnp.asarray([[5, 6, 7]], jnp.int32)
    conds = jnp.zeros((1, 2, cfg.model_dim), jnp.float32)
    emb, mask = prepare_prefix_embeds(uv_params, cfg, conds, text,
                                      jnp.asarray([3]), 7)
    s = SamplingConfig(temperature=1.0, top_k=0, top_p=1.0,
                       repetition_penalty=1.0, min_new_tokens=10)
    for fn, kw in ((generate, {}), (generate_adaptive, {"spans": (4, 8)})):
        codes, lengths = fn(uv_params, cfg, dims, emb, mask,
                            jax.random.PRNGKey(5), max_new_tokens=14,
                            sampling=s, dtype=jnp.float32, **kw)
        codes, lengths = np.asarray(codes), np.asarray(lengths)
        assert (codes[0, :10] != cfg.stop_mel_token).all()
        assert lengths[0] >= 10


def test_batched_rows_match_sequential_greedy(uv_params, dims):
    """Decoding B left-padded segments as one batch must give each row the
    same greedy codes as decoding it alone (the batched-segment pipeline
    relies on this row independence)."""
    from indextts_tpu.engine.decode import generate_adaptive

    cfg = TINY
    texts = [[5, 6, 7, 8], [9, 10, 11], [12, 13, 14, 15]]
    L = max(len(t) for t in texts)
    mat = np.zeros((len(texts), L), np.int32)
    for i, t in enumerate(texts):
        mat[i, :len(t)] = t
    lens = jnp.asarray([len(t) for t in texts])
    conds = jnp.zeros((len(texts), 3, cfg.model_dim), jnp.float32)
    P = 3 + L + 2
    s = SamplingConfig(do_sample=False, repetition_penalty=1.0)
    emb, mask = prepare_prefix_embeds(uv_params, cfg, conds, jnp.asarray(mat),
                                      lens, P)
    bc, bl = generate_adaptive(uv_params, cfg, dims, emb, mask,
                               jax.random.PRNGKey(0), max_new_tokens=12,
                               sampling=s, dtype=jnp.float32, spans=(6,))
    for i, t in enumerate(texts):
        e1, m1 = prepare_prefix_embeds(uv_params, cfg, conds[i:i + 1],
                                       jnp.asarray(mat[i:i + 1]), lens[i:i + 1], P)
        c1, l1 = generate_adaptive(uv_params, cfg, dims, e1, m1,
                                   jax.random.PRNGKey(9), max_new_tokens=12,
                                   sampling=s, dtype=jnp.float32, spans=(6,))
        np.testing.assert_array_equal(np.asarray(bc[i]), np.asarray(c1[0]))
        assert int(bl[i]) == int(l1[0])


def test_generate_adaptive_matches_generate(uv_params, dims):
    """Growing-cache decode must be token-identical to the fixed-cache path."""
    from indextts_tpu.engine.decode import generate_adaptive

    cfg = TINY
    text = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    conds = jnp.zeros((1, 3, cfg.model_dim), jnp.float32)
    emb, mask = prepare_prefix_embeds(uv_params, cfg, conds, text,
                                      jnp.asarray([4]), 9)
    for s in (SamplingConfig(do_sample=False, repetition_penalty=1.0),
              SamplingConfig(temperature=1.0, top_k=10, top_p=0.9,
                             repetition_penalty=2.0)):
        ref_c, ref_l = generate(uv_params, cfg, dims, emb, mask,
                                jax.random.PRNGKey(3), max_new_tokens=20,
                                sampling=s, dtype=jnp.float32)
        ada_c, ada_l = generate_adaptive(uv_params, cfg, dims, emb, mask,
                                         jax.random.PRNGKey(3),
                                         max_new_tokens=20, sampling=s,
                                         dtype=jnp.float32, spans=(4, 9, 14))
        np.testing.assert_array_equal(np.asarray(ref_c), np.asarray(ada_c))
        np.testing.assert_array_equal(np.asarray(ref_l), np.asarray(ada_l))


def test_decode_step_int8_kv_close():
    """int8 KV cache decode stays numerically close to the bf16 cache
    (per-position, per-head scales; error ~1/127 of the value range)."""
    from indextts_tpu.models.gpt.gpt2 import (GPT2Dims, gpt2_decode_step,
                                              gpt2_prefill, init_gpt2,
                                              init_kv_cache)

    dims = GPT2Dims(2, 32, 4)
    params = init_gpt2(InitRng(0), dims)
    B, T, S = 2, 5, 9
    outs = []
    for quant in (False, True):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, T, dims.dim)), jnp.float32)
        xt = jnp.asarray(rng.standard_normal((B, dims.dim)), jnp.float32)
        mask = jnp.ones((B, T), bool)
        kv = init_kv_cache(dims, B, S, dtype=jnp.float32, quantized=quant)
        h, kv = gpt2_prefill(params, x, dims, mask, kv)
        kv_valid = jnp.zeros((B, S), bool).at[:, :T].set(True)
        hs = []
        for step in range(3):
            kv_valid = kv_valid.at[:, T + step].set(True)
            ht, kv = gpt2_decode_step(params, xt, dims, jnp.int32(T + step),
                                      kv, kv_valid)
            hs.append(np.asarray(ht))
        outs.append(np.stack(hs))
    ref, got = outs
    rel = np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9)
    assert rel < 0.01, rel


def test_generate_int8_kv_runs_and_matches_mostly():
    params = init_unified_voice(InitRng(4), TINY)
    dims = gpt2.GPT2Dims(TINY.layers, TINY.model_dim, TINY.heads)
    text = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    conds = jnp.zeros((1, 3, TINY.model_dim), jnp.float32)
    emb, mask = prepare_prefix_embeds(params, TINY, conds, text,
                                      jnp.asarray([4]), 9)
    s0 = SamplingConfig(do_sample=False, repetition_penalty=1.0)
    s1 = SamplingConfig(do_sample=False, repetition_penalty=1.0,
                        kv_quant=True)
    c0, l0 = generate(params, TINY, dims, emb, mask, jax.random.PRNGKey(0),
                      max_new_tokens=8, sampling=s0, dtype=jnp.float32)
    c1, l1 = generate(params, TINY, dims, emb, mask, jax.random.PRNGKey(0),
                      max_new_tokens=8, sampling=s1, dtype=jnp.float32)
    c0, c1 = np.asarray(c0)[0], np.asarray(c1)[0]
    n = min(int(np.asarray(l0)[0]), int(np.asarray(l1)[0]), 8)
    agree = float(np.mean(c0[:max(n, 1)] == c1[:max(n, 1)]))
    assert agree >= 0.75, (agree, c0, c1)

"""Speculative (prompt-lookup) decode == sequential decode, token for token.

`generate_spec` commits tokens with the SEQUENTIAL sampler's semantics (same
rng-split chain, same HF warper order, same fake-prefix repetition counts,
same min-length masking); the drafts only decide which PROGRAM computes the
logits. So its output must equal `generate()` no matter what is drafted:

- oracle drafts (the exact tokens `generate()` emits) — every chunk fully
  accepts, stressing the commit bookkeeping and the rng rewind;
- adversarial drafts (never match) — every chunk rejects at position 0,
  stressing kv_valid rollback and stale-slot overwrite on later steps;
- real prompt-lookup drafts — mixed accept/reject.

Reference has no speculative path (HF sample loop is one forward per token,
`indextts/gpt/transformers_generation_utils.py:2988-3065`); this is the
TPU-native lever past the B=1 weight-DMA floor (docs/KERNELS.md §1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indextts_tpu.config import ConditionModuleConfig, GPTConfig
from indextts_tpu.engine.decode import SamplingConfig, generate
from indextts_tpu.engine.speculative import _lookup_draft, generate_spec
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
                                           input_layer="linear",
                                           perceiver_mult=2),
    emo_condition_module=ConditionModuleConfig(output_size=32,
                                               linear_units=48,
                                               attention_heads=2,
                                               num_blocks=1,
                                               input_layer="linear",
                                               perceiver_mult=2),
)


@pytest.fixture(scope="module")
def dims():
    return gpt2.GPT2Dims(TINY.layers, TINY.model_dim, TINY.heads)


@pytest.fixture(scope="module")
def uv_params():
    return init_unified_voice(InitRng(1), TINY)


@pytest.fixture(scope="module")
def prefix(uv_params):
    text = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    conds = jnp.zeros((1, 3, TINY.model_dim), jnp.float32)
    return prepare_prefix_embeds(uv_params, TINY, conds, text,
                                 jnp.asarray([4]), 9)


SAMPLING = SamplingConfig(temperature=1.0, top_k=0, top_p=1.0,
                          repetition_penalty=1.3)


def _run_both(uv_params, dims, prefix, sampling, seed, max_new=24, gamma=4,
              **spec_kw):
    emb, mask = prefix
    ref_c, ref_l = generate(uv_params, TINY, dims, emb, mask,
                            jax.random.PRNGKey(seed), max_new_tokens=max_new,
                            sampling=sampling, dtype=jnp.float32)
    spec_c, spec_l, _ = generate_spec(uv_params, TINY, dims, emb, mask,
                                      jax.random.PRNGKey(seed),
                                      max_new_tokens=max_new,
                                      sampling=sampling, dtype=jnp.float32,
                                      gamma=gamma, **spec_kw)
    return (np.asarray(ref_c), np.asarray(ref_l), np.asarray(spec_c),
            np.asarray(spec_l))


@pytest.mark.parametrize("seed", [0, 3, 11])
def test_oracle_drafts_match(uv_params, dims, prefix, seed):
    emb, mask = prefix
    ref_c, ref_l = generate(uv_params, TINY, dims, emb, mask,
                            jax.random.PRNGKey(seed), max_new_tokens=24,
                            sampling=SAMPLING, dtype=jnp.float32)
    spec_c, spec_l, stats = generate_spec(
        uv_params, TINY, dims, emb, mask, jax.random.PRNGKey(seed),
        max_new_tokens=24, sampling=SAMPLING, dtype=jnp.float32, gamma=4,
        forced=True, draft_source=ref_c[0])
    np.testing.assert_array_equal(np.asarray(spec_c), np.asarray(ref_c))
    np.testing.assert_array_equal(np.asarray(spec_l), np.asarray(ref_l))
    chunks, committed, singles = (int(v) for v in np.asarray(stats))
    # oracle drafts fully accept (gamma+1 = 5 tokens per chunk verify); a
    # no-early-stop run is deterministic: tok0 at prefill, chunks at steps
    # 1/6/11/16, then the step+gamma+1 > 24 cap forces 3 single tail steps
    if int(np.asarray(ref_l)[0]) == 24:
        assert (chunks, committed, singles) == (4, 20, 3)
    else:
        assert chunks > 0 and committed >= chunks


@pytest.mark.parametrize("seed", [0, 5])
def test_adversarial_drafts_match(uv_params, dims, prefix, seed):
    """Drafts that never match: every chunk rejects at 0, committing one
    correction token — stale chunk slots must be invisible downstream."""
    emb, mask = prefix
    ref_c, ref_l = generate(uv_params, TINY, dims, emb, mask,
                            jax.random.PRNGKey(seed), max_new_tokens=24,
                            sampling=SAMPLING, dtype=jnp.float32)
    bad = (np.asarray(ref_c)[0] + 13) % (TINY.number_mel_codes - 2)
    spec_c, spec_l, stats = generate_spec(
        uv_params, TINY, dims, emb, mask, jax.random.PRNGKey(seed),
        max_new_tokens=24, sampling=SAMPLING, dtype=jnp.float32, gamma=4,
        forced=True, draft_source=jnp.asarray(bad, jnp.int32))
    np.testing.assert_array_equal(np.asarray(spec_c), np.asarray(ref_c))
    np.testing.assert_array_equal(np.asarray(spec_l), np.asarray(ref_l))
    chunks, committed, singles = (int(v) for v in np.asarray(stats))
    # full-reject: every chunk verify commits exactly its correction token
    assert chunks > 0 and committed == chunks


@pytest.mark.parametrize("seed,gamma,ngram", [(0, 4, 2), (2, 6, 3), (9, 3, 2)])
def test_lookup_drafts_match(uv_params, dims, prefix, seed, gamma, ngram):
    ref_c, ref_l, spec_c, spec_l = _run_both(uv_params, dims, prefix,
                                             SAMPLING, seed, gamma=gamma,
                                             ngram=ngram)
    np.testing.assert_array_equal(spec_c, ref_c)
    np.testing.assert_array_equal(spec_l, ref_l)


def test_greedy_matches(uv_params, dims, prefix):
    s = SamplingConfig(do_sample=False, repetition_penalty=1.0)
    ref_c, ref_l, spec_c, spec_l = _run_both(uv_params, dims, prefix, s, 1)
    np.testing.assert_array_equal(spec_c, ref_c)
    np.testing.assert_array_equal(spec_l, ref_l)


def test_greedy_repetitive_accepts(uv_params, dims, prefix):
    """Greedy with no repetition penalty tends to cycle — the lookup path
    must still be token-identical while (likely) accepting drafts."""
    s = SamplingConfig(do_sample=False, repetition_penalty=1.0,
                       min_new_tokens=20)
    ref_c, ref_l, spec_c, spec_l = _run_both(uv_params, dims, prefix, s, 4,
                                             max_new=32)
    np.testing.assert_array_equal(spec_c, ref_c)
    np.testing.assert_array_equal(spec_l, ref_l)


def test_min_new_tokens_respected(uv_params, dims, prefix):
    s = SamplingConfig(temperature=1.0, top_k=0, top_p=1.0,
                       repetition_penalty=1.0, min_new_tokens=12)
    ref_c, ref_l, spec_c, spec_l = _run_both(uv_params, dims, prefix, s, 7,
                                             max_new=20)
    np.testing.assert_array_equal(spec_c, ref_c)
    np.testing.assert_array_equal(spec_l, ref_l)
    assert (spec_l >= 12).all() or (spec_l == 20).all()


def test_lookup_draft_finds_most_recent():
    row = jnp.asarray([7, 8, 1, 2, 9, 1, 2, 3, 4, 5, 1, 2, 0, 0, 0, 0],
                      jnp.int32)
    # history = row[:12]; tail 2-gram = (1, 2); matches at j=2 and j=5;
    # j=5 needs continuation 7..10 inside history -> ok; most recent wins
    draft, have = _lookup_draft(row, jnp.int32(12), gamma=3, ngram=2)
    assert bool(have)
    np.testing.assert_array_equal(np.asarray(draft), [3, 4, 5])


def test_lookup_draft_no_match():
    row = jnp.asarray([1, 2, 3, 4, 5, 6, 0, 0], jnp.int32)
    _, have = _lookup_draft(row, jnp.int32(6), gamma=2, ngram=2)
    assert not bool(have)


def test_spec_interp_fused_composition(monkeypatch):
    """The TPU composition — fused Pallas single steps (interpret mode) +
    flat-cache chunk verifies — runs end-to-end, is deterministic, and
    honors the output contract. Cross-mode token equality is NOT asserted
    here: the fused kernel rounds q*k to bf16 (~1% logit noise, see
    test_generate_fused_token_parity), so on random weights a position
    computed by the chunk program in one run and the kernel in another can
    sample differently — the same accepted numerics delta that makes the
    kernel's tokens differ from the XLA path's. Sampler-chain exactness is
    pinned by the f32 XLA-path tests above."""
    from indextts_tpu.engine import decode as dec
    from indextts_tpu.models.gpt.gpt2 import quantize_gpt2_int8

    cfg = GPTConfig(
        layers=2, model_dim=640, heads=10, max_text_tokens=30,
        max_mel_tokens=80, number_text_tokens=40, number_mel_codes=50,
        start_mel_token=48, stop_mel_token=49,
        condition_module=ConditionModuleConfig(
            output_size=32, linear_units=48, attention_heads=2, num_blocks=1,
            input_layer="linear", perceiver_mult=2),
        emo_condition_module=ConditionModuleConfig(
            output_size=32, linear_units=48, attention_heads=2, num_blocks=1,
            input_layer="linear", perceiver_mult=2))
    dims_ = gpt2.GPT2Dims(cfg.layers, cfg.model_dim, cfg.heads)
    params = init_unified_voice(InitRng(0), cfg)
    params["gpt"] = quantize_gpt2_int8(params["gpt"])
    r = np.random.default_rng(3)
    emb = jnp.asarray(r.normal(0, 0.3, (1, 7, cfg.model_dim)), jnp.bfloat16)
    mask = jnp.ones((1, 7), bool)
    key = jax.random.PRNGKey(5)
    s = SamplingConfig(min_new_tokens=10)

    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "interp")
    assert dec._fused_decode_ok(params, dims_, 1, kv_quant=False)
    for kw in (dict(),
               dict(forced=True,
                    draft_source=jnp.full((16,), 7, jnp.int32))):
        c1, l1, st1 = generate_spec(params, cfg, dims_, emb, mask, key,
                                    max_new_tokens=16, sampling=s, gamma=3,
                                    **kw)
        c2, l2, st2 = generate_spec(params, cfg, dims_, emb, mask, key,
                                    max_new_tokens=16, sampling=s, gamma=3,
                                    **kw)
        np.testing.assert_array_equal(np.asarray(st1), np.asarray(st2))
        c1, l1 = np.asarray(c1), np.asarray(l1)
        np.testing.assert_array_equal(c1, np.asarray(c2))
        np.testing.assert_array_equal(l1, np.asarray(l2))
        assert c1.shape == (1, 16)
        stops = np.where(c1[0] == cfg.stop_mel_token)[0]
        if len(stops) and stops[0] < 16:
            assert l1[0] == stops[0]
            assert (c1[0, stops[0]:] == cfg.stop_mel_token).all()
        assert l1[0] >= 10 or l1[0] == 16  # min_new_tokens honored
    from indextts_tpu.engine.speculative import _spec_prefill_and_span

    _spec_prefill_and_span.clear_cache()


# ---------------------------------------------------------------------------
# self-gating adaptive driver (generate_spec_adaptive)
# ---------------------------------------------------------------------------

def _run_adaptive(uv_params, dims, prefix, seed, max_new=24, gamma=4,
                  **spec_kw):
    from indextts_tpu.engine.speculative import generate_spec_adaptive

    emb, mask = prefix
    ref_c, ref_l = generate(uv_params, TINY, dims, emb, mask,
                            jax.random.PRNGKey(seed), max_new_tokens=max_new,
                            sampling=SAMPLING, dtype=jnp.float32)
    a_c, a_l, stats = generate_spec_adaptive(
        uv_params, TINY, dims, emb, mask, jax.random.PRNGKey(seed),
        max_new_tokens=max_new, sampling=SAMPLING, dtype=jnp.float32,
        gamma=gamma, spans=(8, 16), **spec_kw)
    return (np.asarray(ref_c), np.asarray(ref_l), np.asarray(a_c),
            np.asarray(a_l), np.asarray(stats))


@pytest.mark.parametrize("seed", [0, 3, 11])
def test_adaptive_lookup_matches(uv_params, dims, prefix, seed):
    """Span-bounded, self-gating lookup decode == generate(), token for
    token, wherever the gate happens to trip (rng stream stays aligned
    across span boundaries AND the spec->plain demotion)."""
    ref_c, ref_l, a_c, a_l, _ = _run_adaptive(uv_params, dims, prefix, seed)
    np.testing.assert_array_equal(a_c, ref_c)
    np.testing.assert_array_equal(a_l, ref_l)


@pytest.mark.parametrize("seed", [0, 5])
def test_adaptive_oracle_stays_speculative(uv_params, dims, prefix, seed):
    """Oracle drafts fully accept, so the gate must KEEP speculating past
    the probe span: chunk verifies keep accumulating in later spans."""
    emb, mask = prefix
    ref_c, ref_l = generate(uv_params, TINY, dims, emb, mask,
                            jax.random.PRNGKey(seed), max_new_tokens=24,
                            sampling=SAMPLING, dtype=jnp.float32)
    ref_c, ref_l, a_c, a_l, stats = _run_adaptive(
        uv_params, dims, prefix, seed, forced=True,
        draft_source=jnp.asarray(np.asarray(ref_c)[0]))
    np.testing.assert_array_equal(a_c, ref_c)
    np.testing.assert_array_equal(a_l, ref_l)
    if int(ref_l[0]) == 24:
        # probe span (8): chunks at steps 1..; full accepts clear the
        # commit-ratio gate (5 commits/chunk vs 1.8), so spans 2 and 3
        # must also verify chunks — more than the probe alone could hold
        assert int(stats[0]) >= 3 and int(stats[1]) > 8


@pytest.mark.parametrize("seed", [0, 5])
def test_adaptive_adversarial_demotes(uv_params, dims, prefix, seed):
    """Never-matching drafts: every chunk commits exactly 1 token, the gate
    reads 1 < commit_ratio at the first span boundary and demotes — stats
    freeze at the probe span's counts, and the output still equals
    generate() exactly."""
    bad = jnp.full((24,), 47, jnp.int32)  # a code generate() never emits
    ref_c, ref_l, a_c, a_l, stats = _run_adaptive(
        uv_params, dims, prefix, seed, forced=True, draft_source=bad)
    assert not np.any(ref_c == 47)
    np.testing.assert_array_equal(a_c, ref_c)
    np.testing.assert_array_equal(a_l, ref_l)
    if int(ref_l[0]) == 24:
        # probe span (8 tokens, gamma=4): forced chunks fire while
        # step+5 <= 8 (steps 1,2,3 — each commits 1), then singles to step
        # 8. Demotion freezes stats there: no chunk past the probe span.
        chunks, committed, singles = (int(v) for v in stats)
        assert (chunks, committed, singles) == (3, 3, 4)


def test_adaptive_matches_full_range_spec(uv_params, dims, prefix):
    """With the gate forced open (commit_ratio=0), the span-bounded driver
    equals the single full-range spec program: the chunk guard composes
    with span ends without changing committed tokens."""
    from indextts_tpu.engine.speculative import generate_spec_adaptive

    emb, mask = prefix
    key = jax.random.PRNGKey(2)
    c1, l1, _ = generate_spec(uv_params, TINY, dims, emb, mask, key,
                              max_new_tokens=24, sampling=SAMPLING,
                              dtype=jnp.float32, gamma=4)
    c2, l2, _ = generate_spec_adaptive(uv_params, TINY, dims, emb, mask, key,
                                       max_new_tokens=24, sampling=SAMPLING,
                                       dtype=jnp.float32, gamma=4,
                                       spans=(8, 16), commit_ratio=0.0)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_spec_int8kv_matches(uv_params, dims, prefix):
    """Spec decode with the quantized KV cache (pipeline quantization=
    'int8kv' sets sampling.kv_quant) must equal generate() on the same
    config — the chunk step consumes the same cache variants as the
    single-token step. Now load-bearing: spec is default-on (r5)."""
    s = SamplingConfig(temperature=1.0, top_k=0, top_p=1.0,
                       repetition_penalty=1.3, kv_quant=True)
    ref_c, ref_l, spec_c, spec_l = _run_both(uv_params, dims, prefix, s, 2)
    np.testing.assert_array_equal(spec_c, ref_c)
    np.testing.assert_array_equal(spec_l, ref_l)


def test_spec_adaptive_int8kv_matches(uv_params, dims, prefix):
    """Same for the span-bounded self-gating driver (the shipping path)."""
    from indextts_tpu.engine.speculative import generate_spec_adaptive

    s = SamplingConfig(temperature=1.0, top_k=0, top_p=1.0,
                       repetition_penalty=1.3, kv_quant=True)
    emb, mask = prefix
    key = jax.random.PRNGKey(2)
    ref_c, ref_l = generate(uv_params, TINY, dims, emb, mask, key,
                            max_new_tokens=24, sampling=s, dtype=jnp.float32)
    a_c, a_l, _ = generate_spec_adaptive(uv_params, TINY, dims, emb, mask,
                                         key, max_new_tokens=24, sampling=s,
                                         dtype=jnp.float32, gamma=4,
                                         spans=(8, 16))
    np.testing.assert_array_equal(np.asarray(a_c), np.asarray(ref_c))
    np.testing.assert_array_equal(np.asarray(a_l), np.asarray(ref_l))


def test_spec_max_new_tokens_one(uv_params, dims, prefix):
    """max_new_tokens=1: the chunk branch cannot fit the width-1 token
    buffer even at trace time — both spec entry points must fall through
    to the prefill-only result and equal generate() (r5 review fix)."""
    from indextts_tpu.engine.speculative import generate_spec_adaptive

    emb, mask = prefix
    key = jax.random.PRNGKey(0)
    rc, rl = generate(uv_params, TINY, dims, emb, mask, key,
                      max_new_tokens=1, sampling=SAMPLING, dtype=jnp.float32)
    for fn in (generate_spec, generate_spec_adaptive):
        c, l, stats = fn(uv_params, TINY, dims, emb, mask, key,
                         max_new_tokens=1, sampling=SAMPLING,
                         dtype=jnp.float32, gamma=4)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(rc))
        np.testing.assert_array_equal(np.asarray(l), np.asarray(rl))
        np.testing.assert_array_equal(np.asarray(stats), [0, 0, 0])

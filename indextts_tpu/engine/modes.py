"""Auxiliary HF generation modes: contrastive search and DoLa decoding.

Replaces the reference's vendored `_contrastive_search`
(`gpt/transformers_generation_utils.py:2716-3123`) and `_dola_decoding`
(`:2503-2716`). Neither is used by the reference *pipeline*, but both are
reachable reference API surface: `inference_speech(**hf_generate_kwargs)`
(`gpt/model_v2.py:698`) forwards arbitrary generation kwargs, so
`penalty_alpha=...` / `dola_layers=...` dispatch these modes there. Group
(diverse) beam search lives in `engine/beam.py::generate_group_beam`; the
reference's `_assisted_decoding` has a stronger counterpart in
`engine/speculative.py` (prompt-lookup + chunk verify).

Both modes run the dense XLA decode path (single-token `gpt2_decode_step`)
— they are correctness/diagnostic surface, not the serving hot path, and
DoLa needs per-layer hiddens which the fused kernel does not expose.

Deterministic contracts (do_sample=False) are parity-tested token-for-token
against the executing reference (`tests/test_generation_modes.py` drives
the reference's own vendored GenerationMixin on a tiny UnifiedVoice).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from indextts_tpu.config import GPTConfig
from indextts_tpu.engine.decode import (SamplingConfig, _embed_mel_token,
                                        _min_len_mask)
from indextts_tpu.models.gpt.gpt2 import (GPT2Dims, gpt2_decode_step,
                                          gpt2_prefill, init_kv_cache)
from indextts_tpu.models.gpt.unified_voice import mel_logits_from_hidden
from indextts_tpu.nn import Params
from indextts_tpu.ops.sampling import (apply_repetition_penalty,
                                       apply_temperature, apply_top_k,
                                       apply_top_p)

NEG = jnp.float32(-1e9)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dims", "max_new_tokens", "sampling", "dtype"))
def generate_contrastive(params: Params, cfg: GPTConfig, dims: GPT2Dims,
                         prefix_embeds: jnp.ndarray, prefix_mask: jnp.ndarray,
                         rng: jax.Array, max_new_tokens: int,
                         sampling: SamplingConfig = SamplingConfig(),
                         dtype=jnp.bfloat16
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Contrastive search (HF `_contrastive_search`, low_memory=False).

    Per step: the current logits' top `sampling.top_k` candidates all run
    ONE batched decode step against a k-expanded cache; each candidate is
    re-ranked by (1 - alpha) * p(candidate) - alpha * max-cosine of its
    hidden vs every previous position's last-layer hidden (`_ranking_fast`,
    reference `:4490-4518`; pad positions masked via the attention mask).
    The winner's cache rows / hidden / logits carry forward — so the cache
    commit IS the HF `batch_select_indices` on the k-batch outputs.
    Deterministic; `rng` accepted for signature parity and unused.

    alpha = sampling.penalty_alpha. Output contract matches `generate()`:
    (codes (B, max_new_tokens), lengths (B,)); a finished row keeps its
    internal trajectory running on the selected candidates (HF appends pad
    to `input_ids` only), so the repetition-penalty counts see the pad
    token while the cosine context and logits follow the candidate — both
    faithfully replicated.
    """
    B, P, D = prefix_embeds.shape
    V = cfg.number_mel_codes
    k = sampling.top_k
    alpha = jnp.float32(sampling.penalty_alpha)
    stop = cfg.stop_mel_token
    # cache length == hidden-context length: both index pos = P+1+step
    S = P + 1 + max_new_tokens

    prefix_embeds = prefix_embeds.astype(dtype)
    start_tok = jnp.full((B,), cfg.start_mel_token, jnp.int32)
    start_emb = _embed_mel_token(params, start_tok, 0, dtype)
    seq = jnp.concatenate([prefix_embeds, start_emb[:, None, :]], axis=1)
    seq_mask = jnp.concatenate([prefix_mask, jnp.ones((B, 1), bool)], axis=1)

    kv = init_kv_cache(dims, B, S, dtype=dtype, quantized=sampling.kv_quant)
    hidden, kv = gpt2_prefill(params["gpt"], seq, dims, seq_mask, kv)
    logits0 = mel_logits_from_hidden(params, hidden[:, -1, :])

    # k-expand cache + validity (HF _expand_inputs_for_generation /
    # repeat_interleave: a row's k candidate lanes are adjacent)
    kv = {n: jnp.repeat(buf, k, axis=1) for n, buf in kv.items()}
    kv_valid = jnp.zeros((B * k, S), bool)
    kv_valid = jax.lax.dynamic_update_slice(
        kv_valid, jnp.repeat(seq_mask, k, axis=0), (0, 0))

    # last-layer hidden history for the degeneration penalty (f32 like HF's
    # .float() ranking math); prefill writes [0, P+1)
    ctx_h = jnp.zeros((B, S, D), jnp.float32)
    ctx_h = jax.lax.dynamic_update_slice(
        ctx_h, hidden.astype(jnp.float32), (0, 0, 0))
    ctx_v = jnp.zeros((B, S), bool)
    ctx_v = jax.lax.dynamic_update_slice(ctx_v, seq_mask, (0, 0))

    counts = jnp.zeros((B, V), jnp.int32)
    counts = counts.at[:, 1].add(P)
    counts = counts.at[:, cfg.start_mel_token].add(1)

    tokens0 = jnp.full((B, max_new_tokens), stop, jnp.int32)
    brange = jnp.arange(B)

    def cond(state):
        step, *_, finished, _ = state
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(finished))

    def body(state):
        (step, tokens, counts, kv, kv_valid, ctx_h, ctx_v, logit_next,
         finished, lengths) = state
        proc = apply_repetition_penalty(
            logit_next.astype(jnp.float32), counts,
            sampling.repetition_penalty)
        proc = _min_len_mask(proc, stop, step, sampling.min_new_tokens)
        probs = jax.nn.softmax(proc, axis=-1)
        tkp, tki = jax.lax.top_k(probs, k)                      # (B, k)

        # one batched step for all k candidates (token index `step` ->
        # mel pos step+2, cache slot P+1+step — same quirk as generate())
        x = _embed_mel_token(params, tki.reshape(B * k), step + 2, dtype)
        pos = P + 1 + step
        kv_valid = kv_valid.at[:, pos].set(True)
        h, kv = gpt2_decode_step(params["gpt"], x, dims, pos, kv, kv_valid)
        logits_k = mel_logits_from_hidden(params, h).reshape(B, k, V)
        hk = h.reshape(B, k, D).astype(jnp.float32)

        # degeneration penalty: max cosine vs the valid context positions
        nc = ctx_h / jnp.maximum(
            jnp.linalg.norm(ctx_h, axis=-1, keepdims=True), 1e-12)
        nk = hk / jnp.maximum(
            jnp.linalg.norm(hk, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("bcd,bkd->bkc", nc, nk)
        sim = jnp.where(ctx_v[:, None, :], sim, NEG)
        degen = jnp.max(sim, axis=-1)                           # (B, k)
        score = (1.0 - alpha) * tkp - alpha * degen
        sel = jnp.argmax(score, axis=-1)                        # (B,)

        tok_int = tki[brange, sel]          # internal trajectory (HF keeps
        tok_out = jnp.where(finished, stop, tok_int)  # it past EOS; only
        tokens = tokens.at[:, step].set(tok_out)      # input_ids get pad)
        counts = counts.at[brange, tok_out].add(1)

        # commit: every candidate lane of a row becomes the winner's lane
        gidx = jnp.repeat(brange * k + sel, k)
        kv = {n: buf[:, gidx] for n, buf in kv.items()}
        ctx_h = ctx_h.at[:, pos].set(hk[brange, sel])
        ctx_v = ctx_v.at[:, pos].set(True)
        logit_next = logits_k[brange, sel]

        newly = (~finished) & (tok_out == stop)
        lengths = jnp.where(newly, step, lengths)
        finished = finished | newly
        return (step + 1, tokens, counts, kv, kv_valid, ctx_h, ctx_v,
                logit_next, finished, lengths)

    state = (jnp.int32(0), tokens0, counts, kv, kv_valid, ctx_h, ctx_v,
             logits0, jnp.zeros((B,), bool),
             jnp.full((B,), max_new_tokens, jnp.int32))
    (_, tokens, *_rest, lengths) = jax.lax.while_loop(cond, body, state)
    arange = jnp.arange(max_new_tokens)[None, :]
    tokens = jnp.where(arange < lengths[:, None], tokens, stop)
    return tokens, lengths


def resolve_dola_layers(dola_layers, L: int) -> Tuple[int, ...]:
    """HF candidate-premature-layer selection
    (`transformers_generation_utils.py:2585-2620`). Indices are
    hidden-state indices: 0 = embeddings, i = input to block i. The
    reference's GPT2Config ties word embeddings (HF default), so 'low'
    starts at layer 2 (1 for two-layer models)."""
    start = 2 if L > 2 else (1 if L == 2 else 0)
    if dola_layers == "low":
        if start == L // 2:
            cands = [start]
        else:
            cands = (list(range(start, L // 2, 2)) if L <= 40
                     else list(range(start, 20, 2)))
    elif dola_layers == "high":
        cands = (list(range(L // 2, L, 2)) if L <= 40
                 else list(range(L - 20, L, 2)))
    elif isinstance(dola_layers, (list, tuple)):
        cands = [i for i in dola_layers if i < L]
    else:
        raise ValueError(
            "dola_layers must be 'low', 'high' or a sequence of ints, "
            f"got {dola_layers!r}")
    if not cands:
        raise ValueError(f"no DoLa candidate layers from {dola_layers!r}")
    return tuple(cands)


def _dola_contrast(cands: Tuple[int, ...], prem: jnp.ndarray,
                   mature: jnp.ndarray) -> jnp.ndarray:
    """`_dola_select_contrast` + `_relative_top_filter` (reference
    `:4678-4747`): pick the premature layer with max JSD vs the mature
    distribution (batch-mean, one layer for the whole batch), then return
    log_softmax(mature) - log_softmax(premature) with the adaptive
    plausibility constraint (tokens below 0.1 * max mature prob -> -inf).

    prem: (C, B, V) candidate premature logits; mature: (B, V).
    """
    mature = mature.astype(jnp.float32)
    prem = prem.astype(jnp.float32)
    if len(cands) == 1:
        base = prem[0]
    else:
        sm = jax.nn.softmax(mature, axis=-1)                    # (B, V)
        sp = jax.nn.softmax(prem, axis=-1)                      # (C, B, V)
        avg = 0.5 * (sm[None] + sp)
        # torch F.kl_div computes xlogy(target, target) - target*input, so
        # a token whose probability underflows to exactly 0 in f32
        # contributes 0, not 0*log(0)=NaN; log_softmax stays finite for
        # finite logits, so avg*log_p is safe
        a_log_a = jax.scipy.special.xlogy(avg, avg)
        kl1 = jnp.mean(a_log_a
                       - avg * jax.nn.log_softmax(mature, axis=-1)[None],
                       axis=-1)                                 # (C, B)
        kl2 = jnp.mean(a_log_a - avg * jax.nn.log_softmax(prem, axis=-1),
                       axis=-1)
        js = 0.5 * (kl1 + kl2)
        li = jnp.argmax(jnp.mean(js, axis=-1))                  # scalar
        base = jnp.take(prem, li, axis=0)
    sn = jax.nn.log_softmax(mature, axis=-1)
    bn = jax.nn.log_softmax(base, axis=-1)
    # relative_top=0.1, min_tokens_to_keep=1: threshold = max + log(0.1)
    thresh = jnp.max(sn, axis=-1, keepdims=True) + math.log(0.1)
    low = sn < thresh
    bn = jnp.where(low, -1e-3, bn)
    sn = jnp.where(low, -jnp.inf, sn)
    return sn - bn


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dims", "max_new_tokens", "sampling", "dtype"))
def generate_dola(params: Params, cfg: GPTConfig, dims: GPT2Dims,
                  prefix_embeds: jnp.ndarray, prefix_mask: jnp.ndarray,
                  rng: jax.Array, max_new_tokens: int,
                  sampling: SamplingConfig = SamplingConfig(),
                  dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DoLa decoding (HF `_dola_decoding`, reference `:2503-2716`).

    Each step contrasts the mature logits against the max-JSD premature
    layer's early-exit logits (the reference's lm_head = final_norm +
    mel_head applied to a raw block input — `model_v2.py:53,447`), applies
    the adaptive plausibility constraint, THEN the repetition penalty and
    (if do_sample) the standard warper chain. sampling.dola_layers: "low" /
    "high" / tuple of hidden-state indices. Dense path only (per-layer
    hiddens via gpt2_decode_step(collect_hiddens=True)).
    """
    B, P, D = prefix_embeds.shape
    V = cfg.number_mel_codes
    stop = cfg.stop_mel_token
    S = P + 1 + max_new_tokens
    cands = resolve_dola_layers(sampling.dola_layers, dims.layers)
    cidx = jnp.asarray(cands, jnp.int32)

    prefix_embeds = prefix_embeds.astype(dtype)
    start_tok = jnp.full((B,), cfg.start_mel_token, jnp.int32)
    start_emb = _embed_mel_token(params, start_tok, 0, dtype)
    seq = jnp.concatenate([prefix_embeds, start_emb[:, None, :]], axis=1)
    seq_mask = jnp.concatenate([prefix_mask, jnp.ones((B, 1), bool)], axis=1)

    kv = init_kv_cache(dims, B, S, dtype=dtype, quantized=sampling.kv_quant)
    hidden, kv, hs0 = gpt2_prefill(params["gpt"], seq, dims, seq_mask, kv,
                                   collect_hiddens=True)
    kv_valid = jnp.zeros((B, S), bool)
    kv_valid = jax.lax.dynamic_update_slice(kv_valid, seq_mask, (0, 0))

    counts = jnp.zeros((B, V), jnp.int32)
    counts = counts.at[:, 1].add(P)
    counts = counts.at[:, cfg.start_mel_token].add(1)
    brange = jnp.arange(B)

    def pick_token(mature, hs, counts, step, r):
        prem = mel_logits_from_hidden(params, hs[cidx])         # (C, B, V)
        logits = _dola_contrast(cands, prem, mature)
        logits = apply_repetition_penalty(logits, counts,
                                          sampling.repetition_penalty)
        logits = _min_len_mask(logits, stop, step, sampling.min_new_tokens)
        if not sampling.do_sample:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        w = apply_temperature(logits, sampling.temperature)
        w = apply_top_k(w, sampling.top_k)
        w = apply_top_p(w, sampling.top_p)
        return jax.random.categorical(r, w, axis=-1).astype(jnp.int32)

    rng, r0 = jax.random.split(rng)
    mature0 = mel_logits_from_hidden(params, hidden[:, -1, :])
    tok0 = pick_token(mature0, hs0, counts, jnp.int32(0), r0)
    tokens = jnp.full((B, max_new_tokens), stop, jnp.int32)
    tokens = tokens.at[:, 0].set(tok0)
    counts = counts.at[brange, tok0].add(1)
    finished0 = tok0 == stop
    lengths0 = jnp.where(finished0, 0, max_new_tokens)

    def cond(state):
        step, _, _, _, _, finished, _, _ = state
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(finished))

    def body(state):
        step, tokens, counts, kv, kv_valid, finished, lengths, rng = state
        prev_tok = tokens[:, step - 1]
        x = _embed_mel_token(params, prev_tok, step + 1, dtype)
        pos = P + 1 + step
        kv_valid = kv_valid.at[:, pos].set(True)
        h, kv, hs = gpt2_decode_step(params["gpt"], x, dims, pos, kv,
                                     kv_valid, collect_hiddens=True)
        mature = mel_logits_from_hidden(params, h)
        rng, r = jax.random.split(rng)
        tok = pick_token(mature, hs, counts, step, r)
        tok = jnp.where(finished, stop, tok)
        tokens = tokens.at[:, step].set(tok)
        counts = counts.at[brange, tok].add(1)
        newly = (~finished) & (tok == stop)
        lengths = jnp.where(newly, step, lengths)
        finished = finished | newly
        return (step + 1, tokens, counts, kv, kv_valid, finished, lengths,
                rng)

    state = (jnp.int32(1), tokens, counts, kv, kv_valid, finished0, lengths0,
             rng)
    (_, tokens, _, _, _, _, lengths, _) = jax.lax.while_loop(cond, body,
                                                             state)
    arange = jnp.arange(max_new_tokens)[None, :]
    tokens = jnp.where(arange < lengths[:, None], tokens, stop)
    return tokens, lengths

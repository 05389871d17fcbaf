"""In-XLA beam search / beam sample for the AR decode engine.

Replaces HF `_beam_search` / `_beam_sample`
(`gpt/transformers_generation_utils.py:3325`) — the reference's *default*
decode mode is num_beams=3 with do_sample=True (`infer_v2.py:526-534`).

Semantics (matching HF BeamSearchScorer, early_stopping=False):
- beam_scores init [0, -inf, ...] so step one expands only beam 0
- per step: log_softmax -> repetition penalty (processor) -> + beam score;
  deterministic mode takes top 2K of the flattened K*V candidates; sample mode
  (do_sample=True) warps (temperature/top-k/top-p) and draws 2K Gumbel samples
- candidates scan in score order: an EOS candidate (from a top-K rank) closes
  a hypothesis; others fill the K live beam slots
- termination: all hyp slots filled AND worst hyp >= best live beam score
  (length_penalty=0 form), or max_new_tokens reached
- finalize: live beams are force-closed as hypotheses; best hypothesis wins.

The KV cache carries a beam axis and is gathered per step (K is 3; the
prefix region is identical across beams so the gather is cheap to schedule).
"""

from __future__ import annotations

import functools
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
from indextts_tpu.ops.sampling import (apply_repetition_penalty, apply_temperature,
                                       apply_top_k, apply_top_p)

NEG = jnp.float32(-1e9)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dims", "max_new_tokens", "sampling", "dtype"))
def generate_beam(params: Params, cfg: GPTConfig, dims: GPT2Dims,
                  prefix_embeds: jnp.ndarray, prefix_mask: jnp.ndarray,
                  rng: jax.Array, max_new_tokens: int,
                  sampling: SamplingConfig = SamplingConfig(),
                  dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam decode for a SINGLE input row (B=1 prefix).

    Returns (codes (1, max_new_tokens), lengths (1,)) like generate().
    """
    K = sampling.num_beams
    B, P, D = prefix_embeds.shape
    assert B == 1, "beam decode expands one row into K beams"
    V = cfg.number_mel_codes
    S = P + 1 + max_new_tokens
    stop = cfg.stop_mel_token
    lp = sampling.length_penalty

    # replicate prefix across beams
    pe = jnp.broadcast_to(prefix_embeds.astype(dtype), (K, P, D))
    pm = jnp.broadcast_to(prefix_mask, (K, P))
    start_tok = jnp.full((K,), cfg.start_mel_token, jnp.int32)
    seq = jnp.concatenate([pe, _embed_mel_token(params, start_tok, 0, dtype)[:, None, :]],
                          axis=1)
    seq_mask = jnp.concatenate([pm, jnp.ones((K, 1), bool)], axis=1)
    kv = init_kv_cache(dims, K, S, dtype=dtype)
    hidden, kv = gpt2_prefill(params["gpt"], seq, dims, seq_mask, kv)
    logits0 = mel_logits_from_hidden(params, hidden[:, -1, :])

    kv_valid = jnp.zeros((K, S), bool)
    kv_valid = jax.lax.dynamic_update_slice(kv_valid, seq_mask, (0, 0))

    counts0 = jnp.zeros((K, V), jnp.int32)
    counts0 = counts0.at[:, 1].add(P)
    counts0 = counts0.at[:, cfg.start_mel_token].add(1)

    beam_scores0 = jnp.concatenate([jnp.zeros((1,)), jnp.full((K - 1,), NEG)])

    tokens0 = jnp.full((K, max_new_tokens), stop, jnp.int32)
    hyp_scores0 = jnp.full((K,), -jnp.inf, jnp.float32)
    hyp_tokens0 = jnp.full((K, max_new_tokens), stop, jnp.int32)
    hyp_lens0 = jnp.zeros((K,), jnp.int32)

    def select_candidates(scores_kv, rng_step):
        """scores_kv (K, V) combined scores -> (2K,) (beam, token, score)."""
        flat = scores_kv.reshape(-1)
        if sampling.do_sample:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(rng_step, flat.shape, minval=1e-20, maxval=1.0)))
            order_scores = jnp.where(flat <= NEG / 2, NEG, flat + g)
            _, idx = jax.lax.top_k(order_scores, 2 * K)
            cand_scores = flat[idx]
        else:
            cand_scores, idx = jax.lax.top_k(flat, 2 * K)
        return idx // V, idx % V, cand_scores

    def step_scores(logits, counts, beam_scores):
        lf = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lf = apply_repetition_penalty(lf, counts, sampling.repetition_penalty)
        combined = lf + beam_scores[:, None]
        if sampling.do_sample:
            combined = apply_temperature(combined, sampling.temperature)
            combined = apply_top_k(combined, sampling.top_k)
            combined = apply_top_p(combined, sampling.top_p)
        return combined

    def process(cand_beams, cand_toks, cand_scores, step, hyp_scores,
                hyp_tokens, hyp_lens, tokens):
        """BeamSearchScorer.process: fill K live slots, close EOS hyps."""
        is_eos = cand_toks == stop
        # hyp insertion: EOS candidates with rank < K
        rank = jnp.arange(2 * K)
        eos_ok = is_eos & (rank < K)

        def add_hyp(i, state):
            hs, ht, hl = state
            score = cand_scores[i] / jnp.maximum(
                (step + 1).astype(jnp.float32) ** lp, 1e-9)
            worst = jnp.argmin(hs)
            seq_i = tokens[cand_beams[i]]
            take = eos_ok[i] & (score > hs[worst])
            hs = jnp.where(take, hs.at[worst].set(score), hs)
            ht = jnp.where(take, ht.at[worst].set(seq_i), ht)
            hl = jnp.where(take, hl.at[worst].set(step), hl)
            return hs, ht, hl

        hyp_scores, hyp_tokens, hyp_lens = jax.lax.fori_loop(
            0, 2 * K, add_hyp, (hyp_scores, hyp_tokens, hyp_lens))

        # live slots: first K non-eos candidates in order
        live_rank = jnp.cumsum((~is_eos).astype(jnp.int32)) - 1  # rank among non-eos
        slot_of_cand = jnp.where(~is_eos, live_rank, 2 * K)
        # for each slot k, find candidate index
        cand_of_slot = jnp.argmax(slot_of_cand[None, :] == jnp.arange(K)[:, None],
                                  axis=1)
        new_beams = cand_beams[cand_of_slot]
        new_toks = cand_toks[cand_of_slot]
        new_scores = cand_scores[cand_of_slot]
        # if fewer than K non-eos candidates (degenerate), pad with worst
        have = jnp.sum((~is_eos).astype(jnp.int32))
        fallback = cand_of_slot[0]
        valid_slot = jnp.arange(K) < have
        new_beams = jnp.where(valid_slot, new_beams, cand_beams[fallback])
        new_toks = jnp.where(valid_slot, new_toks, stop)
        new_scores = jnp.where(valid_slot, new_scores, NEG)
        return (new_beams, new_toks, new_scores, hyp_scores, hyp_tokens, hyp_lens)

    def cond(state):
        (step, beam_scores, hyp_scores, *_rest) = state
        n_hyps_full = jnp.all(jnp.isfinite(hyp_scores))
        best_live = jnp.max(beam_scores) / jnp.maximum(
            jnp.float32(max_new_tokens) ** lp, 1e-9) if lp != 0 else jnp.max(beam_scores)
        worst_hyp = jnp.min(hyp_scores)
        done = n_hyps_full & (worst_hyp >= best_live)
        return jnp.logical_and(step < max_new_tokens, ~done)

    def body(state):
        (step, beam_scores, hyp_scores, hyp_tokens, hyp_lens, tokens, counts,
         kv, kv_valid, prev_tok, rng) = state
        # embed prev token (pos quirk: token i gets mel pos i+2; prev is i=step-1)
        x = _embed_mel_token(params, prev_tok, step + 1, dtype)
        pos = P + 1 + step
        kv_valid = kv_valid.at[:, pos].set(True)
        h, kv = gpt2_decode_step(params["gpt"], x, dims, pos, kv, kv_valid)
        logits = mel_logits_from_hidden(params, h)
        logits = _min_len_mask(logits, stop, step, sampling.min_new_tokens)
        combined = step_scores(logits, counts, beam_scores)
        rng, r = jax.random.split(rng)
        cb, ct, cs = select_candidates(combined, r)
        (new_beams, new_toks, new_scores, hyp_scores, hyp_tokens,
         hyp_lens) = process(cb, ct, cs, step, hyp_scores, hyp_tokens,
                             hyp_lens, tokens)
        # reorder beam state
        tokens = tokens[new_beams].at[:, step].set(new_toks)
        counts = counts[new_beams].at[jnp.arange(K), new_toks].add(1)
        kv = {"k": kv["k"][:, new_beams], "v": kv["v"][:, new_beams]}
        kv_valid = kv_valid[new_beams]
        return (step + 1, new_scores, hyp_scores, hyp_tokens, hyp_lens, tokens,
                counts, kv, kv_valid, new_toks, rng)

    # --- first step (expands beam 0 only) ---
    logits0 = _min_len_mask(logits0, stop, 0, sampling.min_new_tokens)
    combined0 = step_scores(logits0, counts0, beam_scores0)
    rng, r0 = jax.random.split(rng)
    cb0, ct0, cs0 = select_candidates(combined0, r0)
    (nb0, nt0, ns0, hyp_scores0, hyp_tokens0, hyp_lens0) = process(
        cb0, ct0, cs0, jnp.int32(0), hyp_scores0, hyp_tokens0, hyp_lens0,
        tokens0)
    tokens = tokens0[nb0].at[:, 0].set(nt0)
    counts = counts0[nb0].at[jnp.arange(K), nt0].add(1)
    kv = {"k": kv["k"][:, nb0], "v": kv["v"][:, nb0]}
    kv_valid = kv_valid[nb0]

    state = (jnp.int32(1), ns0, hyp_scores0, hyp_tokens0, hyp_lens0, tokens,
             counts, kv, kv_valid, nt0, rng)
    (step, beam_scores, hyp_scores, hyp_tokens, hyp_lens, tokens, _, _, _,
     _, _) = jax.lax.while_loop(cond, body, state)

    # finalize: close remaining live beams at current length
    final_scores = beam_scores / jnp.maximum(
        step.astype(jnp.float32) ** lp, 1e-9) if lp != 0 else beam_scores

    def close_beam(k, st):
        hs, ht, hl = st
        worst = jnp.argmin(hs)
        take = final_scores[k] > hs[worst]
        hs = jnp.where(take, hs.at[worst].set(final_scores[k]), hs)
        ht = jnp.where(take, ht.at[worst].set(tokens[k]), ht)
        hl = jnp.where(take, hl.at[worst].set(step), hl)
        return hs, ht, hl

    hyp_scores, hyp_tokens, hyp_lens = jax.lax.fori_loop(
        0, K, close_beam, (hyp_scores, hyp_tokens, hyp_lens))
    best = jnp.argmax(hyp_scores)
    out_tokens = hyp_tokens[best][None, :]
    out_len = hyp_lens[best][None]
    # stop-pad past the hypothesis length
    arange = jnp.arange(max_new_tokens)[None, :]
    out_tokens = jnp.where(arange < out_len[:, None], out_tokens, stop)
    return out_tokens, out_len

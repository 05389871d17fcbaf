"""In-XLA batched beam search / beam sample / diverse group beam search.

Replaces HF `_beam_search` / `_beam_sample`
(`gpt/transformers_generation_utils.py:3325`) — the reference's *default*
decode mode is num_beams=3 with do_sample=True (`infer_v2.py:526-534`) —
and `_group_beam_search` (`:3611`, see `generate_group_beam`).

Semantics (matching HF BeamSearchScorer, early_stopping=False), applied
independently to every row of a (B, P, D) left-padded prefix batch:
- beam_scores init [0, -inf, ...] so step one expands only beam 0
- per step: log_softmax -> repetition penalty (processor) -> + beam score;
  deterministic mode takes top 2K of the flattened K*V candidates; sample mode
  (do_sample=True) warps (temperature/top-k/top-p), draws 2K Gumbel samples,
  then re-sorts the 2K candidates by score descending (HF sorts sampled
  candidates before BeamSearchScorer.process,
  `transformers_generation_utils.py:3517`)
- candidates scan in score order: an EOS candidate (from a top-K rank) closes
  a hypothesis; others fill the K live beam slots
- hypothesis scores are normalized by generated_len**length_penalty where
  generated_len counts ONLY the generated tokens — BeamSearchScorer.process
  passes `generated_len = cur_len - decoder_prompt_len` to
  BeamHypotheses.add (transformers 4.52.1, the reference's pin; the fake
  prefix ids do NOT count). r5 behavioral correction: earlier rounds
  normalized by the full fake-sequence length (pre-4.26 HF semantics).
- per-row termination (BeamHypotheses.is_done, early_stopping=False): all
  hyp slots filled AND worst hyp >= the best CANDIDATE score of this step
  normalized at the CURRENT generated length (process passes
  `next_scores.max()` and `cur_len`); a finished row's state freezes while
  other rows keep decoding
- finalize: live beams of *unfinished* rows are force-closed as hypotheses
  (HF finalize skips rows the scorer already marked done); best hyp wins.

The GPT runs on the flattened (B*K) batch — one decode program regardless of
how many segments ride in the batch. The KV cache carries the B*K axis and is
gathered per step (the prefix region is identical across a row's beams so the
gather is cheap to schedule).

The per-row RNG stream is `jax.random.split(rng, B)[b]` when `rng` is a
single key; passing a batch of B keys (typed key array of shape (B,) or raw
uint32 of shape (B, 2)) uses them per row directly, so a B-row batched call
is token-identical to B single-row calls seeded with those keys.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from indextts_tpu.config import GPTConfig
from indextts_tpu.engine.decode import (SamplingConfig, _cache_len,
                                        _decode_step, _embed_mel_token,
                                        _fused_decode_ok)
from indextts_tpu.models.gpt.gpt2 import (GPT2Dims, gpt2_decode_step,
                                          gpt2_prefill, init_kv_cache)
from indextts_tpu.models.gpt.unified_voice import mel_logits_from_hidden
from indextts_tpu.nn import Params
from indextts_tpu.ops.sampling import (apply_repetition_penalty, apply_temperature,
                                       apply_top_k, apply_top_p)

NEG = jnp.float32(-1e9)

# Which cache-reorder path the LAST TRACE of generate_beam chose (True =
# in-kernel ancestry, False = per-step gather). Set at trace time only —
# a cached program does not refresh it — so A/B harnesses must reset it
# to None and `generate_beam.clear_cache()` before each leg to prove the
# intended path actually engaged (bench.py's beam quality row does).
last_use_anc = None

# kv stream block length of the fused decode kernel (ops/pallas/decode_step):
# 64 slots up to B*K=12, 32 for 13..24 (mirrors the kernel's own bs choice)
_ANC_BS = 64


def _anc_bs(BK: int) -> int:
    return _ANC_BS if BK <= 12 else _ANC_BS // 2


def _anc_flat(anc: jnp.ndarray, S: int, bs: int = _ANC_BS) -> jnp.ndarray:
    """(B*K, S) in-group ancestry -> the kernel's (S//bs, B*K*bs, 1) flat
    block layout (flat row of slot s in block i is r*bs + (s - i*bs))."""
    BK = anc.shape[0]
    a = anc.reshape(BK, S // bs, bs).transpose(1, 0, 2)
    return a.reshape(S // bs, BK * bs, 1).astype(jnp.bfloat16)


def _length_norm(lp: float):
    """Hypothesis-score normalizer: score / generated_len**lp, where `step`
    is the 0-indexed step at which the hypothesis closes (its EOS counts,
    so generated_len = step + 1 — BeamSearchScorer.process computes
    `cur_len - decoder_prompt_len` with cur_len one past the current ids)."""
    def norm(score, step):
        if lp == 0:
            return score
        return score / jnp.maximum(
            (step + 1).astype(jnp.float32) ** lp, 1e-9)
    return norm


def _scorer_process(cand_beams, cand_toks, cand_scores, step, hyp_scores,
                    hyp_tokens, hyp_lens, tokens, *, K, stop, norm):
    """One row's BeamSearchScorer.process: scan 2K candidates in score
    order, close EOS candidates of rank < K as hypotheses, fill the K live
    beam slots with the first K non-EOS candidates."""
    is_eos = cand_toks == stop
    rank = jnp.arange(2 * K)
    eos_ok = is_eos & (rank < K)

    def add_hyp(i, state):
        hs, ht, hl = state
        score = norm(cand_scores[i], step)
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
    live_rank = jnp.cumsum((~is_eos).astype(jnp.int32)) - 1
    slot_of_cand = jnp.where(~is_eos, live_rank, 2 * K)
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
    return (new_beams, new_toks, new_scores, hyp_scores, hyp_tokens,
            hyp_lens)


def _min_new_mask(lf, stop: int, step, min_new_tokens: int):
    """HF MinNewTokensLengthLogitsProcessor in BEAM modes runs on the
    post-log_softmax scores (processors after log_softmax,
    `transformers_generation_utils.py:3476-3480`), so the stop lane is
    -inf'd WITHOUT renormalizing the rest (r5 review fix — masking raw
    logits pre-softmax boosted every beam's non-stop scores by a
    beam-dependent constant). Shape-agnostic on leading dims."""
    if min_new_tokens <= 0:
        return lf
    return jnp.where(step < min_new_tokens,
                     lf.at[..., stop].set(-jnp.inf), lf)


def _hyps_done(cand_max, hyp_scores, step, *, norm):
    """HF BeamHypotheses.is_done (early_stopping=False, transformers 4.52):
    all hyp slots full AND worst hyp >= the step's best CANDIDATE score
    (process passes `next_scores.max()`, the top of the 2K list — which
    may be an EOS candidate) normalized at the CURRENT generated length."""
    n_full = jnp.all(jnp.isfinite(hyp_scores), axis=1)
    worst_hyp = jnp.min(hyp_scores, axis=1)
    return n_full & (worst_hyp >= norm(cand_max, step))


def _close_live(fs, tk, hs, ht, hl, done, *, K, step):
    """HF finalize: force-close the K live beams of a not-done row/group."""
    def close_beam(k, st):
        hs, ht, hl = st
        worst = jnp.argmin(hs)
        take = (~done) & (fs[k] > hs[worst])
        hs = jnp.where(take, hs.at[worst].set(fs[k]), hs)
        ht = jnp.where(take, ht.at[worst].set(tk[k]), ht)
        hl = jnp.where(take, hl.at[worst].set(step), hl)
        return hs, ht, hl

    return jax.lax.fori_loop(0, K, close_beam, (hs, ht, hl))


def _best_hyp(hyp_scores, hyp_tokens, hyp_lens, max_new_tokens: int,
              stop: int):
    """Best hypothesis per row, stop-padded past its length."""
    best = jnp.argmax(hyp_scores, axis=1)
    out_tokens = jnp.take_along_axis(hyp_tokens, best[:, None, None],
                                     axis=1)[:, 0]
    out_len = jnp.take_along_axis(hyp_lens, best[:, None], axis=1)[:, 0]
    arange = jnp.arange(max_new_tokens)[None, :]
    return jnp.where(arange < out_len[:, None], out_tokens, stop), out_len


def _row_keys(rng, B: int):
    """One PRNG key per batch row. A single key is split B ways; a batch of
    keys (typed (B,) or raw uint32 (B, 2)) is used per row as-is."""
    shp = tuple(jnp.shape(rng))
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        return rng if shp == (B,) else jax.random.split(rng.reshape(()), B)
    if shp == (B, 2):
        return rng
    return jax.random.split(rng.reshape(2), B)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dims", "max_new_tokens", "sampling", "dtype"))
def generate_beam(params: Params, cfg: GPTConfig, dims: GPT2Dims,
                  prefix_embeds: jnp.ndarray, prefix_mask: jnp.ndarray,
                  rng: jax.Array, max_new_tokens: int,
                  sampling: SamplingConfig = SamplingConfig(),
                  dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam decode for a batch of rows, K beams each.

    prefix_embeds: (B, P, D) left-padded [pad][cond][text] embeddings
    prefix_mask:   (B, P) bool (True = real content)
    Returns (codes (B, max_new_tokens), lengths (B,)) like generate().
    """
    K = sampling.num_beams
    B, P, D = prefix_embeds.shape
    V = cfg.number_mel_codes
    # fused multi-layer decode kernel when the beam-flattened batch fits
    fused = _fused_decode_ok(params, dims, B * K, sampling.kv_quant,
                             beam=True)
    # ancestry-select mode: the cache stays UNORDERED and the kernel selects
    # K/V by a per-position in-group ancestry map — the per-step (B*K, S)
    # cache gather (the HF reorder, ~2x the whole step at full scale)
    # disappears; only the (B*K, S) int32 map is gathered.
    # INDEXTTS_BEAM_ANC=0 restores the gather path (A/B + fallback).
    S = _cache_len(P, max_new_tokens, fused)
    # gates: the anc map lives fully in VMEM inside the kernel (lane-padded
    # to S*B*K*256 bytes regardless of block size). B*K <= 12 keeps the
    # proven 2 MB bound under the default Mosaic scope; 13..24 rides the
    # kernel's 32-slot blocks with a raised vmem limit, bounded at 6 MB
    # (the 8-seg x K=3 serving shape at S=768 is 4.7 MB). Larger configs
    # keep the gather.
    anc_cap = (2 * 1024 * 1024 if B * K <= 12 else 6 * 1024 * 1024)
    use_anc = (fused and K > 1 and B * K <= 24
               and S * B * K * 256 <= anc_cap
               and os.environ.get("INDEXTTS_BEAM_ANC", "1") != "0")
    global last_use_anc
    last_use_anc = bool(use_anc)
    anc_bs = _anc_bs(B * K)
    stop = cfg.stop_mel_token
    lp = sampling.length_penalty
    L = max_new_tokens

    norm = _length_norm(lp)

    # replicate prefix across beams -> GPT batch axis is B*K
    pe = jnp.repeat(prefix_embeds.astype(dtype), K, axis=0)      # (B*K, P, D)
    pm = jnp.repeat(prefix_mask, K, axis=0)                      # (B*K, P)
    start_tok = jnp.full((B * K,), cfg.start_mel_token, jnp.int32)
    seq = jnp.concatenate(
        [pe, _embed_mel_token(params, start_tok, 0, dtype)[:, None, :]], axis=1)
    seq_mask = jnp.concatenate([pm, jnp.ones((B * K, 1), bool)], axis=1)
    kv = init_kv_cache(dims, B * K, S, dtype=dtype,
                       quantized=sampling.kv_quant, flat=fused)
    hidden, kv = gpt2_prefill(params["gpt"], seq, dims, seq_mask, kv)
    logits0 = mel_logits_from_hidden(params, hidden[:, -1, :]).reshape(B, K, V)

    kv_valid = jnp.zeros((B * K, S), bool)
    kv_valid = jax.lax.dynamic_update_slice(kv_valid, seq_mask, (0, 0))

    counts0 = jnp.zeros((B, K, V), jnp.int32)
    counts0 = counts0.at[:, :, 1].add(P)
    counts0 = counts0.at[:, :, cfg.start_mel_token].add(1)

    beam_scores0 = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((K - 1,), NEG)]), (B, K))

    tokens0 = jnp.full((B, K, L), stop, jnp.int32)
    hyp_scores0 = jnp.full((B, K), -jnp.inf, jnp.float32)
    hyp_tokens0 = jnp.full((B, K, L), stop, jnp.int32)
    hyp_lens0 = jnp.zeros((B, K), jnp.int32)
    row_keys0 = _row_keys(rng, B)                                 # (B,) keys
    row_done0 = jnp.zeros((B,), bool)
    # in-group ancestry map (own index everywhere; prefix rows are identical
    # across a row's beams, so any in-group value is valid there)
    own_idx = jnp.arange(B * K, dtype=jnp.int32) % K
    anc0 = jnp.broadcast_to(own_idx[:, None], (B * K, S))

    # ---- per-row scorer pieces (vmapped over B) ----------------------------

    def select_candidates(scores_kv, rng_step):
        """scores_kv (K, V) combined scores -> 2K (beam, token, score)."""
        flat = scores_kv.reshape(-1)
        if sampling.do_sample:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(rng_step, flat.shape, minval=1e-20, maxval=1.0)))
            order_scores = jnp.where(flat <= NEG / 2, NEG, flat + g)
            _, idx = jax.lax.top_k(order_scores, 2 * K)
            cand_scores = flat[idx]
            # HF sorts the 2K sampled candidates by score descending before
            # BeamSearchScorer.process (transformers_generation_utils.py:3517)
            order = jnp.argsort(-cand_scores)
            idx = idx[order]
            cand_scores = cand_scores[order]
        else:
            cand_scores, idx = jax.lax.top_k(flat, 2 * K)
        return idx // V, idx % V, cand_scores

    def step_scores(logits, counts, beam_scores, step):
        lf = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lf = apply_repetition_penalty(lf, counts, sampling.repetition_penalty)
        lf = _min_new_mask(lf, stop, step, sampling.min_new_tokens)
        combined = lf + beam_scores[:, None]
        if sampling.do_sample:
            combined = apply_temperature(combined, sampling.temperature)
            combined = apply_top_k(combined, sampling.top_k)
            combined = apply_top_p(combined, sampling.top_p)
        return combined

    process = functools.partial(_scorer_process, K=K, stop=stop, norm=norm)

    v_select = jax.vmap(select_candidates)
    v_scores = jax.vmap(step_scores, in_axes=(0, 0, 0, None))
    v_process = jax.vmap(process, in_axes=(0, 0, 0, None, 0, 0, 0, 0))
    v_split = jax.vmap(jax.random.split, in_axes=(0, None))

    row_is_done = functools.partial(_hyps_done, norm=norm)

    def advance(step, combined, rkeys, beam_scores, hyp_scores, hyp_tokens,
                hyp_lens, tokens, counts, kv, kv_valid, anc, row_done):
        """One scorer step over all rows; freezes rows already done."""
        rk = v_split(rkeys, 2)                      # (B, 2) keys
        rkeys, rs = rk[:, 0], rk[:, 1]
        cb, ct, cs = v_select(combined, rs)
        (nb, nt, ns, hs, ht, hl) = v_process(cb, ct, cs, step, hyp_scores,
                                             hyp_tokens, hyp_lens, tokens)
        # freeze finished rows: identity reorder, stop token, old scores/hyps
        ident = jnp.broadcast_to(jnp.arange(K)[None, :], (B, K))
        nb = jnp.where(row_done[:, None], ident, nb)
        nt = jnp.where(row_done[:, None], stop, nt)
        ns = jnp.where(row_done[:, None], beam_scores, ns)
        hs = jnp.where(row_done[:, None], hyp_scores, hs)
        ht = jnp.where(row_done[:, None, None], hyp_tokens, ht)
        hl = jnp.where(row_done[:, None], hyp_lens, hl)

        # reorder per-row beam state
        def reorder(t, c, nb_r, nt_r, s):
            t = t[nb_r].at[:, s].set(nt_r)
            c = c[nb_r].at[jnp.arange(K), nt_r].add(1)
            return t, c

        tokens, counts = jax.vmap(reorder, in_axes=(0, 0, 0, 0, None))(
            tokens, counts, nb, nt, step)
        if K > 1:  # K == 1: nb is always identity, nothing to reorder
            gidx = (jnp.arange(B)[:, None] * K + nb).reshape(-1)
            if use_anc:
                # cache rows never move; only the tiny ancestry map does.
                # (body stamped anc[:, pos] = own index before the decode
                # step, so anc[gidx][r', pos] = parent's index — the chain
                # composes by construction.) kv_valid rows are identical
                # within a group (same start, lock-step writes): no gather.
                anc = anc[gidx]
            else:
                kv = {name: buf[:, gidx] for name, buf in kv.items()}
                kv_valid = kv_valid[gidx]
        row_done = row_done | row_is_done(cs[:, 0], hs, step)
        return (rkeys, nb, nt, ns, hs, ht, hl, tokens, counts, kv, kv_valid,
                anc, row_done)

    # --- first step (expands beam 0 only of every row) ----------------------
    combined0 = v_scores(logits0, counts0, beam_scores0, jnp.int32(0))
    (row_keys, _, nt0, beam_scores, hyp_scores, hyp_tokens, hyp_lens, tokens,
     counts, kv, kv_valid, anc, row_done) = advance(
        jnp.int32(0), combined0, row_keys0, beam_scores0, hyp_scores0,
        hyp_tokens0, hyp_lens0, tokens0, counts0, kv, kv_valid, anc0,
        row_done0)

    def cond(state):
        (step, _, beam_scores, hyp_scores, *_rest, row_done) = state
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(row_done))

    def body(state):
        (step, rkeys, beam_scores, hyp_scores, hyp_tokens, hyp_lens, tokens,
         counts, kv, kv_valid, anc, prev_tok, row_done) = state
        # embed prev token (pos quirk: token i gets mel pos i+2; prev is
        # i=step-1)
        x = _embed_mel_token(params, prev_tok.reshape(B * K), step + 1, dtype)
        pos = P + 1 + step
        kv_valid = kv_valid.at[:, pos].set(True)
        if use_anc:
            # this step's k/v at `pos` is computed by each slot itself; stamp
            # own index so advance()'s anc[gidx] inherits the parent pointer
            anc = anc.at[:, pos].set(own_idx)
            h, kv = _decode_step(fused, params, x, dims, pos, kv, kv_valid,
                                 anc=_anc_flat(anc, S, anc_bs), group=K)
        else:
            h, kv = _decode_step(fused, params, x, dims, pos, kv, kv_valid)
        logits = mel_logits_from_hidden(params, h).reshape(B, K, V)
        combined = v_scores(logits, counts, beam_scores, step)
        (rkeys, _, new_toks, beam_scores, hyp_scores, hyp_tokens, hyp_lens,
         tokens, counts, kv, kv_valid, anc, row_done) = advance(
            step, combined, rkeys, beam_scores, hyp_scores, hyp_tokens,
            hyp_lens, tokens, counts, kv, kv_valid, anc, row_done)
        return (step + 1, rkeys, beam_scores, hyp_scores, hyp_tokens, hyp_lens,
                tokens, counts, kv, kv_valid, anc, new_toks, row_done)

    state = (jnp.int32(1), row_keys, beam_scores, hyp_scores, hyp_tokens,
             hyp_lens, tokens, counts, kv, kv_valid, anc, nt0, row_done)
    (step, _, beam_scores, hyp_scores, hyp_tokens, hyp_lens, tokens, _, _, _,
     _, _, row_done) = jax.lax.while_loop(cond, body, state)

    # finalize: close remaining live beams of rows the scorer has NOT marked
    # done (HF finalize skips done rows; generated_len there is the number
    # of completed steps = `step`, i.e. norm at step-1)
    final_scores = norm(beam_scores, step - 1) if lp != 0 else beam_scores

    hyp_scores, hyp_tokens, hyp_lens = jax.vmap(
        functools.partial(_close_live, K=K, step=step))(
        final_scores, tokens, hyp_scores, hyp_tokens, hyp_lens, row_done)
    return _best_hyp(hyp_scores, hyp_tokens, hyp_lens, max_new_tokens, stop)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dims", "max_new_tokens", "sampling", "dtype"))
def generate_group_beam(params: Params, cfg: GPTConfig, dims: GPT2Dims,
                        prefix_embeds: jnp.ndarray, prefix_mask: jnp.ndarray,
                        rng: jax.Array, max_new_tokens: int,
                        sampling: SamplingConfig = SamplingConfig(),
                        dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Diverse (group) beam search — HF `_group_beam_search` semantics
    (reference `gpt/transformers_generation_utils.py:3611-3900`), reachable
    in the reference via `inference_speech(**hf_generate_kwargs)`
    (`gpt/model_v2.py:698`).

    K = sampling.num_beams beams split into G = sampling.num_beam_groups
    groups of Kg = K // G. One GPT decode step runs all B*K beams; the
    scorer then processes groups SEQUENTIALLY within the step: group g's
    log-softmax scores are penalized by diversity_penalty * (per-token count
    among the tokens groups 0..g-1 chose this step — HF
    HammingDiversityLogitsProcessor, which sits BEFORE the repetition
    penalty in the processor list), then the group runs a standard Kg-beam
    scorer step. A done group keeps contributing its pad token (= stop) to
    later groups' penalty counts, matching HF. Deterministic only (HF
    raises on do_sample=True with groups; the dispatch validates).

    Returns (codes (B, max_new_tokens), lengths (B,)) — the best hypothesis
    pooled across ALL groups per row (HF finalize collects every group's
    hyps and takes the max). rng is accepted for signature parity and
    unused.

    The cache-reorder machinery is shared with `generate_beam`: reorders
    never cross a group, so the in-kernel ancestry map runs with
    group=Kg (in-subgroup indices), and the gather path gathers within
    Kg-blocks of the flattened (b, g, kg) row-major batch.
    """
    K = sampling.num_beams
    G = sampling.num_beam_groups
    Kg = K // G
    B, P, D = prefix_embeds.shape
    V = cfg.number_mel_codes
    BG = B * G
    fused = _fused_decode_ok(params, dims, B * K, sampling.kv_quant,
                             beam=True)
    S = _cache_len(P, max_new_tokens, fused)
    anc_cap = (2 * 1024 * 1024 if B * K <= 12 else 6 * 1024 * 1024)
    use_anc = (fused and Kg > 1 and B * K <= 24
               and S * B * K * 256 <= anc_cap
               and os.environ.get("INDEXTTS_BEAM_ANC", "1") != "0")
    global last_use_anc
    last_use_anc = bool(use_anc)
    anc_bs = _anc_bs(B * K)
    stop = cfg.stop_mel_token
    lp = sampling.length_penalty
    L = max_new_tokens
    div = jnp.float32(sampling.diversity_penalty)
    norm = _length_norm(lp)

    pe = jnp.repeat(prefix_embeds.astype(dtype), K, axis=0)      # (B*K, P, D)
    pm = jnp.repeat(prefix_mask, K, axis=0)
    start_tok = jnp.full((B * K,), cfg.start_mel_token, jnp.int32)
    seq = jnp.concatenate(
        [pe, _embed_mel_token(params, start_tok, 0, dtype)[:, None, :]],
        axis=1)
    seq_mask = jnp.concatenate([pm, jnp.ones((B * K, 1), bool)], axis=1)
    kv = init_kv_cache(dims, B * K, S, dtype=dtype,
                       quantized=sampling.kv_quant, flat=fused)
    hidden, kv = gpt2_prefill(params["gpt"], seq, dims, seq_mask, kv)
    logits0 = mel_logits_from_hidden(params, hidden[:, -1, :])

    kv_valid = jnp.zeros((B * K, S), bool)
    kv_valid = jax.lax.dynamic_update_slice(kv_valid, seq_mask, (0, 0))

    counts0 = jnp.zeros((BG, Kg, V), jnp.int32)
    counts0 = counts0.at[:, :, 1].add(P)
    counts0 = counts0.at[:, :, cfg.start_mel_token].add(1)

    # HF inits beam_scores[:, ::num_sub_beams] = 0: slot 0 of EVERY group
    if Kg > 1:
        beam_scores0 = jnp.broadcast_to(
            jnp.concatenate([jnp.zeros((1,)), jnp.full((Kg - 1,), NEG)]),
            (BG, Kg))
    else:
        beam_scores0 = jnp.zeros((BG, 1))

    tokens0 = jnp.full((BG, Kg, L), stop, jnp.int32)
    hyp_scores0 = jnp.full((BG, Kg), -jnp.inf, jnp.float32)
    hyp_tokens0 = jnp.full((BG, Kg, L), stop, jnp.int32)
    hyp_lens0 = jnp.zeros((BG, Kg), jnp.int32)
    grp_done0 = jnp.zeros((BG,), bool)
    own_idx = jnp.arange(B * K, dtype=jnp.int32) % Kg
    anc0 = jnp.broadcast_to(own_idx[:, None], (B * K, S))

    process = functools.partial(_scorer_process, K=Kg, stop=stop, norm=norm)
    v_process = jax.vmap(process, in_axes=(0, 0, 0, None, 0, 0, 0, 0))

    grp_is_done = functools.partial(_hyps_done, norm=norm)

    def advance(step, logits, beam_scores, hyp_scores, hyp_tokens, hyp_lens,
                tokens, counts, kv, kv_valid, anc, grp_done):
        """One full scorer step: groups sequentially (diversity coupling),
        then one global cache/ancestry reorder."""
        lf4 = jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1).reshape(B, G, Kg, V)
        bs4 = beam_scores.reshape(B, G, Kg)
        cn4 = counts.reshape(B, G, Kg, V)
        hs4 = hyp_scores.reshape(B, G, Kg)
        ht4 = hyp_tokens.reshape(B, G, Kg, L)
        hl4 = hyp_lens.reshape(B, G, Kg)
        tk4 = tokens.reshape(B, G, Kg, L)
        gd = grp_done.reshape(B, G)
        freq = jnp.zeros((B, V), jnp.float32)
        outs = []                       # per group: (nb, nt, ns, hs, ht, hl, done)
        for g in range(G):              # static unroll; G is small
            s = lf4[:, g]                                    # (B, Kg, V)
            if g > 0:
                s = s - div * freq[:, None, :]
            s = apply_repetition_penalty(s, cn4[:, g],
                                         sampling.repetition_penalty)
            s = _min_new_mask(s, stop, step, sampling.min_new_tokens)
            flat = (s + bs4[:, g][:, :, None]).reshape(B, Kg * V)
            cand_scores, idx = jax.lax.top_k(flat, 2 * Kg)
            cb, ct = idx // V, idx % V
            nb, nt, ns, hs, ht, hl = v_process(
                cb, ct, cand_scores, step, hs4[:, g], ht4[:, g], hl4[:, g],
                tk4[:, g])
            done_g = gd[:, g]
            ident = jnp.broadcast_to(jnp.arange(Kg)[None, :], (B, Kg))
            nb = jnp.where(done_g[:, None], ident, nb)
            nt = jnp.where(done_g[:, None], stop, nt)  # HF pads done groups
            ns = jnp.where(done_g[:, None], bs4[:, g], ns)
            hs = jnp.where(done_g[:, None], hs4[:, g], hs)
            ht = jnp.where(done_g[:, None, None], ht4[:, g], ht)
            hl = jnp.where(done_g[:, None], hl4[:, g], hl)
            done_g = done_g | grp_is_done(cand_scores[:, 0], hs, step)
            # this group's chosen tokens (pad for done groups, as in HF)
            # feed later groups' diversity counts
            freq = freq + jnp.sum(
                jax.nn.one_hot(nt, V, dtype=jnp.float32), axis=1)
            outs.append((nb, nt, ns, hs, ht, hl, done_g))
        nb = jnp.stack([o[0] for o in outs], 1).reshape(BG, Kg)
        nt = jnp.stack([o[1] for o in outs], 1).reshape(BG, Kg)
        ns = jnp.stack([o[2] for o in outs], 1).reshape(BG, Kg)
        hyp_scores = jnp.stack([o[3] for o in outs], 1).reshape(BG, Kg)
        hyp_tokens = jnp.stack([o[4] for o in outs], 1).reshape(BG, Kg, L)
        hyp_lens = jnp.stack([o[5] for o in outs], 1).reshape(BG, Kg)
        grp_done = jnp.stack([o[6] for o in outs], 1).reshape(BG)

        def reorder(t, c, nb_r, nt_r, s):
            t = t[nb_r].at[:, s].set(nt_r)
            c = c[nb_r].at[jnp.arange(Kg), nt_r].add(1)
            return t, c

        tokens, counts = jax.vmap(reorder, in_axes=(0, 0, 0, 0, None))(
            tokens, counts, nb, nt, step)
        if Kg > 1:  # Kg == 1: nb is always identity
            gidx = (jnp.arange(BG)[:, None] * Kg + nb).reshape(-1)
            if use_anc:
                anc = anc[gidx]
            else:
                kv = {name: buf[:, gidx] for name, buf in kv.items()}
                kv_valid = kv_valid[gidx]
        return (nt, ns, hyp_scores, hyp_tokens, hyp_lens, tokens, counts,
                kv, kv_valid, anc, grp_done)

    # --- first step (expands beam 0 of every group) --------------------------
    (nt0, beam_scores, hyp_scores, hyp_tokens, hyp_lens, tokens, counts, kv,
     kv_valid, anc, grp_done) = advance(
        jnp.int32(0), logits0, beam_scores0, hyp_scores0, hyp_tokens0,
        hyp_lens0, tokens0, counts0, kv, kv_valid, anc0, grp_done0)

    def cond(state):
        step = state[0]
        grp_done = state[-1]
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(grp_done))

    def body(state):
        (step, beam_scores, hyp_scores, hyp_tokens, hyp_lens, tokens, counts,
         kv, kv_valid, anc, prev_tok, grp_done) = state
        x = _embed_mel_token(params, prev_tok.reshape(B * K), step + 1, dtype)
        pos = P + 1 + step
        kv_valid = kv_valid.at[:, pos].set(True)
        if use_anc:
            anc = anc.at[:, pos].set(own_idx)
            h, kv = _decode_step(fused, params, x, dims, pos, kv, kv_valid,
                                 anc=_anc_flat(anc, S, anc_bs), group=Kg)
        else:
            h, kv = _decode_step(fused, params, x, dims, pos, kv, kv_valid)
        logits = mel_logits_from_hidden(params, h)
        (new_toks, beam_scores, hyp_scores, hyp_tokens, hyp_lens, tokens,
         counts, kv, kv_valid, anc, grp_done) = advance(
            step, logits, beam_scores, hyp_scores, hyp_tokens, hyp_lens,
            tokens, counts, kv, kv_valid, anc, grp_done)
        return (step + 1, beam_scores, hyp_scores, hyp_tokens, hyp_lens,
                tokens, counts, kv, kv_valid, anc, new_toks, grp_done)

    state = (jnp.int32(1), beam_scores, hyp_scores, hyp_tokens, hyp_lens,
             tokens, counts, kv, kv_valid, anc, nt0, grp_done)
    (step, beam_scores, hyp_scores, hyp_tokens, hyp_lens, tokens, _, _, _, _,
     _, grp_done) = jax.lax.while_loop(cond, body, state)

    # finalize per (b, g): close live beams of groups NOT marked done, then
    # pool every group's hyps per row and take the best (HF finalize)
    final_scores = norm(beam_scores, step - 1) if lp != 0 else beam_scores

    hyp_scores, hyp_tokens, hyp_lens = jax.vmap(
        functools.partial(_close_live, K=Kg, step=step))(
        final_scores, tokens, hyp_scores, hyp_tokens, hyp_lens, grp_done)
    return _best_hyp(hyp_scores.reshape(B, K), hyp_tokens.reshape(B, K, L),
                     hyp_lens.reshape(B, K), max_new_tokens, stop)

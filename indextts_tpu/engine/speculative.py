"""Speculative (prompt-lookup) decoding for B=1 — breaks the per-token
weight-DMA floor.

The round-4 floor analysis (docs/KERNELS.md §1) showed single-segment decode
is weight-DMA bound: every sampled token streams the full 483 MB of int8 GPT
weights, so the B=1 floor is ~1.0-1.2 ms/token no matter how good the kernel
is. The only way under it is to make one weight stream serve MULTIPLE tokens.
This module does that without a draft model:

- **draft**: prompt-lookup n-gram drafting (the PLD scheme HF ships as
  `prompt_lookup_num_tokens`): match the last `ngram` generated codes against
  the earlier history and propose the `gamma` codes that followed the most
  recent match. Costs one (max_new,) elementwise pass in-graph — no second
  model, no extra weights. Mel-code sequences repeat locally (silence,
  sustained vowels, rhythmic patterns), which is what PLD exploits.
- **verify**: ONE `gpt2_chunk_step` forward over [prev, d_0..d_{gamma-1}]
  (gamma+1 tokens, one weight stream) yields the logits the sequential loop
  would have produced at each position, PROVIDED the earlier drafts match.
  The engine then replays the sequential sampler exactly: per-position rng
  splits in the same order, repetition-penalty counts accumulated over the
  in-chunk committed tokens, min-length masking by absolute step. The first
  position whose sample differs from its draft (or emits stop) ends the
  committed run; its sample is the correction token (standard speculative
  commit: n matches -> n+1 tokens).
- **fallback**: when no n-gram matches (or the tail is too short), the body
  takes the normal single-token step — the same fused Pallas kernel /
  XLA step `generate()` uses — so the worst case is the baseline decode
  plus a negligible in-graph lookup.

Token-stream semantics are the SEQUENTIAL sampler's: every committed token
is sampled from logits conditioned only on committed history, with the same
rng-split chain, the same HF-ordered warper stack, and the same faithful
quirks (fake-prefix repetition counts, mel-pos off-by-one). The only
difference from `generate()` is which PROGRAM computes the logits (chunked
vs single-step matmuls), i.e. float-reassociation noise —
`tests/test_speculative.py` pins token equality across oracle, adversarial,
and lookup drafting.

The reference has no analogue of any of this (its HF `generate` is strictly
one forward per token; reference decode loop
`indextts/gpt/transformers_generation_utils.py:2988-3065`). Opt-in:
`INDEXTTS_SPEC_DECODE=<gamma>` in the pipeline (B=1 segments only).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from indextts_tpu.config import GPTConfig
from indextts_tpu.engine.decode import (SamplingConfig, _cache_len,
                                        _decode_step, _embed_mel_token,
                                        _fused_decode_ok, _min_len_mask)
from indextts_tpu.models.gpt.gpt2 import (GPT2Dims, gpt2_chunk_step,
                                          gpt2_prefill, init_kv_cache)
from indextts_tpu.models.gpt.unified_voice import mel_logits_from_hidden
from indextts_tpu.nn import Params
from indextts_tpu.ops.sampling import sample_logits


def _lookup_draft(row: jnp.ndarray, step: jnp.ndarray, gamma: int,
                  ngram: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prompt-lookup draft over one row's generated codes.

    row: (max_new,) int32, indices [0, step) are generated history.
    Returns (draft (gamma,) int32, have bool). A candidate start j matches
    when row[j:j+ngram] == row[step-ngram:step] and its continuation
    row[j+ngram:j+ngram+gamma] lies fully inside the history; the MOST
    RECENT match wins (locality: recent patterns predict the tail best).
    """
    W = row.shape[0]
    iota = jnp.arange(W)
    match = jnp.ones((W,), bool)
    for o in range(ngram):
        shifted = row if o == 0 else jnp.concatenate(
            [row[o:], jnp.full((o,), -1, row.dtype)])
        pat = jax.lax.dynamic_index_in_dim(row, step - ngram + o, 0,
                                           keepdims=False)
        match = jnp.logical_and(match, shifted == pat)
    ok = jnp.logical_and(match, iota <= step - ngram - gamma)
    jbest = jnp.max(jnp.where(ok, iota, -1))
    have = jnp.logical_and(jbest >= 0, step >= ngram)
    start = jnp.clip(jbest + ngram, 0, W - gamma)
    draft = jax.lax.dynamic_slice(row, (start,), (gamma,))
    return draft, have


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dims", "max_new_tokens", "sampling", "dtype",
                     "gamma", "ngram", "forced"))
def generate_spec(params: Params, cfg: GPTConfig, dims: GPT2Dims,
                  prefix_embeds: jnp.ndarray, prefix_mask: jnp.ndarray,
                  rng: jax.Array, max_new_tokens: int,
                  sampling: SamplingConfig = SamplingConfig(),
                  dtype=jnp.bfloat16, gamma: int = 8, ngram: int = 2,
                  forced: bool = False,
                  draft_source: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`generate()` with speculative chunk-verify; B must be 1.

    forced=True reads drafts from `draft_source` ((max_new_tokens,) int32)
    instead of prompt lookup — the test/bench hook: oracle drafts (the
    sequence the sequential sampler emits) exercise full-accept, adversarial
    drafts exercise full-reject; output must equal `generate()` either way.
    Returns (codes (1, max_new_tokens), lengths (1,), stats (3,) int32)
    where stats = [chunk verifies, tokens committed by chunks, single-step
    fallbacks] — the acceptance observability a deployment needs to decide
    whether speculation clears break-even (docs/KERNELS.md §1): per-draft
    acceptance ≈ (stats[1] - stats[0]) / (stats[0] * gamma).
    """
    B, P, D = prefix_embeds.shape
    assert B == 1, "speculative decode is a B=1 (single-segment) path"
    V = cfg.number_mel_codes
    stop = cfg.stop_mel_token
    fused = _fused_decode_ok(params, dims, B, sampling.kv_quant)
    S = _cache_len(P, max_new_tokens, fused)
    G1 = gamma + 1

    if draft_source is None:
        draft_source = jnp.zeros((max_new_tokens,), jnp.int32)

    prefix_embeds = prefix_embeds.astype(dtype)

    # --- prefill (identical to generate()) --------------------------------
    start_tok = jnp.full((B,), cfg.start_mel_token, jnp.int32)
    start_emb = _embed_mel_token(params, start_tok, 0, dtype)
    seq = jnp.concatenate([prefix_embeds, start_emb[:, None, :]], axis=1)
    seq_mask = jnp.concatenate([prefix_mask, jnp.ones((B, 1), bool)], axis=1)
    kv = init_kv_cache(dims, B, S, dtype=dtype, quantized=sampling.kv_quant,
                       flat=bool(fused))
    hidden, kv = gpt2_prefill(params["gpt"], seq, dims, seq_mask, kv)
    logits0 = mel_logits_from_hidden(params, hidden[:, -1, :])
    kv_valid = jnp.zeros((B, S), bool)
    kv_valid = jax.lax.dynamic_update_slice(kv_valid, seq_mask, (0, 0))

    counts = jnp.zeros((B, V), jnp.int32)
    counts = counts.at[:, 1].add(P)
    counts = counts.at[:, cfg.start_mel_token].add(1)

    rng, r0 = jax.random.split(rng)
    logits0 = _min_len_mask(logits0, stop, 0, sampling.min_new_tokens)
    tok0 = sample_logits(
        r0, logits0, counts,
        temperature=sampling.temperature, top_k=sampling.top_k,
        top_p=sampling.top_p, repetition_penalty=sampling.repetition_penalty,
        do_sample=sampling.do_sample,
        typical_mass=sampling.typical_mass if sampling.typical_sampling else None)
    tokens = jnp.full((B, max_new_tokens), stop, jnp.int32)
    tokens = tokens.at[:, 0].set(tok0)
    counts = counts.at[jnp.arange(B), tok0].add(1)
    finished0 = tok0 == stop
    lengths0 = jnp.where(finished0, 0, max_new_tokens)

    def _sample(r, logits, cts, step):
        logits = _min_len_mask(logits, stop, step, sampling.min_new_tokens)
        return sample_logits(
            r, logits, cts,
            temperature=sampling.temperature, top_k=sampling.top_k,
            top_p=sampling.top_p,
            repetition_penalty=sampling.repetition_penalty,
            do_sample=sampling.do_sample,
            typical_mass=sampling.typical_mass if sampling.typical_sampling
            else None)

    def single_branch(state):
        """One token — exactly generate()'s loop body."""
        (step, tokens, counts, kv, kv_valid, finished, lengths, rng, _,
         stats) = state
        prev_tok = tokens[:, step - 1]
        x = _embed_mel_token(params, prev_tok, step + 1, dtype)
        pos = P + 1 + step
        kv_valid = kv_valid.at[:, pos].set(True)
        h, kv = _decode_step(fused, params, x, dims, pos, kv, kv_valid)
        rng, r = jax.random.split(rng)
        tok = _sample(r, mel_logits_from_hidden(params, h), counts, step)
        tok = jnp.where(finished, stop, tok)
        tokens = tokens.at[:, step].set(tok)
        counts = counts.at[jnp.arange(B), tok].add(
            jnp.where(finished, 0, 1))
        newly = jnp.logical_and(~finished, tok == stop)
        lengths = jnp.where(newly, step, lengths)
        finished = jnp.logical_or(finished, tok == stop)
        return (step + 1, tokens, counts, kv, kv_valid, finished, lengths,
                rng, jnp.zeros((gamma,), jnp.int32),
                stats + jnp.asarray([0, 0, 1], jnp.int32))

    def chunk_branch(state):
        """Verify gamma drafted tokens with one chunk forward; commit the
        matching prefix plus the first correction token."""
        (step, tokens, counts, kv, kv_valid, finished, lengths, rng, draft,
         stats) = state
        prev_tok = tokens[:, step - 1]                       # (1,)
        ids = jnp.concatenate([prev_tok, draft])             # (G1,)
        emb = params["mel_embedding"]["weight"].astype(dtype)[ids]
        pemb = jax.lax.dynamic_slice(
            params["mel_pos_embedding"]["weight"],
            (step + 1, 0), (G1, params["mel_pos_embedding"]["weight"].shape[1]),
        ).astype(dtype)
        x = (emb + pemb)[None]                               # (1, G1, D)
        pos0 = P + 1 + step
        h, kv = gpt2_chunk_step(params["gpt"], x, dims, pos0, kv, kv_valid)
        logits_all = mel_logits_from_hidden(params, h[0])    # (G1, V)

        # replay the sequential sampler: per-position rng splits in order,
        # counts accumulated over in-chunk committed tokens ("alive" chain)
        def scan_body(carry, j):
            rng_c, counts_c, alive = carry
            rng_n, r = jax.random.split(rng_c)
            tok = _sample(r, logits_all[j][None], counts_c, step + j)[0]
            counts_n = counts_c.at[0, tok].add(
                jnp.where(alive, 1, 0).astype(counts_c.dtype))
            good = jnp.logical_and(
                j < gamma,
                jnp.logical_and(tok == draft[jnp.minimum(j, gamma - 1)],
                                tok != stop))
            return (rng_n, counts_n, jnp.logical_and(alive, good)), (tok, rng_n)

        (_, counts_f, _), (toks, rngs) = jax.lax.scan(
            scan_body, (rng, counts, jnp.bool_(True)), jnp.arange(G1))

        good = jnp.logical_and(toks[:gamma] == draft, toks[:gamma] != stop)
        n = jnp.where(jnp.all(good), gamma,
                      jnp.argmin(good).astype(jnp.int32))
        m = n + 1                                            # committed count
        # committed tokens: drafts 0..n-1 (== toks) + correction toks[n];
        # trailing writes hold stop (overwritten by later iterations, and
        # already correct if the loop ends here)
        vals = jnp.where(jnp.arange(G1) <= n, toks, stop)
        tokens = jax.lax.dynamic_update_slice(tokens, vals[None], (0, step))
        rng = jax.tree_util.tree_map(lambda leaf: leaf[n], rngs)
        s_iota = jnp.arange(S)
        kv_valid = jnp.logical_or(
            kv_valid,
            jnp.logical_and(s_iota >= pos0, s_iota < pos0 + m)[None])
        tok_last = toks[n]
        fin_new = tok_last == stop
        lengths = jnp.where(jnp.logical_and(fin_new, ~finished[0]),
                            step + n, lengths)
        finished = jnp.logical_or(finished, fin_new)
        return (step + m, tokens, counts_f, kv, kv_valid, finished, lengths,
                rng, jnp.zeros((gamma,), jnp.int32),
                stats + jnp.stack([jnp.int32(1), m, jnp.int32(0)]))

    def cond(state):
        step, _, _, _, _, finished, _, _, _, _ = state
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(finished))

    def body(state):
        (step, tokens, counts, kv, kv_valid, finished, lengths, rng, _,
         stats) = state
        if forced:
            start = jnp.clip(step, 0, max_new_tokens - gamma)
            draft = jax.lax.dynamic_slice(draft_source, (start,), (gamma,))
            have = jnp.bool_(True)
        else:
            draft, have = _lookup_draft(tokens[0], step, gamma, ngram)
        have = jnp.logical_and(have, step + gamma + 1 <= max_new_tokens)
        state = (step, tokens, counts, kv, kv_valid, finished, lengths, rng,
                 draft, stats)
        return jax.lax.cond(have, chunk_branch, single_branch, state)

    state = (jnp.int32(1), tokens, counts, kv, kv_valid, finished0, lengths0,
             rng, jnp.zeros((gamma,), jnp.int32), jnp.zeros((3,), jnp.int32))
    _, tokens, _, _, _, _, lengths, _, _, stats = jax.lax.while_loop(
        cond, body, state)
    return tokens, jnp.minimum(lengths, max_new_tokens), stats

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
- **self-gating** (`generate_spec_adaptive`): speculation only pays when the
  codes actually repeat, which is a property of the checkpoint + input, not
  the engine. The adaptive driver decodes a short probe span speculatively,
  reads the acceptance stats at the span boundary (one host RTT, same sync
  the adaptive-cache driver already pays), and demotes to the plain fused
  step for the rest of the segment when chunk verification is not clearing
  its device-measured cost ratio. Worst case (adversarial random-weight
  codes: nothing repeats) is the +6% lookup tax on the probe span only —
  <1% of a full segment — which is what makes this safe to run by DEFAULT.

Token-stream semantics are the SEQUENTIAL sampler's: every committed token
is sampled from logits conditioned only on committed history, with the same
rng-split chain, the same HF-ordered warper stack, and the same faithful
quirks (fake-prefix repetition counts, mel-pos off-by-one). Because the rng
carried out of a chunk is the state after exactly (committed) splits, the
stream stays aligned with `generate()` across BOTH span boundaries and the
spec->plain demotion — `tests/test_speculative.py` pins token equality for
oracle, adversarial, lookup, and gated-demotion paths. The only difference
from `generate()` is which PROGRAM computes the logits (chunked vs
single-step matmuls), i.e. float-reassociation noise; bit-exact on the CPU
f32 lane, see docs/KERNELS.md §1 for the device caveat.

The reference has no analogue of any of this (its HF `generate` is strictly
one forward per token; reference decode loop
`indextts/gpt/transformers_generation_utils.py:2988-3065`; HF's
`_assisted_decoding` exists in the vendored utils but is never wired).
Default-on in the pipeline for B=1 segments; `INDEXTTS_SPEC_DECODE=0`
disables, `=<gamma>` overrides gamma.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from indextts_tpu.config import GPTConfig
from indextts_tpu.engine.decode import (SamplingConfig, _cache_len,
                                        _continue_span, _decode_step,
                                        _embed_mel_token, _fused_decode_ok,
                                        _min_len_mask, _prefill_state)
from indextts_tpu.models.gpt.gpt2 import GPT2Dims, gpt2_chunk_step
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


def _spec_span_body(params: Params, cfg: GPTConfig, dims: GPT2Dims, state,
                    P: int, end, max_new_tokens: int,
                    sampling: SamplingConfig, dtype, gamma: int, ngram: int,
                    forced: bool, draft_source: jnp.ndarray):
    """Speculative decode loop over steps [state.step, end).

    `state` is the plain decode state tuple (step, tokens, counts, kv,
    kv_valid, finished, lengths, rng) + a trailing stats (3,) int32 entry
    [chunk verifies, tokens committed by chunks, single-step fallbacks].
    The cache must be sized for `end` generated tokens; chunks only fire
    when their gamma+1 writes fit inside `end`, so span-bounded runs are
    token-identical to a single full-range run up to WHICH program computes
    each logit (same guard the full-range form uses with
    end == max_new_tokens).
    """
    B = state[1].shape[0]
    V = cfg.number_mel_codes
    stop = cfg.stop_mel_token
    fused = _fused_decode_ok(params, dims, B, sampling.kv_quant)
    if max_new_tokens < 2:
        # token 0 came from the prefill; the loop below would never run
        # (cond: step=1 < end<=1 is false) but lax.cond still TRACES the
        # chunk branch, whose gamma+1 >= 2 writes cannot fit a width-1
        # token buffer — return the state unchanged (exactly what a
        # never-entered while_loop does)
        return state
    # a chunk's gamma+1 writes must FIT the (B, max_new_tokens) token buffer
    # at trace time, even though the runtime guard already skips chunks that
    # would cross `end` (short segments: max_mel_tokens=8 with gamma=8)
    gamma = max(1, min(gamma, max_new_tokens - 1))
    G1 = gamma + 1
    S = state[3]["k"].shape[2]

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

    def single_branch(st):
        """One token — exactly generate()'s loop body."""
        (step, tokens, counts, kv, kv_valid, finished, lengths, rng, _,
         stats) = st
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

    def chunk_branch(st):
        """Verify gamma drafted tokens with one chunk forward; commit the
        matching prefix plus the first correction token."""
        (step, tokens, counts, kv, kv_valid, finished, lengths, rng, draft,
         stats) = st
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

    def cond(st):
        step = st[0]
        finished = st[5]
        return jnp.logical_and(step < end, ~jnp.all(finished))

    def body(st):
        (step, tokens, counts, kv, kv_valid, finished, lengths, rng, _,
         stats) = st
        if forced:
            start = jnp.clip(step, 0, max_new_tokens - gamma)
            draft = jax.lax.dynamic_slice(draft_source, (start,), (gamma,))
            have = jnp.bool_(True)
        else:
            draft, have = _lookup_draft(tokens[0], step, gamma, ngram)
        have = jnp.logical_and(have, step + gamma + 1 <= end)
        st = (step, tokens, counts, kv, kv_valid, finished, lengths, rng,
              draft, stats)
        return jax.lax.cond(have, chunk_branch, single_branch, st)

    st10 = state[:8] + (jnp.zeros((gamma,), jnp.int32), state[8])
    out = jax.lax.while_loop(cond, body, st10)
    return out[:8] + (out[9],)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dims", "max_new_tokens", "span_end", "sampling",
                     "dtype", "gamma", "ngram", "forced"))
def _spec_prefill_and_span(params: Params, cfg: GPTConfig, dims: GPT2Dims,
                           prefix_embeds, prefix_mask, rng,
                           max_new_tokens: int, span_end: int,
                           sampling: SamplingConfig, dtype, gamma: int,
                           ngram: int, forced: bool,
                           draft_source: jnp.ndarray):
    P = prefix_embeds.shape[1]
    state = _prefill_state(params, cfg, dims, prefix_embeds, prefix_mask, rng,
                           max_new_tokens, span_end, sampling, dtype)
    state = state + (jnp.zeros((3,), jnp.int32),)
    return _spec_span_body(params, cfg, dims, state, P, span_end,
                           max_new_tokens, sampling, dtype, gamma, ngram,
                           forced, draft_source)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dims", "max_new_tokens", "span_end", "sampling",
                     "dtype", "gamma", "ngram", "forced"),
    donate_argnames=("state",))
def _spec_continue_span(params: Params, cfg: GPTConfig, dims: GPT2Dims,
                        state, P: int, max_new_tokens: int, span_end: int,
                        sampling: SamplingConfig, dtype, gamma: int,
                        ngram: int, forced: bool, draft_source: jnp.ndarray):
    return _spec_span_body(params, cfg, dims, state, P, span_end,
                           max_new_tokens, sampling, dtype, gamma, ngram,
                           forced, draft_source)


def generate_spec(params: Params, cfg: GPTConfig, dims: GPT2Dims,
                  prefix_embeds: jnp.ndarray, prefix_mask: jnp.ndarray,
                  rng: jax.Array, max_new_tokens: int,
                  sampling: SamplingConfig = SamplingConfig(),
                  dtype=jnp.bfloat16, gamma: int = 8, ngram: int = 2,
                  forced: bool = False,
                  draft_source: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`generate()` with speculative chunk-verify; B must be 1.

    forced=True reads drafts from `draft_source` ((max_new_tokens,) int32)
    instead of prompt lookup — the test/bench hook: oracle drafts (the
    sequence the sequential sampler emits) exercise full-accept, adversarial
    drafts exercise full-reject; output must equal `generate()` either way.
    Returns (codes (1, max_new_tokens), lengths (1,), stats (3,) int32)
    where stats = [chunk verifies, tokens committed by chunks, single-step
    fallbacks] — the acceptance observability a deployment needs to decide
    whether speculation clears break-even (docs/KERNELS.md §1): commits per
    chunk ≈ stats[1] / stats[0].
    """
    assert prefix_embeds.shape[0] == 1, \
        "speculative decode is a B=1 (single-segment) path"
    if draft_source is None:
        draft_source = jnp.zeros((max_new_tokens,), jnp.int32)
    state = _spec_prefill_and_span(
        params, cfg, dims, prefix_embeds, prefix_mask, rng, max_new_tokens,
        max_new_tokens, sampling, dtype, gamma, ngram, forced, draft_source)
    _, tokens, _, _, _, _, lengths, _, stats = state
    return tokens, jnp.minimum(lengths, max_new_tokens), stats


def spec_commit_ratio(gamma: int) -> float:
    """Device-measured break-even: a chunk verify of gamma drafts costs
    c(gamma) ≈ base * (1.62 + 0.045*gamma) per commit (fit of the round-4
    A/B: c(4)/base = 1.80, c(8)/base = 1.98; the step is ~0.8 ms weight DMA
    + ~0.1 ms per extra position, docs/KERNELS.md §1). Speculation wins
    while the observed commits-per-chunk exceeds this ratio."""
    return 1.62 + 0.045 * gamma


def generate_spec_adaptive(params: Params, cfg: GPTConfig, dims: GPT2Dims,
                           prefix_embeds, prefix_mask, rng,
                           max_new_tokens: int,
                           sampling: SamplingConfig = SamplingConfig(),
                           dtype=jnp.bfloat16, gamma: int = 8,
                           ngram: int = 2,
                           spans=(256, 512, 1024, 1536),
                           commit_ratio: Optional[float] = None,
                           forced: bool = False,
                           draft_source: Optional[jnp.ndarray] = None
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Self-gating speculative decode with a growing KV cache (B=1).

    `generate_adaptive()`'s span driver with speculation layered on top:
    the first span (256 tokens — the SAME ladder as the plain driver, so
    the span structure, program count, and host-RTT count match the
    non-speculative path exactly) is the online acceptance PROBE. At every
    span boundary the host reads (finished, step, stats) — the same single
    RTT the plain adaptive driver pays — and, while speculating, demotes to
    the plain fused step for the remaining spans when the cumulative
    commits-per-chunk falls below the device cost ratio
    `spec_commit_ratio(gamma)` (or no chunk ever fired). Because the rng
    carried out of a chunk equals the sequential stream state, the demotion
    is seamless: the whole run stays token-identical to `generate()` for a
    given rng regardless of WHERE the gate trips.

    Worst case (adversarial codes, nothing repeats): the ~6% no-match
    lookup tax applies to the probe span only — ~13 ms of a 500-token
    segment (~1.4%); segments that finish inside the probe pay up to 6% of
    their decode, bounded by design (a 64-token probe was tried first and
    its EXTRA span boundary cost more than the tax it saved: +3.5%
    end-to-end on device). Best case (repetitive codes):
    c(gamma)/(gamma+1) = 0.19 ms/token at gamma=8 vs the 0.87 baseline.
    Returns (codes, lengths, stats) like `generate_spec`.
    """
    import numpy as np

    assert prefix_embeds.shape[0] == 1, \
        "speculative decode is a B=1 (single-segment) path"
    if draft_source is None:
        draft_source = jnp.zeros((max_new_tokens,), jnp.int32)
    ratio = commit_ratio if commit_ratio is not None else spec_commit_ratio(gamma)
    spans = tuple(s for s in spans if s < max_new_tokens) + (max_new_tokens,)
    P = prefix_embeds.shape[1]
    fused = _fused_decode_ok(params, dims, 1, sampling.kv_quant)

    state = _spec_prefill_and_span(
        params, cfg, dims, prefix_embeds, prefix_mask, rng, max_new_tokens,
        spans[0], sampling, dtype, gamma, ngram, forced, draft_source)
    use_spec = True
    stats = state[8]
    for nxt in spans[1:]:
        step, tokens, counts, kv, kv_valid, finished, lengths, rng_s = state[:8]
        stats = state[8]
        # ONE batched host readback per span boundary (full RTT on relay)
        fin, st, ch, com = jax.device_get(
            (jnp.all(finished), step, stats[0], stats[1]))
        if bool(fin) or int(st) >= max_new_tokens:
            break
        if use_spec:
            ch, com = int(ch), int(com)
            if ch == 0 or com < ratio * ch:
                use_spec = False  # speculation is not paying — demote
        grow = _cache_len(P, nxt, fused) - kv["k"].shape[2]
        kv = {name: jnp.pad(buf, [(0, 0), (0, 0), (0, grow)]
                            + [(0, 0)] * (buf.ndim - 3))
              for name, buf in kv.items()}
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, grow)))
        st8 = (step, tokens, counts, kv, kv_valid, finished, lengths, rng_s)
        if use_spec:
            state = _spec_continue_span(
                params, cfg, dims, st8 + (stats,), P, max_new_tokens, nxt,
                sampling, dtype, gamma, ngram, forced, draft_source)
        else:
            state = _continue_span(params, cfg, dims, st8, P, max_new_tokens,
                                   nxt, sampling, dtype) + (stats,)
    _, tokens, _, _, _, _, lengths, _ = state[:8]
    return tokens, jnp.minimum(lengths, max_new_tokens), state[8]

"""On-device sampling ops for the AR decode loop.

Replaces the host-side HF LogitsProcessor pipeline
(`gpt/transformers_generation_utils.py:3123` `_sample`) and the accel engine's
`Sampler` (`accel/accel_engine.py:16-31`) with pure-XLA ops that live inside
the jitted decode loop — no host round-trip per token.

Semantics match HF exactly (order: repetition penalty -> temperature -> top-k
-> top-p -> categorical sample):

- repetition penalty: scores of previously-seen tokens are divided by the
  penalty if positive, multiplied if negative (HF RepetitionPenaltyLogitsProcessor).
  "Seen" is tracked as an on-device per-token count buffer.
- top-k: everything below the k-th logit -> -inf.
- top-p: tokens whose *exclusive* cumulative probability (descending order)
  exceeds top_p -> -inf (equivalent to HF's ascending <= 1-p rule).
- typical sampling: entropy-based filter (reference `utils/typical_sampling.py`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e10)


def apply_repetition_penalty(logits: jnp.ndarray, token_counts: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    """logits (B, V), token_counts (B, V) int — HF RepetitionPenaltyLogitsProcessor."""
    if penalty == 1.0:
        return logits
    seen = token_counts > 0
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(seen, penalized, logits)


def apply_temperature(logits: jnp.ndarray, temperature) -> jnp.ndarray:
    return logits / jnp.maximum(jnp.asarray(temperature, logits.dtype), 1e-5)


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0:
        return logits
    k = min(k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]  # descending
    probs = jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1)
    cum_excl = jnp.cumsum(probs, axis=-1) - probs
    keep_sorted = cum_excl < top_p  # argmax always kept (cum_excl == 0)
    # threshold logit: smallest kept logit
    kept_logits = jnp.where(keep_sorted, sorted_logits, jnp.inf)
    threshold = jnp.min(kept_logits, axis=-1, keepdims=True)
    return jnp.where(logits < threshold, NEG_INF, logits)


def apply_typical(logits: jnp.ndarray, mass: float = 0.9,
                  min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """TypicalLogitsWarper (reference `utils/typical_sampling.py:1-30`)."""
    lf = logits.astype(jnp.float32)
    normalized = jax.nn.log_softmax(lf, axis=-1)
    p = jnp.exp(normalized)
    ent = -jnp.sum(jnp.where(p > 0, p * normalized, 0.0), axis=-1, keepdims=True)
    shifted = jnp.abs(-normalized - ent)
    order = jnp.argsort(shifted, axis=-1)
    sorted_logits = jnp.take_along_axis(lf, order, axis=-1)
    cumprobs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    last_ind = jnp.sum((cumprobs < mass).astype(jnp.int32), axis=-1, keepdims=True)
    last_ind = jnp.maximum(last_ind, min_tokens_to_keep - 1)
    ranks = jnp.argsort(order, axis=-1)  # rank of each vocab entry
    remove = ranks > last_ind
    return jnp.where(remove, NEG_INF, logits)


def sample_logits(rng: jax.Array, logits: jnp.ndarray,
                  token_counts: Optional[jnp.ndarray] = None,
                  temperature: float = 0.8, top_k: int = 30, top_p: float = 0.8,
                  repetition_penalty: float = 10.0,
                  do_sample: bool = True,
                  typical_mass: Optional[float] = None) -> jnp.ndarray:
    """Full HF-ordered sampling chain; logits (B, V) -> token ids (B,).

    Fast path: with top_k in (0, 256] and no typical warper, top-p runs on the
    k top-k survivors instead of sorting the whole vocab — exactly equivalent
    to HF's chain (after top-k masking only k finite logits remain, so the
    masked softmax/cumsum only involves them) and removes the O(V log V)
    per-step sort from the decode loop.
    """
    lf = logits.astype(jnp.float32)
    if token_counts is not None:
        lf = apply_repetition_penalty(lf, token_counts, repetition_penalty)
    if not do_sample:
        return jnp.argmax(lf, axis=-1).astype(jnp.int32)
    lf = apply_temperature(lf, temperature)

    if typical_mass is None and 0 < top_k <= 256:
        vals, idx = jax.lax.top_k(lf, top_k)      # (B, K) descending
        if top_p < 1.0:
            probs = jax.nn.softmax(vals, axis=-1)
            cum_excl = jnp.cumsum(probs, axis=-1) - probs
            vals = jnp.where(cum_excl < top_p, vals, NEG_INF)
        choice = jax.random.categorical(rng, vals, axis=-1)
        return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)

    lf = apply_top_k(lf, top_k)
    if typical_mass is not None:
        lf = apply_typical(lf, typical_mass)
    lf = apply_top_p(lf, top_p)
    return jax.random.categorical(rng, lf, axis=-1).astype(jnp.int32)

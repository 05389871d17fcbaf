"""Golden tests: on-device sampling ops vs HuggingFace logits processors."""

import numpy as np
import pytest
import torch

from indextts_tpu.ops.sampling import (apply_repetition_penalty, apply_top_k,
                                       apply_top_p, apply_typical)


@pytest.fixture
def logits(rng):
    return rng.standard_normal((3, 50)).astype(np.float32) * 3.0


def _masked_equal(ours, theirs):
    ours = np.asarray(ours)
    theirs = np.asarray(theirs)
    mask_ours = ours < -1e8
    mask_theirs = ~np.isfinite(theirs) | (theirs < -1e8)
    np.testing.assert_array_equal(mask_ours, mask_theirs)
    np.testing.assert_allclose(np.where(mask_ours, 0, ours), np.where(mask_theirs, 0, theirs), atol=1e-5)


def test_top_k_matches_hf(logits):
    from transformers.generation.logits_process import TopKLogitsWarper

    hf = TopKLogitsWarper(top_k=7)(None, torch.tensor(logits)).numpy()
    _masked_equal(apply_top_k(logits, 7), hf)


def test_top_p_matches_hf(logits):
    from transformers.generation.logits_process import TopPLogitsWarper

    for p in (0.3, 0.8, 0.95):
        hf = TopPLogitsWarper(top_p=p)(None, torch.tensor(logits)).numpy()
        _masked_equal(apply_top_p(logits, p), hf)


def test_repetition_penalty_matches_hf(logits, rng):
    from transformers.generation.logits_process import RepetitionPenaltyLogitsProcessor

    input_ids = rng.integers(0, 50, size=(3, 20))
    counts = np.zeros((3, 50), np.int32)
    for b in range(3):
        for t in input_ids[b]:
            counts[b, t] += 1
    hf = RepetitionPenaltyLogitsProcessor(penalty=10.0)(
        torch.tensor(input_ids), torch.tensor(logits)).numpy()
    ours = apply_repetition_penalty(logits, counts, 10.0)
    np.testing.assert_allclose(np.asarray(ours), hf, atol=1e-5)


def test_typical_matches_reference_impl(logits):
    """Compare against a direct numpy port of the reference TypicalLogitsWarper
    (`utils/typical_sampling.py:1-30`)."""
    t = torch.tensor(logits)
    normalized = torch.nn.functional.log_softmax(t, dim=-1)
    p = torch.exp(normalized)
    ent = -(normalized * p).nansum(-1, keepdim=True)
    shifted_scores = torch.abs((-normalized) - ent)
    sorted_scores, sorted_indices = torch.sort(shifted_scores, descending=False)
    sorted_logits = t.gather(-1, sorted_indices)
    cumulative_probs = sorted_logits.softmax(dim=-1).cumsum(dim=-1)
    last_ind = (cumulative_probs < 0.9).sum(dim=1)
    last_ind[last_ind < 0] = 0
    sorted_indices_to_remove = sorted_scores > sorted_scores.gather(1, last_ind.view(-1, 1))
    indices_to_remove = sorted_indices_to_remove.scatter(1, sorted_indices, sorted_indices_to_remove)
    expect = t.masked_fill(indices_to_remove, -float("inf")).numpy()
    _masked_equal(apply_typical(logits, 0.9), expect)


def test_fast_topk_topp_path_equivalent(rng):
    """The top-k→top-p fast path must define the same support and probabilities
    as the full-vocab chain."""
    import jax
    import jax.numpy as jnp

    from indextts_tpu.ops.sampling import (apply_temperature, apply_top_k,
                                           apply_top_p)

    logits = rng.standard_normal((4, 200)).astype(np.float32) * 4.0
    temperature, top_k, top_p = 0.8, 30, 0.8

    # slow path support + probs
    lf = apply_temperature(jnp.asarray(logits), temperature)
    slow = apply_top_p(apply_top_k(lf, top_k), top_p)
    slow_probs = np.asarray(jax.nn.softmax(slow, axis=-1))

    # fast path (mirrors sample_logits' internals)
    vals, idx = jax.lax.top_k(lf, top_k)
    probs = jax.nn.softmax(vals, axis=-1)
    cum_excl = jnp.cumsum(probs, axis=-1) - probs
    vals = jnp.where(cum_excl < top_p, vals, -1e10)
    fast_sub = np.asarray(jax.nn.softmax(vals, axis=-1))
    fast_probs = np.zeros_like(slow_probs)
    idx = np.asarray(idx)
    for b in range(4):
        fast_probs[b, idx[b]] = fast_sub[b]
    np.testing.assert_allclose(fast_probs, slow_probs, atol=1e-5)

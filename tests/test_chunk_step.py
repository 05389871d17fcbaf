"""gpt2_chunk_step == G sequential single-token steps (the speculative-decode
verify primitive): same hiddens, same cache contents, on every cache layout.

The chunk step exists so a B=1 decode can verify G drafted tokens with ONE
weight stream (docs/KERNELS.md §1 floor analysis); these tests pin that it is
a pure re-batching of the sequential math — any divergence would silently
corrupt speculative decoding's exactness claim.

Baselines: 5D layouts compare against `gpt2_decode_step` (the XLA decode
path); flat layouts (which single-step only via the fused Pallas kernel)
compare against G=1 chunk calls — multi-token == sequential single-token of
the same math, which is exactly the property the speculative engine composes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indextts_tpu.models.gpt.gpt2 import (GPT2Dims, gpt2_chunk_step,
                                          gpt2_decode_step, gpt2_prefill,
                                          init_gpt2, init_kv_cache)
from indextts_tpu.nn import InitRng

DIMS = GPT2Dims(layers=2, dim=64, heads=4)
B, P, S, G = 2, 5, 24, 4


def _setup(flat, quantized, dtype=jnp.float32):
    params = jax.tree_util.tree_map(jnp.asarray, init_gpt2(InitRng(0), DIMS))
    r = np.random.default_rng(1)
    prefix = jnp.asarray(r.standard_normal((B, P, DIMS.dim)) * 0.3, dtype)
    mask = jnp.asarray([[False] + [True] * (P - 1), [True] * P])
    kv = init_kv_cache(DIMS, B, S, dtype=dtype, quantized=quantized, flat=flat)
    _, kv = gpt2_prefill(params, prefix, DIMS, mask, kv)
    kv_valid = jnp.zeros((B, S), bool).at[:, :P].set(mask)
    xs = jnp.asarray(r.standard_normal((B, G, DIMS.dim)) * 0.3, dtype)
    return params, kv, kv_valid, xs


@pytest.mark.parametrize("flat,quantized", [(False, False), (True, False),
                                            (False, True), (True, True)])
def test_chunk_matches_sequential(flat, quantized):
    params, kv, kv_valid, xs = _setup(flat, quantized)

    # sequential: G single-token steps, validity committed before each step
    kv_s, valid_s = kv, kv_valid
    hs = []
    for g in range(G):
        if flat:
            h, kv_s = gpt2_chunk_step(params, xs[:, g:g + 1], DIMS,
                                      jnp.int32(P + g), kv_s, valid_s)
            h = h[:, 0]
        else:
            valid_s = valid_s.at[:, P + g].set(True)
            h, kv_s = gpt2_decode_step(params, xs[:, g], DIMS,
                                       jnp.int32(P + g), kv_s, valid_s)
        hs.append(h)
        if flat:
            valid_s = valid_s.at[:, P + g].set(True)
    hs = jnp.stack(hs, axis=1)

    # chunk: one call, validity committed after
    hc, kv_c = gpt2_chunk_step(params, xs, DIMS, jnp.int32(P), kv, kv_valid)

    np.testing.assert_allclose(np.asarray(hc, np.float32),
                               np.asarray(hs, np.float32),
                               rtol=2e-4, atol=2e-4)
    for key in kv_s:
        np.testing.assert_allclose(
            np.asarray(kv_c[key], np.float32)[:, :, :P + G],
            np.asarray(kv_s[key], np.float32)[:, :, :P + G],
            rtol=2e-4, atol=2e-4, err_msg=key)


def test_chunk_flat_matches_5d_decode_step():
    """Flat-layout chunk hiddens == the 5D XLA decode path's hiddens (same
    bf16 cache values, different storage layout)."""
    params, kv5, kv_valid, xs = _setup(False, False)
    _, kvf, _, _ = _setup(True, False)
    kv_s, valid_s = kv5, kv_valid
    hs = []
    for g in range(G):
        valid_s = valid_s.at[:, P + g].set(True)
        h, kv_s = gpt2_decode_step(params, xs[:, g], DIMS, jnp.int32(P + g),
                                   kv_s, valid_s)
        hs.append(h)
    hc, _ = gpt2_chunk_step(params, xs, DIMS, jnp.int32(P), kvf, kv_valid)
    np.testing.assert_allclose(np.asarray(hc, np.float32),
                               np.asarray(jnp.stack(hs, 1), np.float32),
                               rtol=2e-4, atol=2e-4)


def test_chunk_does_not_attend_past_self():
    """Query g must not see chunk slots > g: perturbing x[:, 2:] with noise
    cannot change hiddens 0..1 (intra-chunk causality). A constant shift
    would be nulled by layer norm — use noise."""
    params, kv, kv_valid, xs = _setup(True, False)
    h1, _ = gpt2_chunk_step(params, xs, DIMS, jnp.int32(P), kv, kv_valid)
    noise = jnp.asarray(
        np.random.default_rng(7).standard_normal(xs[:, 2:].shape),
        xs.dtype)
    xs2 = xs.at[:, 2:].add(noise)
    h2, _ = gpt2_chunk_step(params, xs2, DIMS, jnp.int32(P), kv, kv_valid)
    np.testing.assert_allclose(np.asarray(h1[:, :2], np.float32),
                               np.asarray(h2[:, :2], np.float32),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(h1[:, 2:] - h2[:, 2:])).max() > 1e-3


def test_chunk_ignores_unwritten_valid_false_slots():
    """Slots past the chunk stay untouched and unattended."""
    params, kv, kv_valid, xs = _setup(True, False)
    poisoned = dict(kv)
    poisoned["k"] = kv["k"].at[:, :, P + G:].set(99.0)
    poisoned["v"] = kv["v"].at[:, :, P + G:].set(99.0)
    h1, _ = gpt2_chunk_step(params, xs, DIMS, jnp.int32(P), kv, kv_valid)
    h2, _ = gpt2_chunk_step(params, xs, DIMS, jnp.int32(P), poisoned,
                            kv_valid)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

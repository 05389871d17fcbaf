"""Single-block VMEM attention kernel vs the dense masked softmax."""

import numpy as np

import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.ops.pallas.attn import single_block_attention


def test_single_block_attention_matches_dense(rng):
    B, H, T, D = 3, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    lens = jnp.asarray([256, 100, 1], jnp.int32)
    mask = (jnp.arange(T)[None, :] < lens[:, None])[:, None, None, :]
    ref = np.asarray(nn.mha(q, k, v, mask=mask))
    got = np.asarray(single_block_attention(q, k, v, lens, interpret=True))
    for b, L in enumerate(np.asarray(lens)):
        np.testing.assert_allclose(got[b, :, :L], ref[b, :, :L], atol=2e-5,
                                   rtol=1e-4)


def test_single_block_attention_bf16(rng):
    B, H, T, D = 2, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    lens = jnp.asarray([128, 77], jnp.int32)
    mask = (jnp.arange(T)[None, :] < lens[:, None])[:, None, None, :]
    ref = np.asarray(nn.mha(q, k, v, mask=mask), np.float32)
    got = np.asarray(single_block_attention(q, k, v, lens, interpret=True),
                     np.float32)
    for b, L in enumerate(np.asarray(lens)):
        np.testing.assert_allclose(got[b, :, :L], ref[b, :, :L], atol=3e-2,
                                   rtol=3e-2)

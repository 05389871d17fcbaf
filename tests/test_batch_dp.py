"""Batch-parallel decode across the dp mesh axis (TPU analogue of
`bucket_segments`, SURVEY.md §2.11/§7: segments -> chips)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.engine.decode import SamplingConfig, generate
from indextts_tpu.models.gpt import gpt2
from indextts_tpu.models.gpt.unified_voice import (init_unified_voice,
                                                   prepare_prefix_embeds)
from indextts_tpu.nn import InitRng
from indextts_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_tree
from tests.test_gpt_engine import TINY


def test_generate_dp_sharded_matches_single():
    """B=8 decode sharded over 8 dp devices must equal the unsharded decode."""
    params = init_unified_voice(InitRng(2), TINY)
    dims = gpt2.GPT2Dims(TINY.layers, TINY.model_dim, TINY.heads)
    B, L = 8, 4
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(2, 40, (B, L)), jnp.int32)
    lens = jnp.full((B,), L, jnp.int32)
    conds = jnp.zeros((B, 3, TINY.model_dim), jnp.float32)
    emb, mask = prepare_prefix_embeds(params, TINY, conds, text, lens, 9)
    s = SamplingConfig(do_sample=False, repetition_penalty=1.0)

    ref_codes, ref_lens = generate(params, TINY, dims, emb, mask,
                                   jax.random.PRNGKey(0), max_new_tokens=6,
                                   sampling=s, dtype=jnp.float32)

    mesh = make_mesh(8, tp=1)
    params_s = shard_tree(mesh, params)
    emb_s = jax.device_put(emb, batch_sharding(mesh))
    mask_s = jax.device_put(mask, batch_sharding(mesh))
    codes, lens_out = generate(params_s, TINY, dims, emb_s, mask_s,
                               jax.device_put(jax.random.PRNGKey(0),
                                              replicated(mesh)),
                               max_new_tokens=6, sampling=s, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref_codes))
    np.testing.assert_array_equal(np.asarray(lens_out), np.asarray(ref_lens))

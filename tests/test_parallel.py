"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from indextts_tpu.parallel.mesh import (batch_sharding, gpt_param_shardings,
                                        make_mesh, replicated, shard_tree)


def test_mesh_factoring():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp", "tp")
    mesh2 = make_mesh(8, tp=2)
    assert mesh2.devices.shape == (4, 2)
    mesh1 = make_mesh(1)
    assert mesh1.devices.shape == (1, 1)


def test_gpt_param_shardings_tp():
    from indextts_tpu.models.gpt.gpt2 import GPT2Dims, init_gpt2
    from indextts_tpu.nn import InitRng

    mesh = make_mesh(8, tp=2)
    params = init_gpt2(InitRng(0), GPT2Dims(2, 64, 4))
    sh = gpt_param_shardings(mesh, params)
    # column-parallel qkv: (L, in, out) sharded on out
    assert sh["h"]["attn"]["c_attn"]["kernel"].spec == P(None, None, "tp")
    assert sh["h"]["attn"]["c_attn"]["bias"].spec == P(None, "tp")
    # row-parallel out proj: sharded on in
    assert sh["h"]["attn"]["c_proj"]["kernel"].spec == P(None, "tp", None)
    assert sh["h"]["mlp"]["c_fc"]["kernel"].spec == P(None, None, "tp")
    assert sh["h"]["mlp"]["c_proj"]["kernel"].spec == P(None, "tp", None)
    # norms replicated
    assert sh["h"]["ln_1"]["weight"].spec == P()
    assert sh["ln_f"]["weight"].spec == P()


def test_sharded_gpt_forward_matches_single_device():
    """TP-sharded forward must equal the unsharded result (GSPMD inserts the
    collectives; numerics must not change)."""
    from indextts_tpu.models.gpt.gpt2 import GPT2Dims, gpt2_forward, init_gpt2
    from indextts_tpu.nn import InitRng

    dims = GPT2Dims(2, 64, 4)
    params = init_gpt2(InitRng(0), dims)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 10, 64)), jnp.float32)

    ref = np.asarray(gpt2_forward(params, x, dims))

    mesh = make_mesh(8, tp=2)
    sh = gpt_param_shardings(mesh, params)
    params_s = shard_tree(mesh, params, sh)
    x_s = jax.device_put(x, batch_sharding(mesh))
    out = jax.jit(lambda p, x: gpt2_forward(p, x, dims))(params_s, x_s)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


def test_train_step_multichip():
    """The full dryrun (mesh + sharded GPT-CE + CFM train step) as a test."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_train_step_single_device():
    import __graft_entry__ as ge

    ge.dryrun_multichip(1)

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
    """The full dryrun (mesh + sharded GPT-CE + CFM train step) as a test.

    Runs in a SUBPROCESS with one retry: on a loaded 1-CPU box the XLA CPU
    backend's collective rendezvous can hit its 40 s termination timeout
    and hard-abort the process ("Expected N threads to join") — an
    environment artifact, not a sharding bug (the identical code passes on
    an idle box; see CLAUDE.md). In-process that abort would kill the whole
    pytest run; isolation converts it into a retryable failure."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the axon sitecustomize pins jax_platforms at interpreter start; env
    # vars do NOT override it — an explicit config.update does (CLAUDE.md)
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import __graft_entry__ as ge; ge.dryrun_multichip(8); "
            "print('DRYRUN_OK')")
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
           "JAX_PLATFORMS": "cpu"}
    last = None
    for attempt in range(2):
        proc = subprocess.run([sys.executable, "-c", code], cwd=repo,
                              env=env, capture_output=True, text=True,
                              timeout=3000)
        last = proc
        if proc.returncode == 0 and "DRYRUN_OK" in proc.stdout:
            return
        if "rendezvous" not in (proc.stderr or "") and proc.returncode != -6:
            break  # a real failure — don't mask it with a retry
    raise AssertionError(
        f"dryrun_multichip(8) failed (rc={last.returncode}):\n"
        f"{last.stdout[-2000:]}\n{last.stderr[-3000:]}")


def test_train_step_single_device():
    import __graft_entry__ as ge

    ge.dryrun_multichip(1)


def test_seq_parallel_cfm_matches_single_device():
    """Sequence-parallel CFM/DiT (time axis over sp) must equal the
    unsharded run: GSPMD partitions the backbone spatially and inserts the
    attention k/v all-gather; numerics must not change."""
    from indextts_tpu.config import (DiTConfig, LengthRegulatorConfig,
                                     S2MelConfig, StyleEncoderConfig,
                                     WaveNetConfig)
    from indextts_tpu.models.s2mel.cfm import cfm_inference
    from indextts_tpu.models.s2mel.dit import init_dit
    from indextts_tpu.nn import InitRng
    from indextts_tpu.parallel.mesh import seq_sharding

    s2 = S2MelConfig(
        DiT=DiTConfig(hidden_dim=64, num_heads=4, depth=2, in_channels=8,
                      content_dim=16, final_layer_type="wavenet"),
        wavenet=WaveNetConfig(hidden_dim=64, num_layers=3, kernel_size=5,
                              dilation_rate=1, p_dropout=0.0,
                              style_condition=True),
        style_encoder=StyleEncoderConfig(dim=12),
        length_regulator=LengthRegulatorConfig(channels=16, is_discrete=True,
                                               content_codebook_size=32,
                                               sampling_ratios=(1, 1)),
    )
    params = init_dit(InitRng(0), s2)
    rng = np.random.default_rng(1)
    B, T = 2, 64
    mu = jnp.asarray(rng.standard_normal((B, T, 16)), jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((B, T, 8)), jnp.float32)
    style = jnp.asarray(rng.standard_normal((B, 12)), jnp.float32)
    x_lens = jnp.asarray([T, 40], jnp.int32)
    p_lens = jnp.asarray([8, 8], jnp.int32)
    key = jax.random.PRNGKey(7)

    ref = np.asarray(cfm_inference(params, s2, mu, x_lens, prompt, style,
                                   key, n_timesteps=4, prompt_len=p_lens))

    mesh = make_mesh(8, tp=1, sp=4)
    assert mesh.devices.shape == (2, 4, 1)
    ss = seq_sharding(mesh)
    assert ss is not None and ss.spec == P("dp", "sp", None)
    # two-axis mesh has no sp -> helper declines
    assert seq_sharding(make_mesh(8, tp=2)) is None

    put = lambda a: jax.device_put(a, ss)
    mu_s, prompt_s = put(mu), put(prompt)
    out = jax.jit(
        lambda m, pr: cfm_inference(params, s2, m, x_lens, pr, style, key,
                                    n_timesteps=4, prompt_len=p_lens,
                                    seq_sharding=ss))(mu_s, prompt_s)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)

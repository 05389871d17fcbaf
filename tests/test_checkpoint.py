"""Native checkpoint I/O round-trips."""

import numpy as np
import pytest

import jax.numpy as jnp

from indextts_tpu.models.gpt.gpt2 import GPT2Dims, init_gpt2
from indextts_tpu.nn import InitRng
from indextts_tpu.utils.checkpoint import (load_params_npz, save_params_npz)


def test_npz_roundtrip(tmp_path):
    params = init_gpt2(InitRng(0), GPT2Dims(2, 32, 4))
    p = str(tmp_path / "gpt.npz")
    save_params_npz(p, params)
    loaded = load_params_npz(p, params)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from indextts_tpu.utils.checkpoint import (load_params_orbax,
                                               save_params_orbax)

    params = init_gpt2(InitRng(1), GPT2Dims(2, 32, 4))
    # orbax wants device arrays
    import jax

    params = jax.device_put(params)
    p = str(tmp_path / "ckpt")
    save_params_orbax(p, params)
    loaded = load_params_orbax(p, params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

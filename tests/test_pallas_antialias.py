"""Fused Pallas anti-alias activation vs the XLA composite (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from indextts_tpu.ops.pallas.antialias import fused_antialias_activation
from indextts_tpu.ops.snake import antialias_activation


def test_fused_matches_composite(rng):
    B, T, C = 2, 512, 128
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.3)

    ref = np.asarray(antialias_activation(x, alpha, beta))
    out = np.asarray(fused_antialias_activation(x, alpha, beta,
                                                t_tile=256, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_fused_matches_composite_masked(rng):
    """Valid-length rows must match the composite (incl. the dynamic right
    edge's 2x-rate replication semantics)."""
    B, T, C = 2, 256, 128
    lens = np.asarray([200, 131], np.int32)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    for b in range(B):
        x[b, lens[b]:] = 0.0
    xj = jnp.asarray(x)
    alpha = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.3)

    ref = np.asarray(antialias_activation(xj, alpha, beta,
                                          lengths=jnp.asarray(lens)))
    out = np.asarray(fused_antialias_activation(xj, alpha, beta,
                                                lengths=jnp.asarray(lens),
                                                t_tile=128, interpret=True))
    for b in range(B):
        np.testing.assert_allclose(out[b, : lens[b]], ref[b, : lens[b]],
                                   atol=2e-5, rtol=1e-4)


def test_fused_xla_matches_composite_varlen():
    """The shift-and-sum serving path == literal up2->snake->down2 composite,
    including replicate-edge handling at per-row valid lengths."""
    import jax.numpy as jnp
    import numpy as np
    from indextts_tpu.ops.snake import (antialias_activation,
                                        antialias_activation_composite)

    rng = np.random.default_rng(11)
    B, T, C = 3, 64, 16
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    alpha = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
    for lengths in (None, jnp.asarray([64, 37, 1])):
        for b in (None, beta):
            ref = np.asarray(antialias_activation_composite(x, alpha, b, lengths))
            out = np.asarray(antialias_activation(x, alpha, b, lengths))
            if lengths is None:
                np.testing.assert_allclose(out, ref, atol=2e-5)
            else:
                for i, L in enumerate(np.asarray(lengths)):
                    np.testing.assert_allclose(out[i, :L], ref[i, :L], atol=2e-5)


@pytest.mark.parametrize("T,C,f", [(256, 24, 16), (512, 48, 8), (512, 96, 4),
                                   (256, 192, 2), (1024, 384, 1)])
def test_folded_matches_composite(rng, T, C, f):
    """Folded-lane fused kernel == composite at every BigVGAN fold factor,
    including short valid lengths (2x-rate edge replication)."""
    from indextts_tpu.ops.pallas.antialias import fused_antialias_folded

    B = 2
    x = jnp.asarray(rng.standard_normal((B, T, C)) * 2, jnp.float32)
    alpha = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
    lens = jnp.asarray([T, max(T - 37, 1)], jnp.int32)
    ref = np.asarray(antialias_activation(x, alpha, beta, lens))
    out = np.asarray(fused_antialias_folded(x, alpha, beta, f, lens,
                                            r_tile=min(256, T // f),
                                            interpret=True))
    for b, L in enumerate(np.asarray(lens)):
        np.testing.assert_allclose(out[b, :L], ref[b, :L], atol=2e-5,
                                   rtol=1e-4)


def test_folded_dispatch_shapes():
    """snake.antialias_activation picks the folded kernel only at foldable
    shapes; unfoldable shapes stay on the XLA composite path."""
    from indextts_tpu.ops.snake import _folded_plan

    assert _folded_plan(229376, 24) == (16, 256)
    assert _folded_plan(3584, 768) == (1, 256)
    assert _folded_plan(100, 24) is None          # T not divisible
    assert _folded_plan(256, 17) is None          # no lane-aligned fold


def test_int8_matvec_interpret_matches_dense():
    import jax.numpy as jnp
    import numpy as np
    from indextts_tpu.ops.pallas.int8_matmul import int8_matvec

    rng = np.random.default_rng(3)
    for (M, K, N, bn) in ((1, 64, 256, 128), (3, 96, 384, 128)):
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        ref = np.asarray(jnp.dot(x, wq.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32))
        out = np.asarray(int8_matvec(x, wq, block_n=bn, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("T,C,f,edge_len", [
    (256, 24, 16, 219), (512, 48, 8, 475), (512, 96, 4, 1),
    (256, 192, 2, 129),
])
def test_prefolded_matches_folded(rng, T, C, f, edge_len):
    """Stage-carried prefolded entry == the unfolded-boundary kernel: the
    edge snakes computed from two-row folded windows must equal the clean
    unfolded gathers, including lengths that land mid-row / at row seams."""
    from indextts_tpu.ops.pallas.antialias import (fused_antialias_folded,
                                                   fused_antialias_prefolded)

    B = 2
    x = jnp.asarray(rng.standard_normal((B, T, C)) * 2, jnp.float32)
    alpha = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C) * 0.3, jnp.float32)
    lens = jnp.asarray([T, edge_len], jnp.int32)
    rt = min(256, T // f)
    ref = np.asarray(fused_antialias_folded(x, alpha, beta, f, lens,
                                            r_tile=rt, interpret=True))
    out = np.asarray(fused_antialias_prefolded(
        x.reshape(B, T // f, f * C), alpha, beta, f, C, lens, r_tile=rt,
        interpret=True)).reshape(B, T, C)
    for b, L in enumerate(np.asarray(lens)):
        np.testing.assert_allclose(out[b, :L], ref[b, :L], atol=2e-5,
                                   rtol=1e-4)

"""Single-block attention Pallas kernel for mid-length sequences.

The DiT attends over T ~ 1.2k tokens: the dense XLA path materializes the
(B, H, T, T) f32 scores in HBM (~340 MB per layer at serving batch), and
jax's reference flash kernel ships a Mosaic payload too large for the axon
remote-compile relay. At these lengths the whole score matrix FITS IN VMEM
(T=1536: 9 MB f32), so the simplest possible kernel wins: one grid step per
(batch, head) computes q@k^T, the length-masked f32 softmax, and probs@v
entirely on-chip — HBM sees only q, k, v reads and the output write.

Numerics match `nn.mha` (f32 softmax, probs cast to the value dtype before
the PV matmul). Rows past `lengths` attend nothing (uniform probs over the
masked -1e9 scores -> harmless garbage); callers mask by length downstream.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    b = pl.program_id(0)
    T = q_ref.shape[2]
    q = q_ref[0, 0].astype(jnp.float32)                      # (T, D)
    k = k_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    length = len_ref[b]
    key_ok = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1) < length
    s = jnp.where(key_ok, s, jnp.float32(-1e9))
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def single_block_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           lengths: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """(B, H, T, D) x (B, H, T, D) -> (B, H, T, D); per-row valid `lengths`
    restrict the keys every query attends to (non-causal)."""
    B, H, T, D = q.shape
    scale = 1.0 / math.sqrt(D)
    kernel = functools.partial(_kernel, scale=scale)
    spec = pl.BlockSpec((1, 1, T, D), lambda b, h, *_: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H),
            in_specs=[spec, spec, spec],
            out_specs=spec,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k.astype(q.dtype), v.astype(q.dtype))

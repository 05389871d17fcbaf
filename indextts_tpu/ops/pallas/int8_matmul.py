"""Weight-only int8 matmul kernel for the AR decode hot path.

The GPT decode step is HBM-bound on weight reads (SURVEY.md perf model; the
reference reaches the same regime with CUDA-graph decode + fp16 weights,
`indextts/accel/accel_engine.py:221-376`). XLA's scan-pipelined dequantized
matmuls sustain ~47% of HBM bandwidth on v5e; this kernel streams the int8
weight column-blocks through VMEM with pallas' automatic block double
buffering and dequantizes in-register, so each weight byte is read from HBM
exactly once per token.

Measured on v5e (24x1280 GPT, S=321, int8): XLA decode step 1.23 ms vs
1.43 ms with the fused-MLP kernel and 1.57 ms with per-matmul kernels.
XLA wins because lax.scan pipelines the NEXT layer's weight fetches behind
the current layer's compute — a cross-call overlap pallas_call cannot
express. XLA therefore remains the decode default (nn.dense); these kernels
are kept as the native-equivalent implementation (exactness pinned by
tests/test_pallas_antialias.py) and the base for a future manually-DMA'd
multi-layer kernel.

Layout: x (M, K) bf16 with tiny M (1-8 rows, the single-stream decode);
wq (K, N) int8, per-output-channel scale (N,) f32 applied by the caller
(kept outside the kernel so XLA fuses it with bias/residual consumers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, o_ref):
    xv = x_ref[...]
    wv = w_ref[...].astype(jnp.bfloat16)
    o_ref[...] = jnp.dot(xv, wv, preferred_element_type=jnp.float32)


def _gelu_new(x):
    # HF gelu_new (tanh approximation) — must match nn.gelu_new exactly
    return 0.5 * x * (1.0 + jnp.tanh(
        0.7978845608028654 * (x + 0.044715 * x * x * x)))


def _mlp_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xv = x_ref[...]                                   # (M, K) bf16
    w1 = w1_ref[...].astype(jnp.bfloat16)             # (K, bk)
    h = jnp.dot(xv, w1, preferred_element_type=jnp.float32)
    h = h * s1_ref[...] + b1_ref[...]                 # (M, bk) f32
    # match the XLA path bit-for-bit: dense() rounds to bf16, gelu_new
    # computes in f32 and rounds back to bf16
    h = h.astype(jnp.bfloat16).astype(jnp.float32)
    h = _gelu_new(h).astype(jnp.bfloat16)
    w2 = w2_ref[...].astype(jnp.bfloat16)             # (bk, K)
    acc_ref[...] += jnp.dot(h, w2, preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("block_k2", "interpret"))
def int8_mlp(x: jnp.ndarray, w1q: jnp.ndarray, s1: jnp.ndarray, b1: jnp.ndarray,
             w2q: jnp.ndarray, block_k2: int = 512,
             interpret: bool = False) -> jnp.ndarray:
    """Fused gelu MLP: gelu_new(x @ w1q * s1 + b1) @ w2q -> (M, K) f32.

    Streams both int8 weight matrices through VMEM exactly once per token in
    a single kernel (one launch instead of the matmul/gelu/matmul chain).
    w2's per-channel scale and bias are applied by the caller (linear, so
    they commute with the block accumulation).
    s1, b1: (1, N) f32. Grid runs over the hidden dim N in block_k2 chunks.
    """
    M, K = x.shape
    Kw, N = w1q.shape
    assert (K, N % block_k2, w2q.shape) == (Kw, 0, (N, K)), \
        (x.shape, w1q.shape, w2q.shape, block_k2)
    return pl.pallas_call(
        _mlp_kernel,
        grid=(N // block_k2,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0)),
            pl.BlockSpec((K, block_k2), lambda i: (0, i)),
            pl.BlockSpec((1, block_k2), lambda i: (0, i)),
            pl.BlockSpec((1, block_k2), lambda i: (0, i)),
            pl.BlockSpec((block_k2, K), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((M, K), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, K), jnp.float32)],
        interpret=interpret,
    )(x, w1q, s1, b1, w2q)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int8_matvec(x: jnp.ndarray, wq: jnp.ndarray, block_n: int = 512,
                interpret: bool = False) -> jnp.ndarray:
    """(M, K) bf16 @ (K, N) int8 -> (M, N) f32 (no scale/bias — caller fuses).

    K and N must be multiples of the int8 tile (32, 128); block_n divides N.
    """
    M, K = x.shape
    Kw, N = wq.shape
    assert K == Kw and N % block_n == 0, (x.shape, wq.shape, block_n)
    return pl.pallas_call(
        _kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0)),
            pl.BlockSpec((K, block_n), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(x, wq)

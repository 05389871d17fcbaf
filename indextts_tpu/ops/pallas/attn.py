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


def _packed_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                   T: int, D: int, q_chunk: int):
    """Pair-packed attention over one (T, 2D) lane slice of the natural
    (T, H*D) layout; see packed_pair_attention for the layout trick. The
    grid is (B, H//2): keeping the pair loop OUT of the kernel bounds the
    unrolled f32 score temporaries (one pair's worth, not H//2 of them) —
    the all-pairs-in-one-step form OOM'd scoped VMEM at T=2304 (107.7 MB)."""
    b = pl.program_id(0)
    length = len_ref[b]
    ks = k_ref[0]                                   # (T, 2D) tile-aligned
    vs = v_ref[0]
    q2 = q_ref[0]
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * D), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (q_chunk, 2 * T), 1)
    keyj = jnp.where(col >= T, col - T, col)
    key_ok = keyj < length
    # block-diag key matrix: rows 0:T carry head 2p (lanes < D), rows
    # T:2T head 2p+1 (lanes >= D); the off-head lanes are zeroed so one
    # full-depth (T, 2D) x (2T, 2D) contraction yields both heads'
    # scores side by side — K=2D=128 keeps the MXU on full tiles
    # (measured 152 TF/s vs ~16 TF/s for the per-head K=64 form).
    k_lo = jnp.where(lane2 < D, ks, jnp.zeros_like(ks))
    k_hi = jnp.where(lane2 >= D, ks, jnp.zeros_like(ks))
    k2 = jnp.concatenate([k_lo, k_hi], axis=0)      # (2T, 2D)
    v_lo = jnp.where(lane2 < D, vs, jnp.zeros_like(vs))
    v_hi = jnp.where(lane2 >= D, vs, jnp.zeros_like(vs))
    for c in range(T // q_chunk):
        rows = slice(c * q_chunk, (c + 1) * q_chunk)
        s = jax.lax.dot_general(
            q2[rows], k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (qc, 2T)
        s = jnp.where(key_ok, s, jnp.float32(-1e9))
        s_lo, s_hi = s[:, :T], s[:, T:]
        m_lo = jnp.max(s_lo, axis=1, keepdims=True)
        m_hi = jnp.max(s_hi, axis=1, keepdims=True)
        p_lo = jnp.exp(s_lo - m_lo)
        p_hi = jnp.exp(s_hi - m_hi)
        r_lo = jnp.sum(p_lo, axis=1, keepdims=True)
        r_hi = jnp.sum(p_hi, axis=1, keepdims=True)
        # v_lo / v_hi carry zeros on the other head's lanes, so the two
        # (qc, T) x (T, 2D) products land disjoint lane halves
        o_lo = jnp.dot(p_lo.astype(vs.dtype), v_lo,
                       preferred_element_type=jnp.float32) / r_lo
        o_hi = jnp.dot(p_hi.astype(vs.dtype), v_hi,
                       preferred_element_type=jnp.float32) / r_hi
        o_ref[0, rows] = (o_lo + o_hi).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def packed_pair_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          lengths: jnp.ndarray, heads: int,
                          interpret: bool = False) -> jnp.ndarray:
    """(B, T, H*D) attention without head transposes.

    Equivalent to single_block_attention on the (B, H, T, D) transposes of
    the inputs, but ~5x faster at DiT shapes: the per-(b, h) grid form pays
    K=64 contractions (~16 TF/s on the MXU) plus 128 small grid steps; this
    kernel grids over (batch, head-pair) and processes heads in PAIRS on
    128-lane slices of the natural layout — full-depth K=128 scores (one
    (T, 2D) x (2T, 2D) block-diag contraction per pair, 152 TF/s measured)
    and zero-padded (qc, T) x (T, 2D) PV products that write both heads'
    lanes at once. Requires H even, D=64-style H*D lane tiling (2D == 128),
    T % q_chunk == 0.

    Numerics identical to single_block_attention (f32 softmax with rowmax,
    probs cast to v dtype before PV; the divide moves after PV, a pure f32
    reorder). Rows past `lengths` attend a uniform distribution (garbage);
    callers mask downstream.
    """
    B, T, HD = q.shape
    D = HD // heads
    assert heads % 2 == 0 and 2 * D == 128, (heads, D)
    # larger q chunks amortize the mask/softmax bookkeeping, but the f32
    # (qc, 2T) score temporaries of the unrolled loops stack up in VMEM —
    # beyond T=1536 drop to 128-row chunks to stay inside the raised limit
    q_chunk = 384 if T % 384 == 0 and T <= 1536 else 128
    assert T % q_chunk == 0, T
    scale = 1.0 / math.sqrt(D)
    kernel = functools.partial(_packed_kernel, scale=scale, T=T,
                               D=D, q_chunk=q_chunk)
    spec = pl.BlockSpec((1, T, 2 * D), lambda b, p, *_: (b, 0, p),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, heads // 2),
            in_specs=[spec, spec, spec],
            out_specs=spec,
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, HD), q.dtype),
        # the unrolled chunk loop keeps several (qc, 2T) f32 score
        # temporaries live at once; v5e has 128 MB of VMEM, so raise the
        # 16 MB default rather than shrink the tiles
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k.astype(q.dtype), v.astype(q.dtype))


def _packed_rope_kernel(len_ref, cs_ref, q_ref, k_ref, v_ref, o_ref, *,
                        scale: float, T: int, D: int, q_chunk: int):
    """Pair-packed attention with HALF-SPLIT ROPE fused in.

    q_ref/k_ref carry PRE-rope rows; cs_ref is (T, 4D) f32 = [C | S] where
    C tiles cos over each D/2 lane group and S carries (-sin, +sin)
    alternating, so rope is `x*C + swap(x)*S` with swap exchanging adjacent
    D/2 lane halves. The swap is a 0/1 permutation applied as ONE bf16
    (T, 2D) x (2D, 2D) matmul — exact (each output row sums one value) and
    ~0.5 us on the MXU, vs the XLA-side rope's ~5 ms/step of narrow-lane
    (64) elementwise traffic over the (B, T, H, D) layout. f32 multiply-add
    ordering matches ops/rope.py::apply_rotary_emb_half exactly.
    """
    b = pl.program_id(0)
    length = len_ref[b]
    vs = v_ref[0]
    C = cs_ref[:, : 2 * D]
    S = cs_ref[:, 2 * D:]
    row = jax.lax.broadcasted_iota(jnp.int32, (2 * D, 2 * D), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (2 * D, 2 * D), 1)
    half = D // 2
    target = jnp.where(row % D < half, row + half, row - half)
    P = (col == target).astype(q_ref.dtype)

    def rope(x):
        sw = jax.lax.dot_general(x, P, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        r = x.astype(jnp.float32) * C + sw * S
        return r.astype(x.dtype)

    q2 = rope(q_ref[0])
    ks = rope(k_ref[0])
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * D), 1)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (q_chunk, 2 * T), 1)
    keyj = jnp.where(col2 >= T, col2 - T, col2)
    key_ok = keyj < length
    k_lo = jnp.where(lane2 < D, ks, jnp.zeros_like(ks))
    k_hi = jnp.where(lane2 >= D, ks, jnp.zeros_like(ks))
    k2 = jnp.concatenate([k_lo, k_hi], axis=0)
    v_lo = jnp.where(lane2 < D, vs, jnp.zeros_like(vs))
    v_hi = jnp.where(lane2 >= D, vs, jnp.zeros_like(vs))
    for c in range(T // q_chunk):
        rows = slice(c * q_chunk, (c + 1) * q_chunk)
        s = jax.lax.dot_general(
            q2[rows], k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(key_ok, s, jnp.float32(-1e9))
        s_lo, s_hi = s[:, :T], s[:, T:]
        m_lo = jnp.max(s_lo, axis=1, keepdims=True)
        m_hi = jnp.max(s_hi, axis=1, keepdims=True)
        p_lo = jnp.exp(s_lo - m_lo)
        p_hi = jnp.exp(s_hi - m_hi)
        r_lo = jnp.sum(p_lo, axis=1, keepdims=True)
        r_hi = jnp.sum(p_hi, axis=1, keepdims=True)
        o_lo = jnp.dot(p_lo.astype(vs.dtype), v_lo,
                       preferred_element_type=jnp.float32) / r_lo
        o_hi = jnp.dot(p_hi.astype(vs.dtype), v_hi,
                       preferred_element_type=jnp.float32) / r_hi
        o_ref[0, rows] = (o_lo + o_hi).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def packed_pair_attention_rope(q: jnp.ndarray, k: jnp.ndarray,
                               v: jnp.ndarray, lengths: jnp.ndarray,
                               freqs_cis: jnp.ndarray, heads: int,
                               interpret: bool = False) -> jnp.ndarray:
    """packed_pair_attention with the half-split rope applied IN-KERNEL.

    q, k are pre-rope (B, T, H*D) rows straight off the wqkv split (the
    deinterleaved-column layout apply_rotary_emb_half expects); freqs_cis
    is the (>=T, D//2, 2) cos/sin table from precompute_freqs_cis. Saves
    the XLA-side rope — ~6 elementwise passes over (B, T, H, D) tiles
    whose 64-wide lane dim wastes half the VPU — and the layout round-trip
    at the kernel boundary. Numerics: rope in f32 exactly as
    apply_rotary_emb_half, then identical attention math.
    """
    B, T, HD = q.shape
    D = HD // heads
    assert heads % 2 == 0 and 2 * D == 128, (heads, D)
    q_chunk = 384 if T % 384 == 0 and T <= 1536 else 128
    assert T % q_chunk == 0, T
    scale = 1.0 / math.sqrt(D)
    cos = freqs_cis[:T, :, 0].astype(jnp.float32)     # (T, D/2)
    sin = freqs_cis[:T, :, 1].astype(jnp.float32)
    C = jnp.concatenate([cos, cos, cos, cos], axis=1)  # (T, 2D)
    S = jnp.concatenate([-sin, sin, -sin, sin], axis=1)
    cs = jnp.concatenate([C, S], axis=1)               # (T, 4D) f32
    kernel = functools.partial(_packed_rope_kernel, scale=scale, T=T,
                               D=D, q_chunk=q_chunk)
    spec = pl.BlockSpec((1, T, 2 * D), lambda b, p, *_: (b, 0, p),
                        memory_space=pltpu.VMEM)
    cs_spec = pl.BlockSpec((T, 4 * D), lambda b, p, *_: (0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, heads // 2),
            in_specs=[cs_spec, spec, spec, spec],
            out_specs=spec,
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(lengths.astype(jnp.int32), cs, q, k.astype(q.dtype),
      v.astype(q.dtype))


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

"""Minimal functional NN layer library (param pytrees + pure functions).

Design: every model in this framework is a pure function over a nested dict of
jnp arrays. No module state, no tracing magic — params are explicit pytrees so
they can be sharded with `jax.sharding`, donated, converted from torch
checkpoints mechanically, and closed over by jitted programs.

Conventions:
- Dense kernels are stored (in, out) — apply as ``x @ kernel``; the torch
  converter transposes ``nn.Linear.weight``.
- Conv1d kernels are stored (width, in, out) for ``lax.conv_general_dilated``
  with dimension_numbers ('NWC','WIO','NWC'); torch Conv1d weight (out,in,w)
  converts via transpose(2,1,0). Activations are (batch, time, channels)
  everywhere — the TPU-friendly layout (channels on the 128-lane minor dim).
- Compute dtype is configurable; params default to fp32 and are cast at use.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializers (numpy host-side: cheap, deterministic, no device churn)
# ---------------------------------------------------------------------------

class InitRng:
    """Stateful numpy RNG wrapper for parameter initialization.

    Returns HOST (numpy) arrays: building a ~1B-param tree must not issue one
    device transfer per tensor (each is an RPC on remote-attached TPUs).
    Callers move the finished tree with a single `jax.device_put`.
    """

    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)

    def normal(self, shape, std=0.02):
        return self.rng.normal(0.0, std, size=shape).astype(np.float32)

    def uniform(self, shape, a, b):
        return self.rng.uniform(a, b, size=shape).astype(np.float32)

    def zeros(self, shape):
        return np.zeros(shape, dtype=np.float32)

    def ones(self, shape):
        return np.ones(shape, dtype=np.float32)

    def kaiming_conv1d(self, width, in_ch, out_ch, groups=1):
        # torch Conv1d default: kaiming_uniform(a=sqrt(5)) == U(-b, b),
        # b = 1/sqrt(fan_in), fan_in = in_ch/groups * width
        fan_in = (in_ch // groups) * width
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return self.uniform((width, in_ch // groups, out_ch), -bound, bound)

    def kaiming_dense(self, in_dim, out_dim):
        bound = 1.0 / math.sqrt(in_dim)
        return self.uniform((in_dim, out_dim), -bound, bound)

    def xavier_uniform(self, shape):
        fan_in, fan_out = shape[0], shape[-1]
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return self.uniform(shape, -bound, bound)


# ---------------------------------------------------------------------------
# dense / embedding
# ---------------------------------------------------------------------------

def dense_init(rng: InitRng, in_dim: int, out_dim: int, bias: bool = True,
               std: Optional[float] = None) -> Params:
    if std is None:
        kernel = rng.kaiming_dense(in_dim, out_dim)
        b_bound = 1.0 / math.sqrt(in_dim)
        p = {"kernel": kernel}
        if bias:
            p["bias"] = rng.uniform((out_dim,), -b_bound, b_bound)
    else:
        p = {"kernel": rng.normal((in_dim, out_dim), std)}
        if bias:
            p["bias"] = rng.zeros((out_dim,))
    return p


def dense(p: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    dtype = dtype or x.dtype
    # tp-kernel storage keeps packed qkv as (in, 3, out) with (3, out)
    # scale/bias (ops/pallas/decode_step_tp.gpt_tp_layout); the XLA paths
    # consume it through a trailing-dim flatten (pure reshape, same bytes)
    def w2(w):
        return w.reshape(w.shape[0], -1) if w.ndim == 3 else w

    def v1(v):
        return v.reshape(-1) if v.ndim == 2 else v

    p = {k: (w2(v) if k in ("q", "q4", "kernel") else
             v1(v) if k in ("scale", "bias") else v)
         for k, v in p.items()}
    if "q" in p:
        # weight-only int8: HBM holds int8 (2x less traffic than bf16);
        # dequant fuses into the matmul, per-out-channel scale applies after
        y = jnp.dot(x, p["q"].astype(dtype), preferred_element_type=jnp.float32)
        y = y * p["scale"].astype(jnp.float32)
    elif "q4" in p:
        # weight-only int4 (two values per byte): nibble-unpack on the fly.
        # The hot decode loop unpacks inside the fused Pallas kernel; this
        # XLA form serves prefill and the fallback path (amortized there).
        w = unpack_int4(p["q4"]).astype(dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        y = y * p["scale"].astype(jnp.float32)
    else:
        y = jnp.dot(x, p["kernel"].astype(dtype), preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def quantize_dense_int8(p: Params) -> Params:
    """Per-output-channel symmetric int8 quantization of a dense kernel."""
    if "kernel" not in p:
        return p
    w = np.asarray(p["kernel"], np.float32)
    # per-output-channel over the contraction axis (supports stacked (L, in, out))
    scale = np.maximum(np.max(np.abs(w), axis=-2, keepdims=True), 1e-8) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    out = {"q": q, "scale": scale.astype(np.float32)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def _int4_halfspan(half_k: int) -> int:
    """Rows are packed in groups of 2h originals (lo nibbles = the group's
    first h rows, hi nibbles = its last h). h = 320 keeps every 640-row
    chunk self-contained, which is exactly the fused decode kernel's weight
    DMA granularity (`ops/pallas/decode_step._BN`); shapes not divisible by
    640 fall back to one global group (XLA-path-only sizes)."""
    return 320 if half_k % 320 == 0 else half_k


def quantize_dense_int4(p: Params) -> Params:
    """Per-output-channel symmetric int4 (range [-7, 7]) of a dense kernel,
    two values packed per int8 byte along the contraction axis.

    Halves the decode loop's weight traffic AGAIN vs int8 (the loop is
    HBM-bound on weight reads); the nibble unpack runs on the VPU inside
    the fused decode kernel. Call on HOST numpy arrays before device_put
    (same layout reasoning as `quantize_dense_int8`)."""
    if "kernel" not in p:
        return p
    w = np.asarray(p["kernel"], np.float32)
    scale = np.maximum(np.max(np.abs(w), axis=-2, keepdims=True), 1e-8) / 7.0
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    K, N = w.shape[-2], w.shape[-1]
    assert K % 2 == 0, K
    h = _int4_halfspan(K // 2)
    v = q.reshape(*w.shape[:-2], K // (2 * h), 2, h, N)
    lo, hi = v[..., 0, :, :], v[..., 1, :, :]
    packed = ((hi << 4) | (lo & np.int8(0xF))).astype(np.int8)
    packed = packed.reshape(*w.shape[:-2], K // 2, N)
    out = {"q4": packed, "scale": scale.astype(np.float32)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def unpack_int4(q4: jnp.ndarray) -> jnp.ndarray:
    """Packed (..., K/2, N) int8 -> (..., K, N) int8 values in [-7, 7],
    natural row order (inverse of `quantize_dense_int4`'s packing)."""
    half, N = q4.shape[-2], q4.shape[-1]
    h = _int4_halfspan(half)
    v = q4.reshape(*q4.shape[:-2], half // h, h, N)
    hi = jax.lax.shift_right_arithmetic(v, jnp.int8(4))
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(v, jnp.int8(4)), jnp.int8(4))
    u = jnp.stack([lo, hi], axis=-3)          # (..., G, 2, h, N)
    return u.reshape(*q4.shape[:-2], 2 * half, N)


def embedding_init(rng: InitRng, num: int, dim: int, std: float = 0.02) -> Params:
    return {"weight": rng.normal((num, dim), std)}


def embedding(p: Params, ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    return p["weight"].astype(dtype)[ids]


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------

def layer_norm_init(rng: InitRng, dim: int, affine: bool = True) -> Params:
    return {"weight": rng.ones((dim,)), "bias": rng.zeros((dim,))} if affine else {}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if "weight" in p:
        y = y * p["weight"] + p["bias"]
    return y.astype(dt)


def rms_norm_init(rng: InitRng, dim: int) -> Params:
    return {"weight": rng.ones((dim,))}


def rms_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """gpt_fast-style RMSNorm: normalize in fp32, scale by weight.

    Behavioral reference: `s2mel/modules/gpt_fast/model.py:322-333`.
    """
    dt = x.dtype
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y.astype(dt) * p["weight"].astype(dt)) if "weight" in p else y.astype(dt)


def l2norm_scale_init(rng: InitRng, dim: int, scale: bool = True) -> Params:
    return {"gamma": rng.ones((dim,))} if scale else {}


def l2norm_scaled(p: Params, x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Perceiver RMSNorm variant: F.normalize(x) * sqrt(dim) * gamma.

    Behavioral reference: `gpt/perceiver.py:167-186`.
    """
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.maximum(jnp.sum(xf * xf, axis=-1, keepdims=True), 1e-24))
    y = n * math.sqrt(dim)
    if "gamma" in p:
        y = y * p["gamma"]
    return y.astype(x.dtype)


def group_norm_init(rng: InitRng, channels: int) -> Params:
    return {"weight": rng.ones((channels,)), "bias": rng.zeros((channels,))}


def group_norm(p: Params, x: jnp.ndarray, groups: int, eps: float = 1e-5,
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """GroupNorm over (B, T, C) activations (normalizes per group over T and C/G).

    ``mask`` (B, T) restricts the statistics to valid frames — needed when a
    static length bucket pads the time axis (the torch reference computes
    stats over exact-length tensors).
    """
    b, t, c = x.shape
    dt = x.dtype
    xf = x.astype(jnp.float32).reshape(b, t, groups, c // groups)
    if mask is not None:
        m = mask.astype(jnp.float32)[:, :, None, None]
        denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True) * (c // groups), 1.0)
        mu = jnp.sum(xf * m, axis=(1, 3), keepdims=True) / denom
        var = jnp.sum(jnp.square(xf - mu) * m, axis=(1, 3), keepdims=True) / denom
    else:
        mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=(1, 3), keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(b, t, c)
    return (y * p["weight"] + p["bias"]).astype(dt)


# ---------------------------------------------------------------------------
# convolutions — (B, T, C) activations
# ---------------------------------------------------------------------------

def conv1d_init(rng: InitRng, in_ch: int, out_ch: int, width: int,
                bias: bool = True, groups: int = 1) -> Params:
    p = {"kernel": rng.kaiming_conv1d(width, in_ch, out_ch, groups)}
    if bias:
        fan_in = (in_ch // groups) * width
        bound = 1.0 / math.sqrt(fan_in)
        p["bias"] = rng.uniform((out_ch,), -bound, bound)
    return p


def conv1d(p: Params, x: jnp.ndarray, stride: int = 1, padding="SAME",
           dilation: int = 1, groups: int = 1, dtype=None) -> jnp.ndarray:
    """1-D conv over (B, T, C) with kernel (W, Cin/groups, Cout)."""
    dtype = dtype or x.dtype
    kernel = p["kernel"].astype(dtype)
    if isinstance(padding, int):
        padding = [(padding, padding)]
    elif isinstance(padding, tuple):
        padding = [padding]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel,
        window_strides=(stride,),
        padding=padding if not isinstance(padding, str) else padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def conv_transpose1d(p: Params, x: jnp.ndarray, stride: int, padding: int = 0,
                     groups: int = 1, dtype=None) -> jnp.ndarray:
    """Transposed 1-D conv matching torch ConvTranspose1d semantics.

    torch: out_len = (T-1)*stride - 2*padding + width. Kernel stored
    (W, Cout/groups... ) — we store (W, Cin/groups, Cout) *in the transposed
    orientation* so the converter maps torch's (Cin, Cout/groups, W) with a
    flip+transpose. Implemented as lhs-dilated conv (XLA's native form).
    """
    dtype = dtype or x.dtype
    kernel = p["kernel"].astype(dtype)  # (W, Cin/groups, Cout) already flipped
    w = kernel.shape[0]
    pad = w - 1 - padding
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _subpixel_plan(W: int, u: int, padding: int, cin: int,
                   cout: int) -> Tuple[np.ndarray, int, int]:
    """Phase-kernel index map for convT-as-subpixel-conv.

    From the lhs-dilated form (y[o] = sum_t xd[o+t-pad]*K[t], pad=W-1-padding,
    xd the stride-u zero-inserted x): with o = u*i + p the only nonzero taps
    are t = pad - p + u*m, giving y[u*i+p] = sum_m x[i+m]*K[pad-p+u*m].
    Returns (idx (n_m, cin, u*cout) into [K.flat ++ 0], pad_l, pad_r) such
    that a plain (pad_l, pad_r)-padded n_m-tap NWC conv with
    W_sub = concat([K.flat, 0])[idx] produces (B, T, u*cout), whose row-major
    reshape to (B, u*T, cout) equals the transposed conv."""
    pad = W - 1 - padding
    valid = [(p_, m) for p_ in range(u)
             for m in range(-(W // u) - 1, W // u + 2)
             if 0 <= pad - p_ + u * m < W]
    m_min = min(m for _, m in valid)
    m_max = max(m for _, m in valid)
    n_m = m_max - m_min + 1
    zero = W * cin * cout
    idx = np.full((n_m, cin, u * cout), zero, np.int64)
    for p_, m in valid:
        t = pad - p_ + u * m
        src = (t * cin * cout
               + np.arange(cin)[:, None] * cout + np.arange(cout)[None, :])
        idx[m - m_min, :, p_ * cout:(p_ + 1) * cout] = src
    return idx, -m_min, n_m - 1 + m_min


def conv_transpose1d_subpixel(p: Params, x: jnp.ndarray, stride: int,
                              padding: int = 0, dtype=None) -> jnp.ndarray:
    """`conv_transpose1d` as a stride-1 subpixel conv: (B, T, Cin) ->
    (B, T, u*Cout) -> row-major reshape (B, u*T, Cout). Identical math to
    the lhs-dilated form (same taps, no zero-insertion work); measured
    1.11x on BigVGAN upsample shapes (/tmp/bvops3 probe)."""
    dtype = dtype or x.dtype
    kernel = p["kernel"]
    W, cin, cout = kernel.shape
    B, T, _ = x.shape
    idx, pad_l, pad_r = _subpixel_plan(W, stride, padding, cin, cout)
    wflat = jnp.concatenate(
        [kernel.reshape(-1), jnp.zeros((1,), kernel.dtype)])
    wsub = wflat[idx].astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), wsub,
        window_strides=(1,), padding=[(pad_l, pad_r)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + jnp.tile(p["bias"].astype(jnp.float32), stride)
    return y.astype(dtype).reshape(B, stride * T, cout)


def conv2d_init(rng: InitRng, in_ch: int, out_ch: int, kh: int, kw: int,
                bias: bool = True) -> Params:
    fan_in = in_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    p = {"kernel": rng.uniform((kh, kw, in_ch, out_ch), -bound, bound)}
    if bias:
        p["bias"] = rng.uniform((out_ch,), -bound, bound)
    return p


def conv2d(p: Params, x: jnp.ndarray, stride: Tuple[int, int] = (1, 1),
           padding="VALID", dtype=None) -> jnp.ndarray:
    """2-D conv over (B, H, W, C)."""
    dtype = dtype or x.dtype
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


# ---------------------------------------------------------------------------
# attention (dense, XLA-fused; the decode path uses engine/decode.py)
# ---------------------------------------------------------------------------

def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None, scale: Optional[float] = None) -> jnp.ndarray:
    """(B, H, Tq, D) x (B, H, Tk, D) -> (B, H, Tq, D), softmax in fp32."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def mha_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              lengths: jnp.ndarray, causal: bool = False,
              interpret_unused: bool = False) -> jnp.ndarray:
    """Flash attention for padded same-rate q/k (B, H, T, D) with per-row
    valid `lengths`. On TPU this is the Pallas tiled-softmax kernel (the
    (T, T) score matrix never touches HBM — the plain `mha` spends ~7 ms per
    DiT step churning it); elsewhere it falls back to `mha`.

    Pad query rows attend only the pad segment; their outputs are garbage
    and must be masked downstream (all callers already length-mask).
    Requires T a multiple of 128 (our bucket sizes are).
    """
    B, H, T, D = q.shape
    if jax.default_backend() in ("tpu", "axon") and T % 128 == 0 \
            and not causal:
        # whole-score-matrix-in-VMEM kernel: at DiT lengths (T ~ 1.2k) the
        # (T, T) scores fit on-chip, so this beats both the dense path (no
        # HBM score materialization) and jax's tiled flash kernel (whose
        # Mosaic payload also exceeds the axon relay's compile size limit)
        from indextts_tpu.ops.pallas.attn import single_block_attention

        return single_block_attention(q, k, v, lengths)
    mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, None, None, :]
    if causal:
        mask = jnp.logical_and(mask, jnp.tril(jnp.ones((T, T), bool))[None, None])
    return mha(q, k.astype(q.dtype), v.astype(q.dtype), mask=mask)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """GPT-2's tanh-approx GELU."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(0.7978845608028654 * (xf + 0.044715 * xf ** 3)))
    return y.astype(x.dtype)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (xf * jnp.tanh(jax.nn.softplus(xf))).astype(x.dtype)


def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_length) bool mask."""
    return jnp.arange(max_length)[None, :] < lengths[:, None]


def masked_reflect_pad(x: jnp.ndarray, lengths: jnp.ndarray, pad_left: int,
                       pad_right: int) -> jnp.ndarray:
    """Reflect-pad (B, T, C) around each row's *valid* region [0, len).

    Emulates torch reflect padding on exact-length tensors while keeping a
    static padded buffer: indices beyond len-1 reflect back off the valid
    boundary (needed because encodec's SConv1d reflect-pads, and our length
    buckets would otherwise reflect into the zero tail).
    """
    T = x.shape[1]
    idx = jnp.arange(-pad_left, T + pad_right)[None, :]  # (1, T+pl+pr)
    i = jnp.abs(idx)  # reflect at 0
    last = jnp.maximum(lengths[:, None] - 1, 0)
    i = last - jnp.abs(last - i)  # reflect at len-1
    i = jnp.clip(i, 0, T - 1)
    return jnp.take_along_axis(x, i[:, :, None], axis=1)


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def cast_tree(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)

"""GPT-2 decoder backbone, TPU-native.

Replaces the reference's vendored HF GPT2Model (`gpt/transformers_gpt2.py`,
1 878 LoC of eager torch) with a functional JAX transformer designed around
the two phases of TTS decoding:

- ``forward``: full-sequence causal attention (teacher forcing / latent
  extraction / prefill), one fused XLA program.
- ``decode_step``: single-token step against a preallocated dense KV cache,
  shaped for `lax.while_loop` — the analogue of the reference accel engine's
  CUDA-graph decode (`accel/accel_engine.py:221-376`), except XLA compilation
  gives the static-graph replay for free.

Layer params are stacked on a leading L axis and iterated with `lax.scan`:
compile time stays flat in depth, and the KV cache is a single (L, B, S, H, Dh)
array — the dense-TPU analogue of the reference's paged KV manager
(`accel/kv_manager.py`), without Python block bookkeeping.

Positional embeddings are handled by the caller (UnifiedVoice adds learned
mel/text position embeddings to the input embeddings; the backbone's own wpe
is null — reference `gpt/model_v2.py:272-274`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.nn import InitRng, Params


@dataclass(frozen=True)
class GPT2Dims:
    layers: int
    dim: int
    heads: int

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


def init_gpt2(rng: InitRng, dims: GPT2Dims) -> Params:
    """Stacked-layer GPT-2 params (HF init scheme: normal(0.02), zeros bias)."""
    L, D = dims.layers, dims.dim

    def layer(_):
        return {
            "ln_1": nn.layer_norm_init(rng, D),
            "attn": {
                "c_attn": nn.dense_init(rng, D, 3 * D, std=0.02),
                "c_proj": nn.dense_init(rng, D, D, std=0.02 / math.sqrt(2 * L)),
            },
            "ln_2": nn.layer_norm_init(rng, D),
            "mlp": {
                "c_fc": nn.dense_init(rng, D, 4 * D, std=0.02),
                "c_proj": nn.dense_init(rng, 4 * D, D, std=0.02 / math.sqrt(2 * L)),
            },
        }

    layers = [layer(i) for i in range(L)]
    import numpy as np
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *layers)
    return {"h": stacked, "ln_f": nn.layer_norm_init(rng, D)}


def quantize_gpt2_int8(params: Params) -> Params:
    """Weight-only int8 for the four big per-layer matmuls (decode is
    HBM-bandwidth bound on weight reads; int8 halves that vs bf16).

    Call this on HOST (numpy) arrays before the tree's jax.device_put.
    Quantizing already-on-device weights leaves the int8 tensors in a
    jit-output layout that defeats dequant fusion in the decode loop
    (~50x slower, measured)."""
    import copy

    p = dict(params)
    h = dict(p["h"])
    h["attn"] = {"c_attn": nn.quantize_dense_int8(p["h"]["attn"]["c_attn"]),
                 "c_proj": nn.quantize_dense_int8(p["h"]["attn"]["c_proj"])}
    h["mlp"] = {"c_fc": nn.quantize_dense_int8(p["h"]["mlp"]["c_fc"]),
                "c_proj": nn.quantize_dense_int8(p["h"]["mlp"]["c_proj"])}
    h["ln_1"] = p["h"]["ln_1"]
    h["ln_2"] = p["h"]["ln_2"]
    p["h"] = h
    return p


def quantize_gpt2_int4(params: Params) -> Params:
    """Weight-only int4 for the four big per-layer matmuls — halves the
    decode loop's weight DMA again vs int8 (483 -> 242 MB/token at full
    scale). The packing (640-row groups along the contraction axis,
    `nn.quantize_dense_int4`) lines up with the fused decode kernel's
    (·, 640)-row weight DMA blocks, so the in-kernel unpack is static
    nibble shifts + one concat. HOST-side (numpy), same layout rule as
    `quantize_gpt2_int8`."""
    p = dict(params)
    h = dict(p["h"])
    h["attn"] = {"c_attn": nn.quantize_dense_int4(p["h"]["attn"]["c_attn"]),
                 "c_proj": nn.quantize_dense_int4(p["h"]["attn"]["c_proj"])}
    h["mlp"] = {"c_fc": nn.quantize_dense_int4(p["h"]["mlp"]["c_fc"]),
                "c_proj": nn.quantize_dense_int4(p["h"]["mlp"]["c_proj"])}
    h["ln_1"] = p["h"]["ln_1"]
    h["ln_2"] = p["h"]["ln_2"]
    p["h"] = h
    return p


def init_kv_cache(dims: GPT2Dims, batch: int, max_len: int, dtype=jnp.bfloat16,
                  quantized: bool = False, flat: bool = False) -> Dict:
    """Dense KV cache. quantized=True stores int8 values with per-(position,
    head) f32 scales — the decode loop is HBM-bound on cache reads at large
    batch, and int8 halves that traffic (dequant fuses into the attention
    matmul reads). Prefill attention always runs full precision; only what
    the cache hands back to later steps is quantized.

    flat=True stores (L, B, S, D) with heads merged into lanes — the layout
    the fused decode kernel consumes. The 5D (L, B, S, H, Dh) layout's
    (H, Dh) minor dims get tile-padded on TPU, so a reshape at the kernel
    boundary would repack the WHOLE cache every step (measured ~0.7 ms per
    252 MB); storing flat removes the reshape from the hot loop entirely."""
    if flat:
        shape = (dims.layers, batch, max_len, dims.dim)
        if quantized:
            # int8 rows + ONE packed bf16 scale row per position: k-scales
            # on lanes [0, H), v-scales on [128, 128+H) — two tile-aligned
            # 128-lane groups whose column layout matches the kernel's
            # (B*BS, 128) per-head score/prob tensors, so dequant folds into
            # existing elementwise ops (s128 *= ks, p3 *= vs) with ZERO
            # extra matmuls. Traffic per position: 2*D int8 + 512 B vs
            # 2*D bf16 — 1.67x less cache DMA.
            return {"k": jnp.zeros(shape, jnp.int8),
                    "v": jnp.zeros(shape, jnp.int8),
                    "kvs": jnp.zeros(shape[:-1] + (256,), jnp.bfloat16)}
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    shape = (dims.layers, batch, max_len, dims.heads, dims.head_dim)
    if not quantized:
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    sshape = shape[:-1]
    return {"k": jnp.zeros(shape, jnp.int8), "v": jnp.zeros(shape, jnp.int8),
            "ks": jnp.zeros(sshape, jnp.float32),
            "vs": jnp.zeros(sshape, jnp.float32)}


def _kv_quantize(x: jnp.ndarray):
    """(..., Dh) -> (int8 values, f32 scale over the last axis)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    safe = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / safe[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _kv_dequant(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def kv_quantize_flat(k: jnp.ndarray, v: jnp.ndarray, heads: int):
    """Quantize flat (..., D) k/v rows per head for the fused int8 cache.

    Returns (k int8 (..., D), v int8 (..., D), packed scales (..., 256)
    bf16: k-scales on lanes [0, H), v-scales on [128, 128+H)). Same
    per-(position, head) max-abs scheme as `_kv_quantize`, except the scale
    is rounded to bf16 BEFORE quantizing so int8 * stored-scale
    reconstructs exactly what was quantized against.
    """
    *lead, D = k.shape
    Dh = D // heads
    pad = [(0, 0)] * len(lead)

    def quant(x):
        xf = x.reshape(*lead, heads, Dh).astype(jnp.float32)
        scale = (jnp.max(jnp.abs(xf), axis=-1) / 127.0).astype(jnp.bfloat16)
        safe = jnp.maximum(scale.astype(jnp.float32), 1e-8)
        q = jnp.clip(jnp.round(xf / safe[..., None]), -127, 127)
        return q.astype(jnp.int8).reshape(*lead, D), scale

    kq, ks = quant(k)
    vq, vs = quant(v)
    kvs = jnp.concatenate([jnp.pad(ks, pad + [(0, 128 - heads)]),
                           jnp.pad(vs, pad + [(0, 128 - heads)])], axis=-1)
    return kq, vq, kvs.astype(jnp.bfloat16)


def _attn_block(lp: Params, x: jnp.ndarray, dims: GPT2Dims,
                mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Full-sequence self-attention sublayer. x: (B, T, D)."""
    B, T, D = x.shape
    h = nn.layer_norm(lp["ln_1"], x)
    qkv = nn.dense(lp["attn"]["c_attn"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, dims.heads, dims.head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, dims.heads, dims.head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, dims.heads, dims.head_dim).transpose(0, 2, 1, 3)
    out = nn.mha(q, k, v, mask=mask)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    x = x + nn.dense(lp["attn"]["c_proj"], out)
    h = nn.layer_norm(lp["ln_2"], x)
    h = nn.dense(lp["mlp"]["c_fc"], h)
    h = nn.gelu_new(h)
    x = x + nn.dense(lp["mlp"]["c_proj"], h)
    return x


def gpt2_forward(params: Params, x: jnp.ndarray, dims: GPT2Dims,
                 attn_mask: Optional[jnp.ndarray] = None,
                 causal: bool = True) -> jnp.ndarray:
    """Full-sequence forward. x: (B, T, D) input embeddings (pos already added).

    attn_mask: optional (B, T) validity mask (left-padded batches).
    Returns final hidden states *before* ln_f (HF GPT2Model applies ln_f
    internally — we apply it here too, matching `transformer.ln_f`).
    """
    B, T, _ = x.shape
    mask = None
    if causal:
        mask = jnp.tril(jnp.ones((T, T), dtype=bool))[None, None]
    if attn_mask is not None:
        key_ok = attn_mask[:, None, None, :].astype(bool)
        mask = key_ok if mask is None else jnp.logical_and(mask, key_ok)

    def body(carry, lp):
        return _attn_block(lp, carry, dims, mask), None

    x, _ = jax.lax.scan(body, x, params["h"])
    return nn.layer_norm(params["ln_f"], x)


def gpt2_prefill(params: Params, x: jnp.ndarray, dims: GPT2Dims,
                 attn_mask: jnp.ndarray, kv_cache: Dict,
                 collect_hiddens: bool = False):
    """Prefill: full causal pass that also writes K/V into the cache at [0, T).

    Returns (hidden after ln_f (B, T, D), updated cache). With
    collect_hiddens=True additionally returns (L, B, D): each layer's block
    INPUT at the last position — HF `hidden_states[i]` for i < L (index 0 =
    the embeddings), which DoLa's premature-layer exits consume
    (reference `gpt/transformers_generation_utils.py:2640-2645`).
    """
    B, T, D = x.shape
    causal = jnp.tril(jnp.ones((T, T), dtype=bool))[None, None]
    mask = jnp.logical_and(causal, attn_mask[:, None, None, :].astype(bool))

    quantized = "ks" in kv_cache
    flat = kv_cache["k"].ndim == 4  # (L, B, S, D): fused-decode layout

    def body(carry, inputs):
        xc = carry
        xin_last = xc[:, -1, :]        # block input at the last position
        lp, cache = inputs
        h = nn.layer_norm(lp["ln_1"], xc)
        qkv = nn.dense(lp["attn"]["c_attn"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if flat:
            cache = dict(cache)
            if "kvs" in cache:
                kq, vq, kvs = kv_quantize_flat(k, v, dims.heads)
                cache["k"] = jax.lax.dynamic_update_slice(
                    cache["k"], kq, (0, 0, 0))
                cache["v"] = jax.lax.dynamic_update_slice(
                    cache["v"], vq, (0, 0, 0))
                cache["kvs"] = jax.lax.dynamic_update_slice(
                    cache["kvs"], kvs, (0, 0, 0))
            else:
                cache["k"] = jax.lax.dynamic_update_slice(
                    cache["k"], k.astype(cache["k"].dtype), (0, 0, 0))
                cache["v"] = jax.lax.dynamic_update_slice(
                    cache["v"], v.astype(cache["v"].dtype), (0, 0, 0))
            q = q.reshape(B, T, dims.heads, dims.head_dim)
            k = k.reshape(B, T, dims.heads, dims.head_dim)
            v = v.reshape(B, T, dims.heads, dims.head_dim)
            out = nn.mha(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                         v.transpose(0, 2, 1, 3), mask=mask)
            out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
            xc = xc + nn.dense(lp["attn"]["c_proj"], out)
            h = nn.layer_norm(lp["ln_2"], xc)
            h = nn.gelu_new(nn.dense(lp["mlp"]["c_fc"], h))
            xc = xc + nn.dense(lp["mlp"]["c_proj"], h)
            return xc, ((cache, xin_last) if collect_hiddens else cache)
        q = q.reshape(B, T, dims.heads, dims.head_dim)
        k = k.reshape(B, T, dims.heads, dims.head_dim)
        v = v.reshape(B, T, dims.heads, dims.head_dim)
        if quantized:
            kq, ks = _kv_quantize(k)
            vq, vs = _kv_quantize(v)
            cache = dict(cache)
            cache["k"] = jax.lax.dynamic_update_slice(cache["k"], kq,
                                                      (0, 0, 0, 0))
            cache["v"] = jax.lax.dynamic_update_slice(cache["v"], vq,
                                                      (0, 0, 0, 0))
            cache["ks"] = jax.lax.dynamic_update_slice(cache["ks"], ks,
                                                       (0, 0, 0))
            cache["vs"] = jax.lax.dynamic_update_slice(cache["vs"], vs,
                                                       (0, 0, 0))
        else:
            cache = dict(cache)
            cache["k"] = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, 0, 0, 0))
            cache["v"] = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, 0, 0, 0))
        out = nn.mha(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                     v.transpose(0, 2, 1, 3), mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        xc = xc + nn.dense(lp["attn"]["c_proj"], out)
        h = nn.layer_norm(lp["ln_2"], xc)
        h = nn.gelu_new(nn.dense(lp["mlp"]["c_fc"], h))
        xc = xc + nn.dense(lp["mlp"]["c_proj"], h)
        return xc, ((cache, xin_last) if collect_hiddens else cache)

    layer_caches = {key: kv_cache[key] for key in kv_cache}
    if collect_hiddens:
        x, (new_cache, hs_last) = jax.lax.scan(
            body, x, (params["h"], layer_caches))
        return nn.layer_norm(params["ln_f"], x), new_cache, hs_last
    x, new_cache = jax.lax.scan(body, x, (params["h"], layer_caches))
    return nn.layer_norm(params["ln_f"], x), new_cache


def _kv_dequant_flat(q8: jnp.ndarray, kvs: jnp.ndarray, heads: int,
                     offset: int, dtype) -> jnp.ndarray:
    """Dequant a flat int8 cache slice (B, S, D) against the packed bf16
    scale rows (B, S, 256); k-scales live on lanes [0, H), v-scales on
    [128, 128+H) (`offset` selects which)."""
    B, S, D = q8.shape
    Dh = D // heads
    scale = kvs[..., offset:offset + heads].astype(jnp.float32)
    x = q8.reshape(B, S, heads, Dh).astype(jnp.float32) * scale[..., None]
    return x.reshape(B, S, D).astype(dtype)


def gpt2_chunk_step(params: Params, x: jnp.ndarray, dims: GPT2Dims,
                    pos0: jnp.ndarray, kv_cache: Dict,
                    kv_valid: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
    """G-token decode step — the speculative-decode verify primitive.

    x: (B, G, D) embeddings of G CONSECUTIVE tokens (positions already
    added); their K/V are written at cache slots [pos0, pos0+G), and query
    g attends every `kv_valid` slot plus chunk slots pos0..pos0+g (the
    caller passes kv_valid WITHOUT the chunk slots and commits only the
    accepted ones afterwards). Returns (hidden (B, G, D) after ln_f,
    updated cache).

    Why it exists: one pass streams the layer weights ONCE for G tokens,
    where G single `gpt2_decode_step`s stream them G times — at B=1 the
    decode loop is weight-DMA bound (483 MB/token int8 at full scale), so
    verifying G drafted tokens costs ~1 step's DMA instead of G. The
    reference has no analogue (its HF `generate` is strictly one token per
    forward); this is the TPU-native lever the round-4 floor analysis
    (docs/KERNELS.md §1) identified as the only way under the B=1 DMA
    floor. Cache layouts and quantization variants mirror `gpt2_prefill` /
    `gpt2_decode_step` exactly.
    """
    B, G, D = x.shape
    quantized = "ks" in kv_cache or "kvs" in kv_cache
    flat = kv_cache["k"].ndim == 4
    S = kv_cache["k"].shape[2]

    # (B, 1, G, S) mask: valid committed slots OR intra-chunk causal slots
    iota_s = jnp.arange(S)
    iota_g = jnp.arange(G)
    chunk_ok = jnp.logical_and(iota_s[None, :] >= pos0,
                               iota_s[None, :] <= pos0 + iota_g[:, None])
    mask = jnp.logical_or(kv_valid[:, None, None, :], chunk_ok[None, None])

    def body(carry, inputs):
        xc, cache = carry                                 # xc: (B, G, D)
        lp, li = inputs
        h = nn.layer_norm(lp["ln_1"], xc)
        qkv = nn.dense(lp["attn"]["c_attn"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        cache = dict(cache)
        if flat:
            if quantized:
                kq, vq, kvs = kv_quantize_flat(k, v, dims.heads)
                cache["k"] = jax.lax.dynamic_update_slice(
                    cache["k"], kq[None], (li, 0, pos0, 0))
                cache["v"] = jax.lax.dynamic_update_slice(
                    cache["v"], vq[None], (li, 0, pos0, 0))
                cache["kvs"] = jax.lax.dynamic_update_slice(
                    cache["kvs"], kvs[None], (li, 0, pos0, 0))
                k8 = jax.lax.dynamic_index_in_dim(cache["k"], li, 0, False)
                v8 = jax.lax.dynamic_index_in_dim(cache["v"], li, 0, False)
                sc = jax.lax.dynamic_index_in_dim(cache["kvs"], li, 0, False)
                kc = _kv_dequant_flat(k8, sc, dims.heads, 0, xc.dtype)
                vc = _kv_dequant_flat(v8, sc, dims.heads, 128, xc.dtype)
            else:
                cache["k"] = jax.lax.dynamic_update_slice(
                    cache["k"], k.astype(cache["k"].dtype)[None],
                    (li, 0, pos0, 0))
                cache["v"] = jax.lax.dynamic_update_slice(
                    cache["v"], v.astype(cache["v"].dtype)[None],
                    (li, 0, pos0, 0))
                kc = jax.lax.dynamic_index_in_dim(cache["k"], li, 0, False)
                vc = jax.lax.dynamic_index_in_dim(cache["v"], li, 0, False)
            kc = kc.reshape(B, S, dims.heads, dims.head_dim)
            vc = vc.reshape(B, S, dims.heads, dims.head_dim)
        else:
            k4 = k.reshape(B, G, dims.heads, dims.head_dim)
            v4 = v.reshape(B, G, dims.heads, dims.head_dim)
            if quantized:
                kq, ks = _kv_quantize(k4)
                vq, vs = _kv_quantize(v4)
                cache["k"] = jax.lax.dynamic_update_slice(
                    cache["k"], kq[None], (li, 0, pos0, 0, 0))
                cache["v"] = jax.lax.dynamic_update_slice(
                    cache["v"], vq[None], (li, 0, pos0, 0, 0))
                cache["ks"] = jax.lax.dynamic_update_slice(
                    cache["ks"], ks[None], (li, 0, pos0, 0))
                cache["vs"] = jax.lax.dynamic_update_slice(
                    cache["vs"], vs[None], (li, 0, pos0, 0))
                kc = _kv_dequant(
                    jax.lax.dynamic_index_in_dim(cache["k"], li, 0, False),
                    jax.lax.dynamic_index_in_dim(cache["ks"], li, 0, False),
                    xc.dtype)
                vc = _kv_dequant(
                    jax.lax.dynamic_index_in_dim(cache["v"], li, 0, False),
                    jax.lax.dynamic_index_in_dim(cache["vs"], li, 0, False),
                    xc.dtype)
            else:
                cache["k"] = jax.lax.dynamic_update_slice(
                    cache["k"], k4.astype(cache["k"].dtype)[None],
                    (li, 0, pos0, 0, 0))
                cache["v"] = jax.lax.dynamic_update_slice(
                    cache["v"], v4.astype(cache["v"].dtype)[None],
                    (li, 0, pos0, 0, 0))
                kc = jax.lax.dynamic_index_in_dim(cache["k"], li, 0, False)
                vc = jax.lax.dynamic_index_in_dim(cache["v"], li, 0, False)
        qh = q.reshape(B, G, dims.heads, dims.head_dim).transpose(0, 2, 1, 3)
        kh = kc.transpose(0, 2, 1, 3)                     # (B, H, S, Dh)
        vh = vc.transpose(0, 2, 1, 3)
        out = nn.mha(qh, kh.astype(qh.dtype), vh.astype(qh.dtype), mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, G, D)
        xc = xc + nn.dense(lp["attn"]["c_proj"], out)
        h = nn.layer_norm(lp["ln_2"], xc)
        h = nn.gelu_new(nn.dense(lp["mlp"]["c_fc"], h))
        xc = xc + nn.dense(lp["mlp"]["c_proj"], h)
        return (xc, cache), None

    (x, new_cache), _ = jax.lax.scan(
        body, (x, {key: kv_cache[key] for key in kv_cache}),
        (params["h"], jnp.arange(dims.layers)))
    return nn.layer_norm(params["ln_f"], x), new_cache


def gpt2_decode_step(params: Params, x: jnp.ndarray, dims: GPT2Dims,
                     pos: jnp.ndarray, kv_cache: Dict,
                     kv_valid: jnp.ndarray, collect_hiddens: bool = False):
    """One decode step. x: (B, D) embedding of the current token.

    pos: scalar int32 — write index into the cache (same for the whole batch;
    left-padded batching keeps per-row alignment identical, matching the
    reference's `prepare_gpt_inputs` layout, `gpt/model_v2.py:633-696`).
    kv_valid: (B, S) bool — which cache slots are attendable (handles the
    left-pad region and not-yet-written slots).
    Returns (hidden (B, D) after ln_f, updated cache). With
    collect_hiddens=True additionally returns (L, B, D): each layer's block
    input — HF `hidden_states[i]` for i < L — for DoLa premature exits.
    """
    B, D = x.shape

    # The full cache rides the scan CARRY and is updated with a one-slot
    # dynamic_update_slice per layer, which XLA performs in place. Passing
    # the cache through scan xs/ys instead (the obvious structure) makes XLA
    # copy every layer's full (B, S, H, Dh) slice every step — measured
    # 1.97 -> 1.31 ms/step at S=513 on v5e from this change alone.
    # Matmuls stay on XLA: its scan pipelining prefetches the NEXT layer's
    # int8 weights during the current layer's compute, which per-call Pallas
    # kernels cannot (measured 1.23 ms/step XLA vs 1.43 fused-Pallas-MLP vs
    # 1.57 per-matmul Pallas at S=321; kernels kept in ops/pallas/int8_matmul).
    quantized = "ks" in kv_cache

    def body(carry, inputs):
        xc, cache = carry                                 # xc: (B, D)
        xin = xc                       # block input (HF hidden_states[li])
        lp, li = inputs
        h = nn.layer_norm(lp["ln_1"], xc)
        qkv = nn.dense(lp["attn"]["c_attn"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, 1, dims.heads, dims.head_dim)
        k = k.reshape(B, 1, dims.heads, dims.head_dim)
        v = v.reshape(B, 1, dims.heads, dims.head_dim)
        cache = dict(cache)
        if quantized:
            kq, ks = _kv_quantize(k)
            vq, vs = _kv_quantize(v)
            cache["k"] = jax.lax.dynamic_update_slice(
                cache["k"], kq[None], (li, 0, pos, 0, 0))
            cache["v"] = jax.lax.dynamic_update_slice(
                cache["v"], vq[None], (li, 0, pos, 0, 0))
            cache["ks"] = jax.lax.dynamic_update_slice(
                cache["ks"], ks[None], (li, 0, pos, 0))
            cache["vs"] = jax.lax.dynamic_update_slice(
                cache["vs"], vs[None], (li, 0, pos, 0))
            kc = _kv_dequant(
                jax.lax.dynamic_index_in_dim(cache["k"], li, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(cache["ks"], li, 0, keepdims=False),
                xc.dtype)
            vc = _kv_dequant(
                jax.lax.dynamic_index_in_dim(cache["v"], li, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(cache["vs"], li, 0, keepdims=False),
                xc.dtype)
        else:
            cache["k"] = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype)[None],
                (li, 0, pos, 0, 0))
            cache["v"] = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype)[None],
                (li, 0, pos, 0, 0))
            kc = jax.lax.dynamic_index_in_dim(cache["k"], li, 0,
                                              keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(cache["v"], li, 0,
                                              keepdims=False)
        # attention over the whole cache, masked to valid slots
        qh = q.transpose(0, 2, 1, 3)                      # (B, H, 1, Dh)
        kh = kc.transpose(0, 2, 1, 3)                     # (B, H, S, Dh)
        vh = vc.transpose(0, 2, 1, 3)
        mask = kv_valid[:, None, None, :]                 # (B, 1, 1, S)
        out = nn.mha(qh, kh.astype(qh.dtype), vh.astype(qh.dtype), mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, D)
        xc = xc + nn.dense(lp["attn"]["c_proj"], out)
        h = nn.layer_norm(lp["ln_2"], xc)
        h = nn.gelu_new(nn.dense(lp["mlp"]["c_fc"], h))
        xc = xc + nn.dense(lp["mlp"]["c_proj"], h)
        return (xc, cache), (xin if collect_hiddens else None)

    import os

    unroll = int(os.environ.get("INDEXTTS_DECODE_UNROLL", "1"))
    (x, new_cache), hs = jax.lax.scan(
        body, (x, {key: kv_cache[key] for key in kv_cache}),
        (params["h"], jnp.arange(dims.layers)), unroll=unroll)
    x = nn.layer_norm(params["ln_f"], x)
    if collect_hiddens:
        return x, new_cache, hs
    return x, new_cache

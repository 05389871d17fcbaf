"""Qwen3 causal LM, TPU-native — the emotion-text classifier backbone.

The reference runs its fine-tuned Qwen-0.6B emotion model through torch
(`/root/reference/indextts/infer_v2.py:727-838`, `AutoModelForCausalLM`);
this module replaces the torch forward/generate with a jitted JAX decode so
the whole pipeline is self-hosted on TPU. Host-side tokenization (chat
template) stays on the HF tokenizer.

Architecture (HF Qwen3): RMSNorm pre-norm, GQA attention with per-head
q/k RMS norms, rotary embeddings (half-split layout), SwiGLU MLP, optional
tied embeddings. Layers are scan-stacked like the GPT-2 engine; decode is a
`lax.while_loop` with a dense KV cache and greedy sampling (the classifier
emits a short JSON object; greedy keeps it deterministic).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu import nn
from indextts_tpu.nn import InitRng, Params


@dataclass(frozen=True)
class QwenConfig:
    vocab_size: int = 151936
    hidden_size: int = 1024
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 3072
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    tie_word_embeddings: bool = True
    eos_token_id: int = 151645  # <|im_end|>

    @classmethod
    def from_hf(cls, d: dict) -> "QwenConfig":
        eos = d.get("eos_token_id", 151645)
        if isinstance(eos, (list, tuple)):
            eos = eos[0]
        return cls(
            vocab_size=d["vocab_size"], hidden_size=d["hidden_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            num_key_value_heads=d.get("num_key_value_heads",
                                      d["num_attention_heads"]),
            head_dim=d.get("head_dim",
                           d["hidden_size"] // d["num_attention_heads"]),
            intermediate_size=d["intermediate_size"],
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            rope_theta=d.get("rope_theta", 1e6),
            tie_word_embeddings=d.get("tie_word_embeddings", True),
            eos_token_id=eos)


def init_qwen(rng: InitRng, c: QwenConfig) -> Params:
    D, H, KV, Dh, I = (c.hidden_size, c.num_attention_heads,
                       c.num_key_value_heads, c.head_dim, c.intermediate_size)
    L = c.num_hidden_layers

    def stack(shape):
        return rng.normal((L,) + shape, std=0.02)

    p: Params = {
        "embed": rng.normal((c.vocab_size, D), std=0.02),
        "layers": {
            "input_ln": np.ones((L, D), np.float32),
            "post_ln": np.ones((L, D), np.float32),
            "q_proj": stack((D, H * Dh)),
            "k_proj": stack((D, KV * Dh)),
            "v_proj": stack((D, KV * Dh)),
            "o_proj": stack((H * Dh, D)),
            "q_norm": np.ones((L, Dh), np.float32),
            "k_norm": np.ones((L, Dh), np.float32),
            "gate_proj": stack((D, I)),
            "up_proj": stack((D, I)),
            "down_proj": stack((I, D)),
        },
        "final_ln": np.ones((D,), np.float32),
    }
    if not c.tie_word_embeddings:
        p["lm_head"] = rng.normal((c.vocab_size, D), std=0.02)
    return p


def convert_qwen(sd: Dict[str, np.ndarray], c: QwenConfig) -> Params:
    """HF Qwen3ForCausalLM state dict -> stacked param tree (kernels are
    stored transposed so forward is x @ W)."""
    L = c.num_hidden_layers

    def take(fmt, transpose=True):
        ws = [np.asarray(sd[fmt.format(i)], np.float32) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return np.stack(ws)

    p: Params = {
        "embed": np.asarray(sd["model.embed_tokens.weight"], np.float32),
        "layers": {
            "input_ln": take("model.layers.{}.input_layernorm.weight",
                             transpose=False),
            "post_ln": take(
                "model.layers.{}.post_attention_layernorm.weight",
                transpose=False),
            "q_proj": take("model.layers.{}.self_attn.q_proj.weight"),
            "k_proj": take("model.layers.{}.self_attn.k_proj.weight"),
            "v_proj": take("model.layers.{}.self_attn.v_proj.weight"),
            "o_proj": take("model.layers.{}.self_attn.o_proj.weight"),
            "q_norm": take("model.layers.{}.self_attn.q_norm.weight",
                           transpose=False),
            "k_norm": take("model.layers.{}.self_attn.k_norm.weight",
                           transpose=False),
            "gate_proj": take("model.layers.{}.mlp.gate_proj.weight"),
            "up_proj": take("model.layers.{}.mlp.up_proj.weight"),
            "down_proj": take("model.layers.{}.mlp.down_proj.weight"),
        },
        "final_ln": np.asarray(sd["model.norm.weight"], np.float32),
    }
    if not c.tie_word_embeddings and "lm_head.weight" in sd:
        p["lm_head"] = np.asarray(sd["lm_head.weight"], np.float32)
    return p


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    v = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(v + eps) * w.astype(jnp.float32)).astype(x.dtype)


def _rope(x, pos, theta):
    """Half-split rotary (HF layout): x (..., T, H, Dh), pos (T,) or scalar."""
    Dh = x.shape[-1]
    half = Dh // 2
    inv = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    ang = jnp.asarray(pos, jnp.float32)[..., None] * inv      # (T, half)
    cos = jnp.cos(ang)[..., None, :]                          # (T, 1, half)
    sin = jnp.sin(ang)[..., None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1).astype(x.dtype)


def _layer_prefill(lp, c: QwenConfig, x, mask, pos):
    B, T, D = x.shape
    H, KV, Dh = c.num_attention_heads, c.num_key_value_heads, c.head_dim
    h = _rms(x, lp["input_ln"], c.rms_norm_eps)
    q = (h @ lp["q_proj"].astype(h.dtype)).reshape(B, T, H, Dh)
    k = (h @ lp["k_proj"].astype(h.dtype)).reshape(B, T, KV, Dh)
    v = (h @ lp["v_proj"].astype(h.dtype)).reshape(B, T, KV, Dh)
    q = _rms(q, lp["q_norm"], c.rms_norm_eps)
    k = _rms(k, lp["k_norm"], c.rms_norm_eps)
    q = _rope(q, pos, c.rope_theta)
    k = _rope(k, pos, c.rope_theta)
    rep = H // KV
    kr = jnp.repeat(k, rep, axis=2)
    vr = jnp.repeat(v, rep, axis=2)
    out = nn.mha(q.transpose(0, 2, 1, 3), kr.transpose(0, 2, 1, 3),
                 vr.transpose(0, 2, 1, 3), mask=mask)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
    x = x + out @ lp["o_proj"].astype(x.dtype)
    h = _rms(x, lp["post_ln"], c.rms_norm_eps)
    g = jax.nn.silu(h @ lp["gate_proj"].astype(h.dtype))
    x = x + (g * (h @ lp["up_proj"].astype(h.dtype))) \
        @ lp["down_proj"].astype(x.dtype)
    return x, k, v


def qwen_prefill(p: Params, c: QwenConfig, ids: jnp.ndarray,
                 attn_mask: jnp.ndarray, max_len: int,
                 dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, Dict]:
    """ids (B, T) left-padded; returns (last-position logits (B, V), cache).

    Cache k/v: (L, B, S, KV, Dh) with S = max_len.
    """
    B, T = ids.shape
    x = p["embed"].astype(dtype)[ids]
    pos = jnp.arange(T)
    causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
    mask = jnp.logical_and(causal, attn_mask[:, None, None, :].astype(bool))

    def body(carry, lp):
        xc = carry
        xc, k, v = _layer_prefill(lp, c, xc, mask, pos)
        return xc, (k, v)

    x, (ks, vs) = jax.lax.scan(body, x, p["layers"])
    x = _rms(x, p["final_ln"], c.rms_norm_eps)
    head = p.get("lm_head", p["embed"]).astype(dtype)
    logits = x[:, -1, :] @ head.T
    pad = max_len - T
    kc = jnp.pad(ks.astype(dtype), ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    vc = jnp.pad(vs.astype(dtype), ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    return logits.astype(jnp.float32), {"k": kc, "v": vc}


def _layer_decode(lp, c: QwenConfig, x, kfull, vfull, li, pos, kv_valid):
    B, D = x.shape
    H, KV, Dh = c.num_attention_heads, c.num_key_value_heads, c.head_dim
    h = _rms(x, lp["input_ln"], c.rms_norm_eps)
    q = (h @ lp["q_proj"].astype(h.dtype)).reshape(B, 1, H, Dh)
    k = (h @ lp["k_proj"].astype(h.dtype)).reshape(B, 1, KV, Dh)
    v = (h @ lp["v_proj"].astype(h.dtype)).reshape(B, 1, KV, Dh)
    q = _rms(q, lp["q_norm"], c.rms_norm_eps)
    k = _rms(k, lp["k_norm"], c.rms_norm_eps)
    q = _rope(q, pos[None], c.rope_theta)
    k = _rope(k, pos[None], c.rope_theta)
    kfull = jax.lax.dynamic_update_slice(kfull, k.astype(kfull.dtype)[None],
                                         (li, 0, pos, 0, 0))
    vfull = jax.lax.dynamic_update_slice(vfull, v.astype(vfull.dtype)[None],
                                         (li, 0, pos, 0, 0))
    kc = jax.lax.dynamic_index_in_dim(kfull, li, 0, keepdims=False)
    vc = jax.lax.dynamic_index_in_dim(vfull, li, 0, keepdims=False)
    rep = H // KV
    kr = jnp.repeat(kc, rep, axis=2)
    vr = jnp.repeat(vc, rep, axis=2)
    mask = kv_valid[:, None, None, :]
    out = nn.mha(q.transpose(0, 2, 1, 3), kr.astype(q.dtype).transpose(0, 2, 1, 3),
                 vr.astype(q.dtype).transpose(0, 2, 1, 3), mask=mask)
    out = out.transpose(0, 2, 1, 3).reshape(B, H * Dh)
    x = x + out @ lp["o_proj"].astype(x.dtype)
    h = _rms(x, lp["post_ln"], c.rms_norm_eps)
    g = jax.nn.silu(h @ lp["gate_proj"].astype(h.dtype))
    x = x + (g * (h @ lp["up_proj"].astype(h.dtype))) \
        @ lp["down_proj"].astype(x.dtype)
    return x, kfull, vfull


@functools.partial(jax.jit,
                   static_argnames=("c", "max_new_tokens", "dtype"))
def qwen_generate_greedy(p: Params, c: QwenConfig, ids: jnp.ndarray,
                         attn_mask: jnp.ndarray, max_new_tokens: int,
                         dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode. ids (B, P) left-padded; returns (tokens (B, N), lengths).

    Positions continue from each row's prompt length? No — HF uses absolute
    positions over the padded sequence (position_ids from the attention
    mask cumsum). Left-padded rows therefore use cumsum positions; with B=1
    (the emotion classifier) both conventions coincide.
    """
    B, P = ids.shape
    S = P + max_new_tokens
    eos = c.eos_token_id

    logits0, kv = qwen_prefill(p, c, ids, attn_mask, S, dtype=dtype)
    kv_valid = jnp.zeros((B, S), bool).at[:, :P].set(attn_mask.astype(bool))

    tok0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    tokens = jnp.full((B, max_new_tokens), eos, jnp.int32).at[:, 0].set(tok0)
    finished0 = tok0 == eos
    lengths0 = jnp.where(finished0, 1, max_new_tokens)

    def cond(st):
        step, _, _, _, finished, _ = st
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(finished))

    def body(st):
        step, tokens, kv, kv_valid, finished, lengths = st
        prev = tokens[:, step - 1]
        x = p["embed"].astype(dtype)[prev]
        pos = P + step - 1 + 0  # absolute slot of prev token
        kv_valid = kv_valid.at[:, pos].set(True)
        xh = x
        kfull, vfull = kv["k"], kv["v"]

        def lbody(carry, inputs):
            xc, kf, vf = carry
            lp, li = inputs
            xc, kf, vf = _layer_decode(lp, c, xc, kf, vf, li, pos, kv_valid)
            return (xc, kf, vf), None

        (xh, kfull, vfull), _ = jax.lax.scan(
            lbody, (xh, kfull, vfull),
            (p["layers"], jnp.arange(c.num_hidden_layers)))
        xh = _rms(xh, p["final_ln"], c.rms_norm_eps)
        head = p.get("lm_head", p["embed"]).astype(dtype)
        logits = (xh @ head.T).astype(jnp.float32)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tok = jnp.where(finished, eos, tok)
        tokens = tokens.at[:, step].set(tok)
        newly = jnp.logical_and(~finished, tok == eos)
        lengths = jnp.where(newly, step + 1, lengths)
        finished = jnp.logical_or(finished, tok == eos)
        return (step + 1, tokens, {"k": kfull, "v": vfull}, kv_valid,
                finished, lengths)

    st = (jnp.int32(1), tokens, kv, kv_valid, finished0, lengths0)
    _, tokens, _, _, _, lengths = jax.lax.while_loop(cond, body, st)
    return tokens, lengths

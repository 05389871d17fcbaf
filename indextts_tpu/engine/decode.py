"""Jitted KV-cached autoregressive decode loop — the engine room.

Replaces BOTH reference decode paths with one XLA program:
- the vendored HF `GenerationMixin.generate` + GPT2InferenceModel
  (`gpt/transformers_generation_utils.py:1869`, host Python per token), and
- the accel engine (paged KV + Triton + CUDA graphs,
  `accel/accel_engine.py:378-645`).

Design: prefill is one fused causal pass that also populates a dense
preallocated KV cache; decode is a `lax.while_loop` whose body does one
token step (scan over stacked layers, masked attention over the cache),
on-device HF-ordered sampling, stop-token bookkeeping, and early exit when
every row has emitted stop_mel. XLA compiles this once per
(prefix_bucket, max_new) pair — the TPU analogue of CUDA-graph capture,
for free, with no Python in the loop.

Faithful reference quirks (verified against `gpt/model_v2.py:120-160` and the
HF sample loop):
- mel position indices during incremental decode are [0] for start_mel and
  i+2 for the i-th generated token (the reference's off-by-one; the model was
  served this way, so we replicate it).
- HF's repetition penalty sees the *fake* prefix input_ids (all 1s plus the
  start_mel token, `model_v2.py:687-695`), so token id 1 and start_mel are
  penalized from step one. Replicated via the initial count buffer.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.config import GPTConfig
from indextts_tpu.models.gpt.gpt2 import (GPT2Dims, gpt2_decode_step,
                                          gpt2_prefill, init_kv_cache)
from indextts_tpu.models.gpt.unified_voice import mel_logits_from_hidden
from indextts_tpu.nn import Params
from indextts_tpu.ops.sampling import sample_logits


# set by the pipeline (or tests) when tp>1 decode should run the tp=2
# fused kernel under shard_map (INDEXTTS_TP_DECODE=kernel); read at trace
# time by _decode_step. None = single-device kernel / GSPMD fallback.
TP_MESH = None


def _fused_decode_ok(params: Params, dims: GPT2Dims, B: int,
                     kv_quant: bool, beam: bool = False) -> bool:
    """Route the decode step through the fused multi-layer Pallas kernel
    (`ops/pallas/decode_step.py`) when the shapes/platform support it (the
    cache is then sized by `_cache_len`, which 128-aligns the span).

    Default ON for int8 decode on TPU: measured 1.43/1.54/1.71/2.08 ms per
    token at (B=4 S=512 / 4,1024 / 8,512 / 8,1024) vs XLA's
    2.40/3.25/3.21/4.97 — 1.7-2.4x — and 1.96 at B=12/S=512.
    INDEXTTS_FUSED_DECODE=0 opts out. B <= 12 streams the cache in 64-slot
    blocks; 13-24 drop to 32-slot blocks (halved VMEM high-water mark —
    B=16's 64-slot footprint exceeded the 16 MB scope by ~0.8 MB)."""
    import os

    flag = os.environ.get("INDEXTTS_FUSED_DECODE", "1")
    if flag == "0":
        return False
    # "interp" forces the kernel in interpreter mode (CPU integration tests)
    if flag != "interp" and jax.default_backend() not in ("tpu", "axon"):
        return False
    try:
        ca = params["gpt"]["h"]["attn"]["c_attn"]
        quantized = "q" in ca or "q4" in ca
        tp_layout = "q" in ca and ca["q"].ndim == 4
    except (KeyError, TypeError):
        quantized = tp_layout = False
    # tp-kernel mode: the pipeline stored the qkv stack in the head-aligned
    # (L, D, 3, D) layout and set TP_MESH — run the tp=2 shard_map kernel
    # (ops/pallas/decode_step_tp.py). Beam ancestry composes (r5): the
    # where-chain selection acts on batch rows only, orthogonal to the
    # head-sliced Dl axis; gated at B*K <= 12 (the tp kernel streams
    # 64-slot kv blocks — the proven single-chip anc bound for that block
    # size). int8 KV keeps its single-device path (the tp kernel is
    # int8-weight + bf16-cache only); under tp it uses the XLA fallback.
    if tp_layout:
        ok = (TP_MESH is not None and not kv_quant
              and dims.dim % 1280 == 0
              and (B <= 12 if beam else B <= 24))
        return "tp" if ok else False
    # int8 KV rides the fused kernel too (flat int8 cache + packed scale
    # rows, dequant folded into the in-VMEM score/prob tensors); in beam
    # mode the values are cast to bf16 (exact) before ancestry selection
    # and the scale rows ride the same selection.
    return (quantized and B <= 24
            and dims.dim % 640 == 0 and (4 * dims.dim) % 640 == 0)


def _cache_len(P: int, span: int, fused: bool) -> int:
    """Cache size for prefix P + 1 start token + `span` generated tokens;
    the fused kernel streams the cache in 128-slot blocks, so round up
    (extra slots stay kv_valid=False)."""
    S = P + 1 + span
    return -(-S // 128) * 128 if fused else S


def _decode_step(fused: bool, params: Params, x, dims: GPT2Dims, pos, kv,
                 kv_valid, anc=None, group: int = 1):
    if fused == "tp":
        import os

        from indextts_tpu import nn
        from indextts_tpu.ops.pallas.decode_step_tp import tp_decode_step
        from jax.experimental.pallas import tpu as pltpu

        interp = os.environ.get("INDEXTTS_FUSED_DECODE", "0") == "interp"
        h, kv = tp_decode_step(TP_MESH, params["gpt"], x, dims, pos, kv,
                               kv_valid, anc=anc, group=group,
                               interpret=pltpu.InterpretParams() if interp
                               else False)
        return nn.layer_norm(params["gpt"]["ln_f"], h), kv
    if fused:
        import os

        from indextts_tpu.ops.pallas.decode_step import fused_decode_step

        interp = os.environ.get("INDEXTTS_FUSED_DECODE", "0") == "interp"
        return fused_decode_step(params["gpt"], x, dims, pos, kv, kv_valid,
                                 interpret=interp, anc=anc, group=group)
    return gpt2_decode_step(params["gpt"], x, dims, pos, kv, kv_valid)


@dataclass(frozen=True)
class SamplingConfig:
    do_sample: bool = True
    temperature: float = 0.8
    top_k: int = 30
    top_p: float = 0.8
    repetition_penalty: float = 10.0
    typical_sampling: bool = False
    typical_mass: float = 0.9
    num_beams: int = 1
    length_penalty: float = 0.0
    min_new_tokens: int = 0
    # diverse (group) beam search — HF `_group_beam_search` via the
    # reference's `inference_speech(**hf_generate_kwargs)` passthrough
    # (model_v2.py:698). num_beams must divide evenly; deterministic only.
    num_beam_groups: int = 1
    diversity_penalty: float = 0.0
    # contrastive search (HF `_contrastive_search`): re-rank the top_k
    # candidates by (1-alpha)*p - alpha*max-cosine-vs-context. > 0 enables.
    penalty_alpha: float = 0.0
    # DoLa (HF `_dola_decoding`): contrast final-layer logits against the
    # max-JSD premature layer. "low" / "high" / tuple of hidden-state
    # indices (0 = embeddings); None disables.
    dola_layers: object = None
    # int8 KV cache (decode-side only; prefill attention stays exact).
    # On the FUSED kernel path this is a flat int8 cache with packed
    # per-(position, head) bf16 scale rows whose dequant folds into the
    # in-VMEM score/prob tensors — 1.67x less cache DMA; beam ancestry
    # composes (exact bf16 cast before selection, scale rows selected
    # alongside). On the XLA path it remains a memory knob (attention-side
    # dequant outweighs the saved DMA there).
    kv_quant: bool = False


def _min_len_mask(logits, stop: int, step, min_new_tokens: int):
    """HF `MinNewTokensLengthLogitsProcessor`: the stop token is unreachable
    (-inf) until `min_new_tokens` codes have been generated. `step` is the
    index of the token about to be sampled (0 = first new token)."""
    if min_new_tokens <= 0:
        return logits
    return jnp.where(step < min_new_tokens,
                     logits.at[:, stop].set(-jnp.inf), logits)


def _embed_mel_token(params: Params, token: jnp.ndarray, pos: jnp.ndarray,
                     dtype) -> jnp.ndarray:
    """mel_embedding(token) + mel_pos_embedding(pos); token (B,), pos scalar."""
    emb = params["mel_embedding"]["weight"].astype(dtype)[token]
    pemb = jax.lax.dynamic_index_in_dim(
        params["mel_pos_embedding"]["weight"], pos, axis=0, keepdims=False).astype(dtype)
    return emb + pemb[None, :]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dims", "max_new_tokens", "sampling", "dtype"),
    donate_argnames=(),
)
def generate(params: Params, cfg: GPTConfig, dims: GPT2Dims,
             prefix_embeds: jnp.ndarray, prefix_mask: jnp.ndarray,
             rng: jax.Array, max_new_tokens: int,
             sampling: SamplingConfig = SamplingConfig(),
             dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample mel codes.

    prefix_embeds: (B, P, D) left-padded [pad][cond][text] embeddings
    prefix_mask:   (B, P) bool (True = real content)
    Returns (codes (B, max_new_tokens) int32 — positions past the stop token
    hold stop_mel — and lengths (B,) int32 = index of first stop token, i.e.
    the usable code count, matching `infer_v2.py:607-619`).
    """
    B, P, D = prefix_embeds.shape
    V = cfg.number_mel_codes
    fused = _fused_decode_ok(params, dims, B, sampling.kv_quant)
    S = _cache_len(P, max_new_tokens, fused)
    stop = cfg.stop_mel_token

    prefix_embeds = prefix_embeds.astype(dtype)

    # --- prefill: [prefix][start_mel] -------------------------------------
    start_tok = jnp.full((B,), cfg.start_mel_token, jnp.int32)
    start_emb = _embed_mel_token(params, start_tok, 0, dtype)  # mel pos 0
    seq = jnp.concatenate([prefix_embeds, start_emb[:, None, :]], axis=1)
    seq_mask = jnp.concatenate([prefix_mask, jnp.ones((B, 1), bool)], axis=1)

    kv = init_kv_cache(dims, B, S, dtype=dtype, quantized=sampling.kv_quant,
                       flat=fused)
    hidden, kv = gpt2_prefill(params["gpt"], seq, dims, seq_mask, kv)
    logits0 = mel_logits_from_hidden(params, hidden[:, -1, :])

    # kv validity over the full cache
    kv_valid = jnp.zeros((B, S), bool)
    kv_valid = jax.lax.dynamic_update_slice(kv_valid, seq_mask, (0, 0))

    # --- repetition-penalty count buffer (replicates HF fake-prefix quirk) --
    counts = jnp.zeros((B, V), jnp.int32)
    counts = counts.at[:, 1].add(P)              # fake input_ids are all 1s
    counts = counts.at[:, cfg.start_mel_token].add(1)

    rng, r0 = jax.random.split(rng)
    logits0 = _min_len_mask(logits0, stop, 0, sampling.min_new_tokens)
    tok0 = sample_logits(
        r0, logits0, counts,
        temperature=sampling.temperature, top_k=sampling.top_k,
        top_p=sampling.top_p, repetition_penalty=sampling.repetition_penalty,
        do_sample=sampling.do_sample,
        typical_mass=sampling.typical_mass if sampling.typical_sampling else None)

    tokens = jnp.full((B, max_new_tokens), stop, jnp.int32)
    tokens = tokens.at[:, 0].set(tok0)
    counts = counts.at[jnp.arange(B), tok0].add(1)
    finished0 = tok0 == stop
    lengths0 = jnp.where(finished0, 0, max_new_tokens)

    def cond(state):
        step, _, _, _, _, finished, _, _ = state
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(finished))

    def body(state):
        step, tokens, counts, kv, kv_valid, finished, lengths, rng = state
        prev_tok = tokens[:, step - 1]
        # mel position for the i-th generated token is i+2 (reference quirk);
        # prev_tok is token (step-1) -> pos (step-1)+2 = step+1
        x = _embed_mel_token(params, prev_tok, step + 1, dtype)
        pos = P + 1 + step  # absolute cache slot
        kv_valid = kv_valid.at[:, pos].set(True)
        h, kv = _decode_step(fused, params, x, dims, pos, kv, kv_valid)
        logits = mel_logits_from_hidden(params, h)
        logits = _min_len_mask(logits, stop, step, sampling.min_new_tokens)
        rng, r = jax.random.split(rng)
        tok = sample_logits(
            r, logits, counts,
            temperature=sampling.temperature, top_k=sampling.top_k,
            top_p=sampling.top_p, repetition_penalty=sampling.repetition_penalty,
            do_sample=sampling.do_sample,
            typical_mass=sampling.typical_mass if sampling.typical_sampling else None)
        tok = jnp.where(finished, stop, tok)
        tokens = tokens.at[:, step].set(tok)
        counts = counts.at[jnp.arange(B), tok].add(jnp.where(finished, 0, 1))
        newly = jnp.logical_and(~finished, tok == stop)
        lengths = jnp.where(newly, step, lengths)
        finished = jnp.logical_or(finished, tok == stop)
        return step + 1, tokens, counts, kv, kv_valid, finished, lengths, rng

    # step index starts at 1: token 0 came from the prefill logits
    state = (jnp.int32(1), tokens, counts, kv, kv_valid, finished0, lengths0, rng)
    _, tokens, _, _, _, finished, lengths, _ = jax.lax.while_loop(cond, body, state)
    lengths = jnp.minimum(lengths, max_new_tokens)
    return tokens, lengths


# ---------------------------------------------------------------------------
# adaptive-cache decode: per-step attention reads scale with the tokens
# actually generated, not the worst-case budget
# ---------------------------------------------------------------------------

def _prefill_state(params: Params, cfg: GPTConfig, dims: GPT2Dims,
                   prefix_embeds, prefix_mask, rng, max_new_tokens: int,
                   span_end: int, sampling: SamplingConfig, dtype):
    """Prefill + sample token 0; returns the canonical decode state tuple
    (step=1, tokens, counts, kv, kv_valid, finished, lengths, rng) with the
    cache sized for `span_end` generated tokens. Shared by the plain span
    decoder below and the speculative one (engine/speculative.py) so both
    replay the identical sampler stream from the identical prefill."""
    B, P, D = prefix_embeds.shape
    V = cfg.number_mel_codes
    stop = cfg.stop_mel_token
    prefix_embeds = prefix_embeds.astype(dtype)

    start_tok = jnp.full((B,), cfg.start_mel_token, jnp.int32)
    start_emb = _embed_mel_token(params, start_tok, 0, dtype)
    seq = jnp.concatenate([prefix_embeds, start_emb[:, None, :]], axis=1)
    seq_mask = jnp.concatenate([prefix_mask, jnp.ones((B, 1), bool)], axis=1)
    fused = _fused_decode_ok(params, dims, B, sampling.kv_quant)
    S0 = _cache_len(P, span_end, fused)
    kv = init_kv_cache(dims, B, S0, dtype=dtype, quantized=sampling.kv_quant,
                       flat=fused)
    hidden, kv = gpt2_prefill(params["gpt"], seq, dims, seq_mask, kv)
    logits0 = mel_logits_from_hidden(params, hidden[:, -1, :])
    kv_valid = jnp.zeros((B, S0), bool)
    kv_valid = jax.lax.dynamic_update_slice(kv_valid, seq_mask, (0, 0))

    counts = jnp.zeros((B, V), jnp.int32)
    counts = counts.at[:, 1].add(P)
    counts = counts.at[:, cfg.start_mel_token].add(1)

    rng, r0 = jax.random.split(rng)
    logits0 = _min_len_mask(logits0, stop, 0, sampling.min_new_tokens)
    tok0 = sample_logits(
        r0, logits0, counts, temperature=sampling.temperature,
        top_k=sampling.top_k, top_p=sampling.top_p,
        repetition_penalty=sampling.repetition_penalty,
        do_sample=sampling.do_sample,
        typical_mass=sampling.typical_mass if sampling.typical_sampling else None)
    tokens = jnp.full((B, max_new_tokens), stop, jnp.int32)
    tokens = tokens.at[:, 0].set(tok0)
    counts = counts.at[jnp.arange(B), tok0].add(1)
    finished = tok0 == stop
    lengths = jnp.where(finished, 0, max_new_tokens)
    return (jnp.int32(1), tokens, counts, kv, kv_valid, finished, lengths, rng)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dims", "max_new_tokens", "span_end", "sampling",
                     "dtype"))
def _prefill_and_span(params: Params, cfg: GPTConfig, dims: GPT2Dims,
                      prefix_embeds, prefix_mask, rng, max_new_tokens: int,
                      span_end: int, sampling: SamplingConfig, dtype):
    """Prefill + decode steps [0, span_end) with a cache sized for span_end."""
    P = prefix_embeds.shape[1]
    state = _prefill_state(params, cfg, dims, prefix_embeds, prefix_mask, rng,
                           max_new_tokens, span_end, sampling, dtype)
    return _decode_span_body(params, cfg, dims, state, P, 1, span_end,
                             max_new_tokens, sampling, dtype)


def _decode_span_body(params, cfg, dims, state, P, start, end, max_new_tokens,
                      sampling, dtype):
    stop = cfg.stop_mel_token

    def cond(st):
        step, _, _, _, _, finished, _, _ = st
        return jnp.logical_and(step < end, ~jnp.all(finished))

    B_ = state[1].shape[0]
    fused = _fused_decode_ok(params, dims, B_, sampling.kv_quant)

    def body(st):
        step, tokens, counts, kv, kv_valid, finished, lengths, rng = st
        prev_tok = tokens[:, step - 1]
        x = _embed_mel_token(params, prev_tok, step + 1, dtype)
        pos = P + 1 + step
        kv_valid = kv_valid.at[:, pos].set(True)
        h, kv = _decode_step(fused, params, x, dims, pos, kv, kv_valid)
        logits = mel_logits_from_hidden(params, h)
        logits = _min_len_mask(logits, stop, step, sampling.min_new_tokens)
        rng, r = jax.random.split(rng)
        tok = sample_logits(
            r, logits, counts, temperature=sampling.temperature,
            top_k=sampling.top_k, top_p=sampling.top_p,
            repetition_penalty=sampling.repetition_penalty,
            do_sample=sampling.do_sample,
            typical_mass=sampling.typical_mass if sampling.typical_sampling else None)
        tok = jnp.where(finished, stop, tok)
        tokens = tokens.at[:, step].set(tok)
        counts = counts.at[jnp.arange(B_), tok].add(jnp.where(finished, 0, 1))
        newly = jnp.logical_and(~finished, tok == stop)
        lengths = jnp.where(newly, step, lengths)
        finished = jnp.logical_or(finished, tok == stop)
        return step + 1, tokens, counts, kv, kv_valid, finished, lengths, rng

    return jax.lax.while_loop(cond, body, state)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dims", "max_new_tokens", "span_end", "dtype",
                     "sampling"),
    donate_argnames=("state",))
def _continue_span(params: Params, cfg: GPTConfig, dims: GPT2Dims, state,
                   P: int, max_new_tokens: int, span_end: int,
                   sampling: SamplingConfig, dtype):
    return _decode_span_body(params, cfg, dims, state, P, None, span_end,
                             max_new_tokens, sampling, dtype)


def generate_adaptive(params: Params, cfg: GPTConfig, dims: GPT2Dims,
                      prefix_embeds, prefix_mask, rng, max_new_tokens: int,
                      sampling: SamplingConfig = SamplingConfig(),
                      dtype=jnp.bfloat16,
                      spans=(256, 512, 1024, 1536)) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """generate() with a growing KV cache.

    Decodes in spans; after each span, the host checks the on-device finished
    flag (one scalar sync per span) and, if needed, pads the cache to the next
    span bucket and continues. Typical segments finish in the first span, so
    per-step attention reads ~S=P+257 instead of ~S=P+1501 — the decode loop
    is HBM-bound, so this is a direct bandwidth saving. Token-identical to
    generate() for a given rng (same sampling stream).
    """
    import numpy as np

    spans = tuple(s for s in spans if s < max_new_tokens) + (max_new_tokens,)
    B, P, _ = prefix_embeds.shape

    state = _prefill_and_span(params, cfg, dims, prefix_embeds, prefix_mask,
                              rng, max_new_tokens, spans[0], sampling, dtype)
    for nxt in spans[1:]:
        step, tokens, counts, kv, kv_valid, finished, lengths, rng_s = state
        # one batched host readback per span (each readback is a full RTT on
        # relay-attached TPUs, so don't read the two scalars separately)
        fin, st = jax.device_get((jnp.all(finished), step))
        if bool(fin) or int(st) >= max_new_tokens:
            break
        fused = _fused_decode_ok(params, dims, B, sampling.kv_quant)
        grow = _cache_len(P, nxt, fused) - kv["k"].shape[2]
        # every cache entry (values and any quant scales) has S at axis 2
        kv = {name: jnp.pad(buf, [(0, 0), (0, 0), (0, grow)]
                            + [(0, 0)] * (buf.ndim - 3))
              for name, buf in kv.items()}
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, grow)))
        state = _continue_span(params, cfg, dims,
                               (step, tokens, counts, kv, kv_valid, finished,
                                lengths, rng_s),
                               P, max_new_tokens, nxt, sampling, dtype)
    _, tokens, _, _, _, _, lengths, _ = state
    return tokens, jnp.minimum(lengths, max_new_tokens)

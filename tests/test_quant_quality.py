"""int8 weight-quantization quality tests (VERDICT r2 item 6).

The serving default is weight-only int8 GPT (`bench.py`), previously tested
only for kernel-level numeric parity — nothing asserted the *quality* cost.
Two layers of defense:

1. deterministic: teacher-forced GPT logits, int8 vs bf16 weights — a
   quantizer regression (wrong scale axis, wrong rounding, dropped bias)
   shows up as logit divergence long before audio metrics move.
2. end-to-end: tiny pipeline MCD between int8 and bf16 runs with the same
   seed, against the eval harness's 8 dB parity convention
   (`eval/parity_eval.py`).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

import jax.numpy as jnp

from indextts_tpu.models.gpt import gpt2
from indextts_tpu.models.gpt.unified_voice import (forward_logits,
                                                   init_unified_voice)
from indextts_tpu.nn import InitRng
from tests.test_gpt_engine import TINY
from tests.test_pipeline_e2e import model_dir, tiny_config  # noqa: F401


def test_int8_teacher_forced_logit_agreement():
    """Teacher-forced mel logits with int8 weights track bf16 weights:
    same argmax on >= 95% of positions and high cosine similarity."""
    params = init_unified_voice(InitRng(0), TINY)
    q = dict(params)
    q["gpt"] = gpt2.quantize_gpt2_int8(params["gpt"])

    rng = np.random.default_rng(0)
    B, Lt, Lm = 2, 6, 12
    cond = jnp.asarray(rng.standard_normal((B, 3, TINY.model_dim)) * 0.3,
                       jnp.float32)
    emo = jnp.asarray(rng.standard_normal((B, TINY.model_dim)) * 0.3,
                      jnp.float32)
    text = jnp.asarray(rng.integers(2, TINY.number_text_tokens, (B, Lt)),
                       jnp.int32)
    tl = jnp.full((B,), Lt, jnp.int32)
    mel = jnp.asarray(rng.integers(0, TINY.start_mel_token, (B, Lm)), jnp.int32)
    ml = jnp.full((B,), Lm, jnp.int32)

    lb = np.asarray(forward_logits(params, TINY, cond, emo, text, tl, mel, ml,
                                   dtype=jnp.bfloat16)[1], np.float32)
    lq = np.asarray(forward_logits(q, TINY, cond, emo, text, tl, mel, ml,
                                   dtype=jnp.bfloat16)[1], np.float32)
    assert lb.shape == lq.shape
    flat_b = lb.reshape(-1, lb.shape[-1])
    flat_q = lq.reshape(-1, lq.shape[-1])
    cos = np.sum(flat_b * flat_q, -1) / np.maximum(
        np.linalg.norm(flat_b, axis=-1) * np.linalg.norm(flat_q, axis=-1),
        1e-9)
    assert np.mean(cos) > 0.995, float(np.mean(cos))
    agree = np.mean(flat_b.argmax(-1) == flat_q.argmax(-1))
    assert agree >= 0.95, float(agree)


def test_int8_e2e_mcd(model_dir):
    """Same-seed greedy synthesis, int8 vs bf16 GPT weights: MCD within the
    8 dB parity convention. Catches a quantization regression that survives
    the logit test (e.g. a broken dequant in the decode loop only)."""
    from indextts_tpu.pipeline.infer_v2 import IndexTTS2
    from indextts_tpu.utils.metrics import mcd

    kw = dict(spk_audio_prompt=os.path.join(model_dir, "prompt.wav"),
              text="hello world . the cat .", output_path=None,
              max_mel_tokens=16, num_beams=1, do_sample=False,
              max_text_tokens_per_segment=8, verbose=False)
    outs = {}
    for quant in (None, "int8"):
        tts = IndexTTS2(cfg_path=None, model_dir=model_dir, cfg=tiny_config(),
                        dtype=jnp.float32, quantization=quant)
        sr, wav = tts.infer(**kw)
        outs[quant] = wav.astype(np.float32)[:, 0] / 32768.0
    d = mcd(outs[None], outs["int8"], sr=22050)
    assert np.isfinite(d)
    assert d <= 8.0, f"int8-vs-bf16 MCD {d:.2f} dB exceeds parity threshold"


def test_int4_teacher_forced_logit_agreement():
    """int4 weights (range [-7, 7], per-channel scale) are 18x coarser than
    int8; the logits still have to track bf16 closely enough to serve —
    looser gates than int8 (cosine 0.98 / argmax 85%) catch packing or
    scale regressions while acknowledging the real quantization noise."""
    params = init_unified_voice(InitRng(0), TINY)
    q = dict(params)
    q["gpt"] = gpt2.quantize_gpt2_int4(params["gpt"])

    rng = np.random.default_rng(0)
    B, Lt, Lm = 2, 6, 12
    cond = jnp.asarray(rng.standard_normal((B, 3, TINY.model_dim)) * 0.3,
                       jnp.float32)
    emo = jnp.asarray(rng.standard_normal((B, TINY.model_dim)) * 0.3,
                      jnp.float32)
    text = jnp.asarray(rng.integers(2, TINY.number_text_tokens, (B, Lt)),
                       jnp.int32)
    tl = jnp.full((B,), Lt, jnp.int32)
    mel = jnp.asarray(rng.integers(0, TINY.start_mel_token, (B, Lm)), jnp.int32)
    ml = jnp.full((B,), Lm, jnp.int32)

    lb = np.asarray(forward_logits(params, TINY, cond, emo, text, tl, mel, ml,
                                   dtype=jnp.bfloat16)[1], np.float32)
    lq = np.asarray(forward_logits(q, TINY, cond, emo, text, tl, mel, ml,
                                   dtype=jnp.bfloat16)[1], np.float32)
    flat_b = lb.reshape(-1, lb.shape[-1])
    flat_q = lq.reshape(-1, lq.shape[-1])
    cos = np.sum(flat_b * flat_q, -1) / np.maximum(
        np.linalg.norm(flat_b, axis=-1) * np.linalg.norm(flat_q, axis=-1),
        1e-9)
    assert np.mean(cos) > 0.98, float(np.mean(cos))
    agree = np.mean(flat_b.argmax(-1) == flat_q.argmax(-1))
    assert agree >= 0.85, float(agree)


def test_int4_e2e_mcd(model_dir):
    """Same-seed greedy synthesis, int4 vs bf16 GPT weights: the 8 dB MCD
    parity convention must still hold (int4 is an opt-in memory/bandwidth
    knob; this is the failing test that would catch it degrading audio)."""
    from indextts_tpu.pipeline.infer_v2 import IndexTTS2
    from indextts_tpu.utils.metrics import mcd

    kw = dict(spk_audio_prompt=os.path.join(model_dir, "prompt.wav"),
              text="hello world . the cat .", output_path=None,
              max_mel_tokens=16, num_beams=1, do_sample=False,
              max_text_tokens_per_segment=8, verbose=False)
    outs = {}
    for quant in (None, "int4"):
        tts = IndexTTS2(cfg_path=None, model_dir=model_dir, cfg=tiny_config(),
                        dtype=jnp.float32, quantization=quant)
        sr, wav = tts.infer(**kw)
        outs[quant] = wav.astype(np.float32)[:, 0] / 32768.0
    d = mcd(outs[None], outs["int4"], sr=22050)
    assert np.isfinite(d)
    assert d <= 8.0, f"int4-vs-bf16 MCD {d:.2f} dB exceeds parity threshold"


def test_int4kv_e2e_mcd(model_dir):
    """quantization="int4kv" (int4 weights + int8 KV cache, the maximum-
    compression serving point): same-seed greedy synthesis stays within the
    8 dB MCD parity convention vs plain int4."""
    from indextts_tpu.pipeline.infer_v2 import IndexTTS2
    from indextts_tpu.utils.metrics import mcd

    kw = dict(spk_audio_prompt=os.path.join(model_dir, "prompt.wav"),
              text="hello world . the cat .", output_path=None,
              max_mel_tokens=16, num_beams=1, do_sample=False,
              max_text_tokens_per_segment=8, verbose=False)
    outs = {}
    for quant in ("int4", "int4kv"):
        tts = IndexTTS2(cfg_path=None, model_dir=model_dir, cfg=tiny_config(),
                        dtype=jnp.float32, quantization=quant)
        sr, wav = tts.infer(**kw)
        outs[quant] = wav.astype(np.float32)[:, 0] / 32768.0
    d = mcd(outs["int4"], outs["int4kv"], sr=22050)
    assert np.isfinite(d)
    assert d <= 8.0, f"int4kv-vs-int4 MCD {d:.2f} dB exceeds parity threshold"


def test_int8kv_e2e_mcd(model_dir):
    """Same-seed greedy synthesis with the int8 KV cache (weights int8 in
    both runs): added KV-quantization noise stays within the 8 dB MCD
    parity convention. Exercises the per-(position, head) quantize/dequant
    chain end-to-end (XLA path here; the fused flat-int8 kernel is parity-
    tested against this path in tests/test_decode_kernel.py)."""
    from indextts_tpu.pipeline.infer_v2 import IndexTTS2
    from indextts_tpu.utils.metrics import mcd

    kw = dict(spk_audio_prompt=os.path.join(model_dir, "prompt.wav"),
              text="hello world . the cat .", output_path=None,
              max_mel_tokens=16, num_beams=1, do_sample=False,
              max_text_tokens_per_segment=8, verbose=False)
    outs = {}
    for quant in ("int8", "int8kv"):
        tts = IndexTTS2(cfg_path=None, model_dir=model_dir, cfg=tiny_config(),
                        dtype=jnp.float32, quantization=quant)
        sr, wav = tts.infer(**kw)
        outs[quant] = wav.astype(np.float32)[:, 0] / 32768.0
    d = mcd(outs["int8"], outs["int8kv"], sr=22050)
    assert np.isfinite(d)
    assert d <= 8.0, f"int8kv-vs-int8 MCD {d:.2f} dB exceeds parity threshold"

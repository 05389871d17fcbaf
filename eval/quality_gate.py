"""Checkpoint-free quantization quality gate for the bench artifact.

VERDICT r3 item 8: the driver-visible bench JSON carried perf numbers only,
so a quantization regression would be invisible in the artifact that
advertises the speed. This script runs the tiny-scale same-seed greedy MCD
lanes (the methodology of `tests/test_quant_quality.py::test_int8_e2e_mcd`
/ `test_int8kv_e2e_mcd`, against `eval/parity_eval.py`'s 8 dB parity
convention) and prints ONE JSON line:

    {"mcd_int8_vs_bf16": X, "mcd_int8kv_vs_int8": Y,
     "threshold_db": 8.0, "ok": true}

bench.py runs it as a subprocess and embeds the parsed dict as the bench
artifact's "quality" block. CPU-only (tiny models; the relay would add
minutes of warmup for no signal) — run from /root/repo, cwd elsewhere
breaks axon backend discovery at import time.
"""

import json
import os
import sys
import tempfile

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def build_model_dir(d: str):
    """Tiny bpe.model + prompt wav (mirrors tests/test_pipeline_e2e.py::
    model_dir, the fixture the pytest quality lanes run against)."""
    from indextts_tpu.text.spm import build_model_file
    from indextts_tpu.utils.wav_io import write_wav

    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    words = ["▁HELLO", "▁WORLD", "▁THE", "▁CAT", "▁."]
    vocab = []
    for w in words:
        for i in range(2, len(w) + 1):
            vocab.append(w[:i])
    vocab += ["▁", ".", "▁,", "E", "L", "O"]
    seen, score = set(), -1.0
    for w in vocab:
        if w not in seen:
            seen.add(w)
            pieces.append((w, score, 1))
            score -= 1.0
    build_model_file(pieces, os.path.join(d, "bpe.model"))
    sr = 16000
    t = np.arange(int(0.8 * sr)) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    write_wav(os.path.join(d, "prompt.wav"), wav, sr)


def logit_agreement():
    """Teacher-forced mel-logit agreement, int8 vs bf16 weights (the
    deterministic lane of tests/test_quant_quality.py). At tiny scale this
    is the SENSITIVE quality signal: the tiny random CFM + vocoder
    attenuate an s_infer perturbation ~1e5x (measured: 7e-3 feature delta
    -> 1e-7 wav delta, below the int16 LSB), so the e2e MCD alone would
    stay 0.0 through most quantizer regressions — the logit metrics move
    first."""
    import jax.numpy as jnp

    from test_gpt_engine import TINY

    from indextts_tpu.models.gpt import gpt2
    from indextts_tpu.models.gpt.unified_voice import (forward_logits,
                                                       init_unified_voice)
    from indextts_tpu.nn import InitRng

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
    mel = jnp.asarray(rng.integers(0, TINY.start_mel_token, (B, Lm)),
                      jnp.int32)
    ml = jnp.full((B,), Lm, jnp.int32)
    lb = np.asarray(forward_logits(params, TINY, cond, emo, text, tl, mel,
                                   ml, dtype=jnp.bfloat16)[1], np.float32)
    lq = np.asarray(forward_logits(q, TINY, cond, emo, text, tl, mel, ml,
                                   dtype=jnp.bfloat16)[1], np.float32)
    fb = lb.reshape(-1, lb.shape[-1])
    fq = lq.reshape(-1, lq.shape[-1])
    cos = np.sum(fb * fq, -1) / np.maximum(
        np.linalg.norm(fb, axis=-1) * np.linalg.norm(fq, axis=-1), 1e-9)
    return float(np.mean(cos)), float(np.mean(fb.argmax(-1) == fq.argmax(-1)))


def main() -> int:
    import jax

    # the axon sitecustomize pins jax_platforms at interpreter start; env
    # vars do not override it, an explicit config.update does
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from test_pipeline_e2e import tiny_config

    from indextts_tpu.pipeline.infer_v2 import IndexTTS2
    from indextts_tpu.utils.metrics import mcd

    d = tempfile.mkdtemp(prefix="indextts_quality_")
    build_model_dir(d)
    kw = dict(spk_audio_prompt=os.path.join(d, "prompt.wav"),
              text="hello world . the cat .", output_path=None,
              max_mel_tokens=16, num_beams=1, do_sample=False,
              max_text_tokens_per_segment=8, verbose=False)
    outs = {}
    codes = {}
    for quant in (None, "int8", "int8kv", "int4"):
        tts = IndexTTS2(cfg_path=None, model_dir=d, cfg=tiny_config(),
                        dtype=jnp.float32, quantization=quant)
        tts.capture = []
        sr, wav = tts.infer(**kw)
        outs[quant] = wav.astype(np.float32)[:, 0] / 32768.0
        codes[quant] = np.asarray(tts.capture[0]["codes"])

    # spec-decode lane (r5, default-on path): the self-gating speculative
    # decoder must be token/audio-identical to the plain sampler on the CPU
    # f32 lane (device-side float reassociation is the documented caveat,
    # docs/KERNELS.md §1 — the CPU lane is where exactness is pinned)
    import jax as _jax

    tts_s = IndexTTS2(cfg_path=None, model_dir=d, cfg=tiny_config(),
                      dtype=jnp.float32, quantization=None)
    kw1 = dict(kw, text="hello world .", max_text_tokens_per_segment=120)
    os.environ["INDEXTTS_SPEC_DECODE"] = "0"
    tts_s._rng = _jax.random.PRNGKey(3)
    _, wav_plain = tts_s.infer(**kw1)
    os.environ.pop("INDEXTTS_SPEC_DECODE", None)  # default-on
    tts_s._rng = _jax.random.PRNGKey(3)
    _, wav_spec = tts_s.infer(**kw1)
    spec_match = bool(np.array_equal(wav_plain, wav_spec))

    threshold = 8.0
    m_int8 = float(mcd(outs[None], outs["int8"], sr=22050))
    m_int8kv = float(mcd(outs["int8"], outs["int8kv"], sr=22050))
    m_int4 = float(mcd(outs["int8"], outs["int4"], sr=22050))
    cos, agree = logit_agreement()
    ok = (np.isfinite(m_int8) and m_int8 <= threshold
          and np.isfinite(m_int8kv) and m_int8kv <= threshold
          and np.isfinite(m_int4) and m_int4 <= threshold
          and cos > 0.995 and agree >= 0.95 and spec_match)
    print(json.dumps({
        "mcd_int8_vs_bf16": round(m_int8, 3),
        "mcd_int8kv_vs_int8": round(m_int8kv, 3),
        "mcd_int4_vs_int8": round(m_int4, 3),
        "greedy_codes_int8_match": bool(np.array_equal(codes[None],
                                                       codes["int8"])),
        "spec_decode_audio_match": spec_match,
        "logit_cosine_int8": round(cos, 5),
        "logit_argmax_agree_int8": round(agree, 4),
        "threshold_db": threshold, "ok": bool(ok)}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""indextts_tpu — a TPU-native (JAX/XLA/Pallas) zero-shot TTS inference framework.

A from-scratch rebuild of the capabilities of IndexTTS2 (index-tts/index-tts),
designed TPU-first:

- the autoregressive speech-token decoder is a single jitted KV-cached decode
  loop (``lax.while_loop``) with on-device sampling (`engine/decode.py`),
- the flow-matching semantic-to-mel module runs its Euler solver as a
  ``lax.scan`` with a CFG batch of 2 (`models/s2mel/cfm.py`),
- BigVGAN-v2's fused anti-alias snake activation is a Pallas kernel
  (`ops/pallas/antialias.py`),
- multi-chip scaling uses ``jax.sharding.Mesh`` + XLA collectives
  (`parallel/`), not a port of any CUDA runtime.

Public surface mirrors the reference's behavioral API:

    from indextts_tpu import IndexTTS2
    tts = IndexTTS2(cfg_path, model_dir)
    tts.infer(spk_audio_prompt="voice.wav", text="...", output_path="out.wav")

Reference analysis lives in SURVEY.md; perf targets in BASELINE.md.
"""

__version__ = "0.1.0"

from indextts_tpu.config import IndexTTS2Config, load_config  # noqa: F401

# Lazy import of the heavy pipeline so that `import indextts_tpu` stays cheap.
def __getattr__(name):
    if name == "IndexTTS2":
        from indextts_tpu.pipeline.infer_v2 import IndexTTS2

        return IndexTTS2
    if name == "IndexTTS":
        from indextts_tpu.pipeline.infer_v1 import IndexTTS

        return IndexTTS
    raise AttributeError(f"module 'indextts_tpu' has no attribute {name!r}")

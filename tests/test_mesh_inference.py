"""Inference-path mesh test: the batched segment pipeline dp-sharded over a
CPU mesh must produce the same audio as the single-device run (SURVEY §7.7 —
segments -> chips, the TPU analogue of `bucket_segments`)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from indextts_tpu.pipeline.infer_v2 import IndexTTS2
from tests.test_pipeline_e2e import model_dir, tiny_config  # noqa: F401


@pytest.fixture(scope="module")
def kw(model_dir):
    return dict(spk_audio_prompt=os.path.join(model_dir, "prompt.wav"),
                output_path=None, max_mel_tokens=8, num_beams=1,
                do_sample=False, max_text_tokens_per_segment=4)


def test_full_pipeline_dp2_matches_single(model_dir, kw):
    """2 segments over a dp=2 mesh == unsharded (greedy, same rng stream)."""
    import jax.numpy as jnp

    from indextts_tpu.parallel.mesh import make_mesh

    text = "hello world . the cat ."  # 2 segments at 4 tokens each
    base = IndexTTS2(cfg_path=None, model_dir=model_dir, cfg=tiny_config(),
                     dtype=jnp.float32)
    sr_s, wav_s = base.infer(text=text, **kw)

    mesh = make_mesh(2, tp=1)
    sharded = IndexTTS2(cfg_path=None, model_dir=model_dir, cfg=tiny_config(),
                        dtype=jnp.float32, mesh=mesh)
    sr_m, wav_m = sharded.infer(text=text, **kw)
    assert sr_m == sr_s
    assert wav_m.shape == wav_s.shape
    np.testing.assert_allclose(wav_m.astype(np.float32),
                               wav_s.astype(np.float32), atol=2.0)


def test_full_pipeline_dp_padding(model_dir, kw):
    """3 segments on a dp=2 mesh (padded batch row) still yields 3 segments
    with per-segment lengths matching the unsharded run."""
    import jax.numpy as jnp

    from indextts_tpu.parallel.mesh import make_mesh

    text = "hello world . the cat . hello ."
    base = IndexTTS2(cfg_path=None, model_dir=model_dir, cfg=tiny_config(),
                     dtype=jnp.float32)
    sr_s, wav_s = base.infer(text=text, **kw)

    sharded = IndexTTS2(cfg_path=None, model_dir=model_dir, cfg=tiny_config(),
                        dtype=jnp.float32, mesh=make_mesh(2, tp=1))
    sr_m, wav_m = sharded.infer(text=text, **kw)
    assert sr_m == sr_s
    assert wav_m.shape == wav_s.shape


def test_tp_kernel_optin_falls_back_cleanly(model_dir, kw, monkeypatch):
    """INDEXTTS_TP_DECODE=kernel on a tp=2 mesh stores the qkv stack in the
    head-aligned (L, D, 3, D) layout and points the engine at the mesh; at
    tiny dims the kernel geometry gate (D % 1280) rejects it, so decode
    falls back to the XLA path — which must consume the 4D layout through
    nn.dense's trailing-dim flatten and match the canonical-layout run."""
    import jax.numpy as jnp

    from indextts_tpu.engine import decode as dec
    from indextts_tpu.parallel.mesh import make_mesh

    text = "hello world . the cat ."
    base = IndexTTS2(cfg_path=None, model_dir=model_dir, cfg=tiny_config(),
                     dtype=jnp.float32, mesh=make_mesh(4, tp=2),
                     quantization="int8")
    sr_s, wav_s = base.infer(text=text, **kw)

    monkeypatch.setenv("INDEXTTS_TP_DECODE", "kernel")
    # the non-opt-in tp instance above disabled the fused kernel by env
    # (its fallback mechanism is process-wide); re-arm it for this instance
    monkeypatch.setenv("INDEXTTS_FUSED_DECODE", "1")
    tpk = IndexTTS2(cfg_path=None, model_dir=model_dir, cfg=tiny_config(),
                    dtype=jnp.float32, mesh=make_mesh(4, tp=2),
                    quantization="int8")
    try:
        assert dec.TP_MESH is not None  # pipeline armed the kernel mode
        ca = tpk.gpt_params["gpt"]["h"]["attn"]["c_attn"]
        assert ca["q"].ndim == 4  # head-aligned storage
        sr_m, wav_m = tpk.infer(text=text, **kw)
    finally:
        dec.TP_MESH = None
    assert sr_m == sr_s and wav_m.shape == wav_s.shape
    np.testing.assert_allclose(wav_m.astype(np.float32),
                               wav_s.astype(np.float32), atol=2.0)

"""JAX Qwen3 vs HF transformers (tiny random model): logits + greedy decode."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from indextts_tpu.models import qwen as jq

torch.manual_seed(0)


@pytest.fixture(scope="module")
def tiny():
    from transformers import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, max_position_embeddings=128,
        rope_theta=10000.0, tie_word_embeddings=True, eos_token_id=2)
    hf = Qwen3ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    c = jq.QwenConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, rope_theta=10000.0, tie_word_embeddings=True,
        eos_token_id=2)
    params = jq.convert_qwen(sd, c)
    return hf, c, params


def test_qwen_prefill_logits_match(tiny):
    hf, c, params = tiny
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 128, (1, 11)).astype(np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits[:, -1].numpy()
    logits, _ = jq.qwen_prefill(params, c, jnp.asarray(ids, jnp.int32),
                                jnp.ones((1, 11), jnp.int32), max_len=16,
                                dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=1e-3)


def test_qwen_emotion_plumbing(tiny, tmp_path):
    """QwenEmotion._model_inference runs the JAX decode end-to-end with a
    stub tokenizer (chat template -> ids -> decode -> score parse)."""
    from indextts_tpu.pipeline.emotion import QwenEmotion

    hf, c, params = tiny

    class StubTok:
        def apply_chat_template(self, messages, **kw):
            return "sys: " + messages[1]["content"]

        def __call__(self, text):
            import types

            ids = [(3 + (ord(ch) % 120)) for ch in text][:12]
            return types.SimpleNamespace(input_ids=ids)

        def decode(self, ids, **kw):
            return '{"高兴": 0.7, "悲伤": 0.1}'

    qe = QwenEmotion(str(tmp_path))
    qe._tried_load = True
    qe.tokenizer = StubTok()
    qe.model = params
    qe.qwen_cfg = c
    out = qe.inference("so happy today")
    assert list(out.keys()) == ["happy", "angry", "sad", "afraid",
                                "disgusted", "melancholic", "surprised",
                                "calm"]
    assert out["happy"] == pytest.approx(0.7)


def test_qwen_greedy_matches_hf_generate(tiny):
    hf, c, params = tiny
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 128, (1, 9)).astype(np.int64)
    with torch.no_grad():
        out = hf.generate(input_ids=torch.tensor(ids), max_new_tokens=12,
                          do_sample=False, pad_token_id=2)
    ref_new = out[0, 9:].numpy()
    toks, lens = jq.qwen_generate_greedy(
        params, c, jnp.asarray(ids, jnp.int32), jnp.ones((1, 9), jnp.int32),
        max_new_tokens=12, dtype=jnp.float32)
    toks = np.asarray(toks)[0]
    n = min(len(ref_new), int(np.asarray(lens)[0]))
    np.testing.assert_array_equal(toks[:n], ref_new[:n])

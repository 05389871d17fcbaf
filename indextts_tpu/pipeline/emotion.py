"""Text -> 8-dim emotion vector (QwenEmotion equivalent).

Behavioral reference: `/root/reference/indextts/infer_v2.py:727-838`. The
fine-tuned Qwen emotion classifier stays a host-side component behind the same
``inference(text) -> ordered dict`` interface; when its checkpoint (or torch
generation) is unavailable we fall back to a keyword heuristic that preserves
the output contract (ordered keys, clamping, melancholic swap, calm default).
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Dict


EMOTION_KEYS = ["happy", "angry", "sad", "afraid", "disgusted", "melancholic",
                "surprised", "calm"]

CN_KEY_TO_EN = {
    "高兴": "happy", "愤怒": "angry", "悲伤": "sad", "恐惧": "afraid",
    "反感": "disgusted", "低落": "melancholic", "惊讶": "surprised", "自然": "calm",
}
DESIRED_VECTOR_ORDER = ["高兴", "愤怒", "悲伤", "恐惧", "反感", "低落", "惊讶", "自然"]
MELANCHOLIC_WORDS = {"低落", "melancholy", "melancholic", "depression",
                     "depressed", "gloomy"}

# keyword lexicon for the no-checkpoint fallback
_FALLBACK_LEXICON = {
    "高兴": ["开心", "高兴", "快乐", "喜悦", "happy", "joy", "glad", "delight", "excited"],
    "愤怒": ["生气", "愤怒", "恼火", "angry", "furious", "mad", "rage"],
    "悲伤": ["悲伤", "难过", "伤心", "sad", "sorrow", "grief", "cry", "tears"],
    "恐惧": ["害怕", "恐惧", "恐怖", "afraid", "fear", "scared", "terrified"],
    "反感": ["恶心", "反感", "厌恶", "disgust", "gross", "nasty"],
    "低落": ["低落", "melancholic", "melancholy", "depressed", "gloomy"],
    "惊讶": ["惊讶", "震惊", "吃惊", "surprise", "shocked", "amazed", "wow"],
    "自然": [],
}


class QwenEmotion:
    """Same surface as the reference class; model loading is lazy + optional."""

    max_score = 1.2
    min_score = 0.0

    def __init__(self, model_dir: str):
        self.model_dir = model_dir
        self.prompt = "文本情感分类"
        self.model = None
        self.tokenizer = None
        self._tried_load = False

    def _load(self):
        """Load the fine-tuned Qwen as a JAX model (models/qwen.py) — the
        whole emo-text path then runs on TPU with no torch in the loop. Only
        the HF tokenizer (host-side chat template) is reused."""
        if self._tried_load:
            return
        self._tried_load = True
        if not os.path.isdir(self.model_dir):
            return
        try:
            from transformers import AutoTokenizer

            from indextts_tpu.models import qwen as jq
            from indextts_tpu.utils import convert

            self.tokenizer = AutoTokenizer.from_pretrained(self.model_dir)
            with open(os.path.join(self.model_dir, "config.json"),
                      encoding="utf-8") as f:
                self.qwen_cfg = jq.QwenConfig.from_hf(json.load(f))
            ckpt = None
            for cand in ("model.safetensors", "pytorch_model.bin"):
                path = os.path.join(self.model_dir, cand)
                if os.path.exists(path):
                    ckpt = path
                    break
            if ckpt is None:
                raise FileNotFoundError("no qwen checkpoint")
            sd = convert.load_torch_state_dict(ckpt)
            import jax

            self.model = jax.device_put(
                jq.convert_qwen(sd, self.qwen_cfg))
        except Exception as e:  # degrade-and-continue like the reference
            print(f">> QwenEmotion unavailable ({e!r}); using keyword fallback")
            self.model = None

    def clamp_score(self, value) -> float:
        return max(self.min_score, min(self.max_score, float(value)))

    def convert(self, content: Dict[str, float]) -> Dict[str, float]:
        emotion_dict = {
            CN_KEY_TO_EN[cn]: self.clamp_score(content.get(cn, 0.0))
            for cn in DESIRED_VECTOR_ORDER
        }
        if all(v <= 0.0 for v in emotion_dict.values()):
            print(">> no emotions detected; using default calm/neutral voice")
            emotion_dict["calm"] = 1.0
        return emotion_dict

    def _fallback_scores(self, text: str) -> Dict[str, float]:
        tl = text.lower()
        scores = {}
        for cn, words in _FALLBACK_LEXICON.items():
            s = sum(1.0 for w in words if w in tl)
            if s > 0:
                scores[cn] = min(1.0, 0.6 + 0.2 * (s - 1))
        return scores

    def inference(self, text_input: str) -> Dict[str, float]:
        self._load()
        if self.model is None:
            content = self._fallback_scores(text_input)
        else:
            content = self._model_inference(text_input)
        # melancholic/sad swap workaround (reference `infer_v2.py:829-836`)
        tl = text_input.lower()
        if any(w in tl for w in MELANCHOLIC_WORDS):
            content["悲伤"], content["低落"] = (content.get("低落", 0.0),
                                              content.get("悲伤", 0.0))
        return self.convert(content)

    def _model_inference(self, text_input: str) -> Dict[str, float]:
        import jax.numpy as jnp
        import numpy as np

        from indextts_tpu.models import qwen as jq

        messages = [{"role": "system", "content": self.prompt},
                    {"role": "user", "content": text_input}]
        text = self.tokenizer.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True,
            enable_thinking=False)
        ids = np.asarray([self.tokenizer(text).input_ids], np.int32)
        toks, lens = jq.qwen_generate_greedy(
            self.model, self.qwen_cfg, jnp.asarray(ids),
            jnp.ones(ids.shape, jnp.int32), max_new_tokens=256)
        out = np.asarray(toks)[0][: int(np.asarray(lens)[0])].tolist()
        try:  # strip <think> section if present (token 151668 = </think>)
            idx = len(out) - out[::-1].index(151668)
        except ValueError:
            idx = 0
        content = self.tokenizer.decode(out[idx:], skip_special_tokens=True)
        try:
            return json.loads(content)
        except json.JSONDecodeError:
            return {m.group(1): float(m.group(2))
                    for m in re.finditer(r'([^\s":.,]+?)"?\s*:\s*([\d.]+)', content)}


def normalize_emo_vec(emo_vector, apply_bias: bool = True):
    """Per-emotion bias + sum<=0.8 rescale (reference `infer_v2.py:348-362`)."""
    if apply_bias:
        emo_bias = [0.9375, 0.875, 1.0, 1.0, 0.9375, 0.9375, 0.6875, 0.5625]
        emo_vector = [v * b for v, b in zip(emo_vector, emo_bias)]
    s = sum(emo_vector)
    if s > 0.8:
        emo_vector = [v * (0.8 / s) for v in emo_vector]
    return emo_vector

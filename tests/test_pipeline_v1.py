"""v1 pipeline e2e smoke tests (tiny random models) + v1 CLI."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from indextts_tpu.config import (BigVGANV1Config, ConditionModuleConfig,
                                 EngineConfig, GPTConfig, IndexTTS1Config)
from indextts_tpu.pipeline.infer_v1 import IndexTTS, remove_long_silence
from indextts_tpu.text.spm import build_model_file
from indextts_tpu.utils.wav_io import read_wav, write_wav


def tiny_v1_config():
    return IndexTTS1Config(
        version="1.5",
        gpt=GPTConfig(
            layers=2, model_dim=64, heads=4, max_text_tokens=64,
            max_mel_tokens=128, number_text_tokens=60, number_mel_codes=66,
            start_mel_token=64, stop_mel_token=65, cond_input_dim=100,
            condition_type="conformer_perceiver",
            condition_module=ConditionModuleConfig(
                output_size=32, linear_units=48, attention_heads=2,
                num_blocks=1, input_layer="conv2d2", perceiver_mult=2)),
        bigvgan=BigVGANV1Config(
            gpt_dim=64, num_mels=100, upsample_rates=(4, 4),
            upsample_kernel_sizes=(8, 8), upsample_initial_channel=32,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
            speaker_embedding_dim=32, feat_upsample=True),
        engine=EngineConfig(text_buckets=(16, 32), mel_len_buckets=(64, 128, 256),
                            cond_len_buckets=(64, 128)),
    )


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_v1")
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    vocab = []
    for w in ["▁HELLO", "▁WORLD", "▁."]:
        for i in range(2, len(w) + 1):
            vocab.append(w[:i])
    seen, score = set(), -1.0
    for w in vocab + ["▁", "."]:
        if w not in seen:
            seen.add(w)
            pieces.append((w, score, 1))
            score -= 1.0
    build_model_file(pieces, str(d / "bpe.model"))
    sr = 24000
    t = np.arange(sr) / sr
    write_wav(str(d / "prompt.wav"),
              (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), sr)
    return str(d)


@pytest.fixture(scope="module")
def tts(model_dir):
    return IndexTTS(cfg_path=None, model_dir=model_dir, cfg=tiny_v1_config(),
                    use_fp16=False, dtype=jnp.float32)


def test_v1_infer(tts, model_dir, tmp_path):
    out = str(tmp_path / "v1.wav")
    res = tts.infer(audio_prompt=os.path.join(model_dir, "prompt.wav"),
                    text="hello world .", output_path=out,
                    max_mel_tokens=12, num_beams=1)
    assert res == out
    wav, sr = read_wav(out)
    assert sr == 24000
    assert wav.shape[1] > 50


def test_v1_infer_fast_bucketing(tts, model_dir):
    res = tts.infer_fast(audio_prompt=os.path.join(model_dir, "prompt.wav"),
                         text="hello . world . hello world . hello . world .",
                         output_path=None, max_mel_tokens=8, num_beams=1,
                         max_text_tokens_per_segment=4)
    sr, data = res
    assert sr == 24000
    assert data.shape[0] > 50


def test_bucket_segments(tts):
    segs = [["a"] * n for n in (3, 3, 4, 10, 11, 2, 30)]
    buckets = tts.bucket_segments(segs, bucket_max_size=4)
    idxs = sorted(i["idx"] for b in buckets for i in b)
    assert idxs == list(range(7))
    for b in buckets:
        assert 1 <= len(b) <= 4


def test_remove_long_silence():
    codes = np.full((1, 60), 52, np.int32)
    codes[0, :5] = 7
    lens = np.asarray([60])
    out, new_lens = remove_long_silence(codes, lens, stop_mel_token=65)
    assert new_lens[0] == 15  # 5 real + 10 kept silences
    # below-threshold counts untouched
    codes2 = np.full((1, 20), 3, np.int32)
    out2, lens2 = remove_long_silence(codes2, np.asarray([20]), 65)
    assert lens2[0] == 20


def test_v1_cli(model_dir, tmp_path):
    from indextts_tpu import cli

    calls = {}

    class Fake:
        def __init__(self, **kw):
            calls.update(kw)

        def infer(self, audio_prompt, text, output_path):
            write_wav(output_path, np.zeros(100, np.float32), 24000)
            return output_path

        infer_fast = infer

    out = str(tmp_path / "cli.wav")
    rc = cli.main(["infer", "hello", "-v",
                   os.path.join(model_dir, "prompt.wav"), "-o", out,
                   "--model_dir", model_dir], tts_factory=Fake)
    assert rc == 0
    assert os.path.exists(out)
    assert calls["model_dir"] == model_dir

    rc = cli.main(["infer", "hello", "-v", "missing.wav", "-o", out],
                  tts_factory=Fake)
    assert rc == 1

"""IndexTTS v1/v1.5 pipeline orchestrator (mel-conditioned GPT -> BigVGAN-v1).

Behavioral reference: `/root/reference/indextts/infer.py` (IndexTTS class):
- ``infer``: per-segment synthesis (24 kHz output)
- ``infer_fast``: segments bucketed by length (factor 1.5, bucket <= 4) and
  decoded as left-padded batches — which maps 1:1 onto this engine's batched
  decode (`engine/decode.py`), no special casing needed.

Same TPU-first structure as `infer_v2.py`: jitted stage programs with length
buckets; host does tokenization, bucketing, silence-shrinking and WAV I/O.
"""

from __future__ import annotations

import functools
import os
import time
import warnings
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu import nn
from indextts_tpu.config import IndexTTS1Config, load_config_v1
from indextts_tpu.engine.beam import generate_beam
from indextts_tpu.engine.decode import (SamplingConfig, generate,
                                         generate_adaptive)
from indextts_tpu.models.gpt import unified_voice as uv
from indextts_tpu.models.gpt import unified_voice_v1 as uv1
from indextts_tpu.models.gpt.gpt2 import GPT2Dims
from indextts_tpu.models.vocoder.bigvgan_v1 import bigvgan_v1_forward, init_bigvgan_v1
from indextts_tpu.nn import InitRng
from indextts_tpu.ops.mel import mel_spectrogram_24k_v1
from indextts_tpu.pipeline.buckets import pad_to, pick_bucket
from indextts_tpu.text.front import TextNormalizer, TextTokenizer
from indextts_tpu.utils import convert
from indextts_tpu.utils.resample import resample_audio
from indextts_tpu.utils.wav_io import read_wav_mono, write_wav


def remove_long_silence(codes: np.ndarray, code_lens: np.ndarray,
                        stop_mel_token: int, silent_token: int = 52,
                        max_consecutive: int = 30):
    """Shrink runs of the silence token to <= 10 consecutive occurrences.

    Host-side port of `infer.py:134-189` / `infer_v2.py:236-291` (the
    reference counts *total* occurrences > max_consecutive as the trigger,
    then keeps at most 10 consecutive).
    """
    out_rows: List[np.ndarray] = []
    new_lens = []
    for b in range(codes.shape[0]):
        row = codes[b]
        ln = int(code_lens[b])
        row = row[:ln]
        if int(np.sum(row == silent_token)) > max_consecutive:
            keep = []
            n = 0
            for tok in row.tolist():
                if tok != silent_token:
                    keep.append(tok)
                    n = 0
                elif n < 10:
                    keep.append(tok)
                    n += 1
            row = np.asarray(keep, codes.dtype)
        out_rows.append(row)
        new_lens.append(len(row))
    max_len = max(new_lens) if new_lens else 0
    out = np.full((codes.shape[0], max(max_len, 1)), stop_mel_token, codes.dtype)
    for b, row in enumerate(out_rows):
        out[b, : len(row)] = row
    return out, np.asarray(new_lens, np.int32)


class IndexTTS:
    """v1/v1.5 zero-shot TTS (reference `infer.py:27`)."""

    SAMPLING_RATE = 24000

    def __init__(self, cfg_path: str = "checkpoints/config.yaml",
                 model_dir: str = "checkpoints", use_fp16: bool = True,
                 device: Optional[str] = None, use_cuda_kernel: Optional[bool] = None,
                 seed: int = 0, dtype=jnp.bfloat16,
                 cfg: Optional[IndexTTS1Config] = None):
        del device, use_cuda_kernel
        from indextts_tpu.utils.xla_cache import enable_persistent_cache
        enable_persistent_cache()
        self.model_dir = model_dir
        if cfg is not None:
            self.cfg = cfg
        elif cfg_path and os.path.exists(cfg_path):
            self.cfg = load_config_v1(cfg_path)
        else:
            self.cfg = IndexTTS1Config()
        self.dtype = jnp.float16 if use_fp16 else dtype
        self.stop_mel_token = self.cfg.gpt.stop_mel_token
        try:
            self.model_version = float(self.cfg.version)
        except (TypeError, ValueError):
            self.model_version = 1.0
        self._rng = jax.random.PRNGKey(seed)
        self._load_models()
        self._load_frontend()
        self._build_jits()
        self.cache_audio_prompt = None
        self.cache_cond_mel = None
        self.gr_progress = None

    # ----------------------------------------------------------------- init
    def _load_models(self):
        cfg = self.cfg
        rng = InitRng(0)
        gpt_path = os.path.join(self.model_dir, cfg.gpt_checkpoint)
        if os.path.exists(gpt_path):
            sd = convert.load_torch_state_dict(gpt_path)
            self.gpt_params = convert.convert_unified_voice_v1(sd, cfg.gpt)
            print(">> GPT weights restored from:", gpt_path)
        else:
            self.gpt_params = uv1.init_unified_voice_v1(rng, cfg.gpt)
            print(">> GPT randomly initialized (no checkpoint found)")
        bv_path = os.path.join(self.model_dir, cfg.bigvgan_checkpoint)
        if os.path.exists(bv_path):
            sd = convert.load_torch_state_dict(bv_path)
            self.bigvgan_params = convert.convert_bigvgan_v1(sd, cfg.bigvgan)
            print(">> bigvgan weights restored from:", bv_path)
        else:
            self.bigvgan_params = init_bigvgan_v1(rng, cfg.bigvgan)
            print(">> bigvgan randomly initialized")
        for name in ("gpt_params", "bigvgan_params"):
            setattr(self, name, jax.device_put(nn.cast_tree(getattr(self, name),
                                                            self.dtype)))

    def _load_frontend(self):
        bpe_path = os.path.join(self.model_dir,
                                self.cfg.dataset.get("bpe_model", "bpe.model"))
        self.normalizer = TextNormalizer()
        self.normalizer.load()
        if os.path.exists(bpe_path):
            self.tokenizer = TextTokenizer(bpe_path, self.normalizer)
            print(">> bpe model loaded from:", bpe_path)
        else:
            self.tokenizer = None

    def _build_jits(self):
        cfg = self.cfg
        dims = GPT2Dims(cfg.gpt.layers, cfg.gpt.model_dim, cfg.gpt.heads)
        self.gpt_dims = dims
        dtype = self.dtype

        @functools.partial(jax.jit, static_argnames=("prefix_len",))
        def prefix_program(gpt_params, cond_mel, cond_len, text_ids, text_len,
                           prefix_len):
            cond_latents = uv1.get_conditioning_v1(gpt_params, cfg.gpt,
                                                   cond_mel.astype(dtype), cond_len)
            embeds, mask = uv.prepare_prefix_embeds(
                gpt_params, cfg.gpt, cond_latents, text_ids, text_len,
                prefix_len, dtype=dtype)
            return cond_latents, embeds, mask

        self._jit_prefix = prefix_program

        @functools.partial(jax.jit, static_argnames=("code_bucket",))
        def synth_program(gpt_params, bigvgan_params, cond_latents, cond_mel,
                          cond_len, text_ids, text_len, codes, code_len,
                          code_bucket: int):
            latent = uv1.forward_latents_v1(
                gpt_params, cfg.gpt, cond_latents, text_ids, text_len,
                codes, code_len, dtype=dtype)
            latent = latent[:, :code_bucket]
            wav = bigvgan_v1_forward(bigvgan_params, cfg.bigvgan,
                                     latent.astype(dtype),
                                     cond_mel.astype(dtype),
                                     latent_lens=code_len, mel_ref_lens=cond_len)
            return wav

        self._jit_synth = synth_program

    # ----------------------------------------------------------------- utils
    def _next_rng(self):
        self._rng, r = jax.random.split(self._rng)
        return r

    def _set_gr_progress(self, value, desc):
        if self.gr_progress is not None:
            self.gr_progress(value, desc=desc)

    def _prepare_cond_mel(self, audio_prompt: str, verbose: bool):
        if (self.cache_cond_mel is not None
                and self.cache_audio_prompt == audio_prompt):
            return self.cache_cond_mel
        audio, _ = read_wav_mono(audio_prompt, target_sr=24000)
        max_samples = 50 * 24000  # infer.py:309
        if audio.shape[1] > max_samples:
            audio = audio[:, :max_samples]
        frames = audio.shape[1] // 256 + 1
        fb = pick_bucket(frames, self.cfg.engine.mel_len_buckets)
        a = pad_to(audio, (fb - 1) * 256, axis=1)
        mel = np.asarray(mel_spectrogram_24k_v1(jnp.asarray(a)))  # (1, 100, F)
        mel = mel.transpose(0, 2, 1)  # (1, F, 100)
        cache = {"mel": jnp.asarray(mel), "frames": frames}
        self.cache_cond_mel = cache
        self.cache_audio_prompt = audio_prompt
        if verbose:
            print(f"cond_mel frames: {frames} (bucket {mel.shape[1]})")
        return cache

    def bucket_segments(self, segments, bucket_max_size: int = 4):
        """Length-bucketed batching (reference `infer.py:191-247`)."""
        outputs = [{"idx": i, "sent": s, "len": len(s)}
                   for i, s in enumerate(segments)]
        if len(outputs) <= bucket_max_size:
            return [outputs]
        buckets: List[List[dict]] = []
        factor = 1.5
        last_bucket = None
        last_median = 0
        for sent in sorted(outputs, key=lambda x: x["len"]):
            if sent["len"] == 0:
                continue
            if (last_bucket is None or sent["len"] >= int(last_median * factor)
                    or len(last_bucket) >= bucket_max_size):
                buckets.append([sent])
                last_bucket = buckets[-1]
                last_median = sent["len"]
            else:
                last_bucket.append(sent)
                last_median = last_bucket[len(last_bucket) // 2]["len"]
        out_buckets, only_ones = [], []
        for b in buckets:
            (out_buckets if len(b) > 1 else only_ones).append(
                b if len(b) > 1 else b[0])
        if only_ones:
            for b in out_buckets:
                if len(b) < bucket_max_size:
                    b.append(only_ones.pop(0))
                    if not only_ones:
                        break
            if only_ones:
                out_buckets.extend(
                    only_ones[i:i + bucket_max_size]
                    for i in range(0, len(only_ones), bucket_max_size))
        return out_buckets

    # ----------------------------------------------------------------- infer
    def _decode_batch(self, cond, sents, sampling, max_mel_tokens, verbose):
        """Decode a batch of segments; returns (codes np, lens np, latents/wavs)."""
        cfg = self.cfg
        eng = cfg.engine
        B = len(sents)
        ids_list = [self.tokenizer.convert_tokens_to_ids(s) for s in sents]
        tmax = max(len(i) for i in ids_list)
        tb = pick_bucket(tmax, eng.text_buckets)
        text_ids = np.full((B, tb), cfg.gpt.stop_text_token, np.int32)
        tlens = np.zeros((B,), np.int32)
        for b, ids in enumerate(ids_list):
            text_ids[b, : len(ids)] = ids
            tlens[b] = len(ids)
        prefix_len = cfg.gpt.condition_num_latent + tb + 2

        cond_mel = jnp.broadcast_to(cond["mel"], (B,) + cond["mel"].shape[1:])
        cond_len = jnp.full((B,), cond["frames"], jnp.int32)
        cond_latents, embeds, mask = self._jit_prefix(
            self.gpt_params, cond_mel, cond_len, jnp.asarray(text_ids),
            jnp.asarray(tlens), prefix_len)
        if sampling.num_beams > 1:
            # batched (B, K) beams: every bucket row decodes in one program
            # (engine/beam.py vmaps the scorer per row)
            codes, code_lens = generate_beam(
                self.gpt_params, cfg.gpt, self.gpt_dims, embeds, mask,
                self._next_rng(), max_new_tokens=max_mel_tokens,
                sampling=sampling, dtype=self.dtype)
        else:
            codes, code_lens = generate_adaptive(
                self.gpt_params, cfg.gpt, self.gpt_dims, embeds, mask,
                self._next_rng(), max_new_tokens=max_mel_tokens,
                sampling=sampling, dtype=self.dtype)
        codes_np = np.asarray(codes)
        lens_np = np.maximum(np.asarray(code_lens), 1)
        codes_np, lens_np = remove_long_silence(codes_np, lens_np,
                                                self.stop_mel_token)
        return text_ids, tlens, codes_np, lens_np, cond_latents, cond_mel, cond_len

    def _synthesize_batch(self, cond_latents, cond_mel, cond_len, text_ids,
                          tlens, codes_np, lens_np):
        eng = self.cfg.engine
        cb = pick_bucket(int(lens_np.max()), eng.mel_len_buckets)
        codes_b = pad_to(codes_np, cb, axis=1, value=self.stop_mel_token)
        wav = self._jit_synth(self.gpt_params, self.bigvgan_params, cond_latents,
                              cond_mel, cond_len, jnp.asarray(text_ids),
                              jnp.asarray(tlens), jnp.asarray(codes_b),
                              jnp.asarray(lens_np), code_bucket=cb)
        wav = np.asarray(wav, np.float32)
        total_up = self.cfg.bigvgan.total_upsample
        return [wav[b: b + 1, : int(lens_np[b]) * total_up]
                for b in range(wav.shape[0])]

    def infer(self, audio_prompt, text, output_path, verbose=False,
              max_text_tokens_per_segment=120, **generation_kwargs):
        print(">> start inference...")
        self._set_gr_progress(0, "start inference...")
        start_time = time.perf_counter()
        cond = self._prepare_cond_mel(audio_prompt, verbose)
        sampling, max_mel_tokens = self._sampling_from_kwargs(generation_kwargs)
        segments = self.tokenizer.split_segments(
            self.tokenizer.tokenize(text), max_text_tokens_per_segment)
        wavs = []
        for seg_idx, sent in enumerate(segments):
            self._set_gr_progress(0.2 + 0.6 * seg_idx / max(len(segments), 1),
                                  f"inference {seg_idx + 1}/{len(segments)}...")
            (text_ids, tlens, codes_np, lens_np, cond_latents, cond_mel,
             cond_len) = self._decode_batch(cond, [sent], sampling,
                                            max_mel_tokens, verbose)
            wavs.extend(self._synthesize_batch(cond_latents, cond_mel, cond_len,
                                               text_ids, tlens, codes_np, lens_np))
        return self._finalize(wavs, output_path, start_time)

    def infer_fast(self, audio_prompt, text, output_path, verbose=False,
                   max_text_tokens_per_segment=100, segments_bucket_max_size=4,
                   **generation_kwargs):
        """Bucketed batch synthesis (reference `infer.py:283-516`)."""
        print(">> starting fast inference...")
        start_time = time.perf_counter()
        cond = self._prepare_cond_mel(audio_prompt, verbose)
        sampling, max_mel_tokens = self._sampling_from_kwargs(generation_kwargs)
        segments = self.tokenizer.split_segments(
            self.tokenizer.tokenize(text), max_text_tokens_per_segment)
        buckets = self.bucket_segments(segments,
                                       bucket_max_size=segments_bucket_max_size)
        results = {}
        for bucket in buckets:
            sents = [item["sent"] for item in bucket]
            (text_ids, tlens, codes_np, lens_np, cond_latents, cond_mel,
             cond_len) = self._decode_batch(cond, sents, sampling,
                                            max_mel_tokens, verbose)
            outs = self._synthesize_batch(cond_latents, cond_mel, cond_len,
                                          text_ids, tlens, codes_np, lens_np)
            for item, w in zip(bucket, outs):
                results[item["idx"]] = w
        wavs = [results[i] for i in sorted(results)]
        return self._finalize(wavs, output_path, start_time)

    def _sampling_from_kwargs(self, kw):
        sampling = SamplingConfig(
            do_sample=bool(kw.pop("do_sample", True)),
            temperature=float(kw.pop("temperature", 1.0)),
            top_k=int(kw.pop("top_k", 30)),
            top_p=float(kw.pop("top_p", 0.8)),
            repetition_penalty=float(kw.pop("repetition_penalty", 10.0)),
            num_beams=int(kw.pop("num_beams", 3)),
            length_penalty=float(kw.pop("length_penalty", 0.0)),
            typical_sampling=bool(kw.pop("typical_sampling", False)),
            typical_mass=float(kw.pop("typical_mass", 0.9)))
        return sampling, int(kw.pop("max_mel_tokens", 600))

    def _finalize(self, wavs, output_path, start_time):
        wav = (np.concatenate(wavs, axis=1) if wavs
               else np.zeros((1, 0), np.float32))
        wav = np.clip(32767 * wav, -32767.0, 32767.0)
        end_time = time.perf_counter()
        wav_length = wav.shape[-1] / self.SAMPLING_RATE
        print(f">> Total inference time: {end_time - start_time:.2f} seconds")
        print(f">> Generated audio length: {wav_length:.2f} seconds")
        if wav_length > 0:
            print(f">> RTF: {(end_time - start_time) / wav_length:.4f}")
        if output_path:
            if os.path.isfile(output_path):
                os.remove(output_path)
            write_wav(output_path, wav.astype(np.int16), self.SAMPLING_RATE)
            print(">> wav file saved to:", output_path)
            return output_path
        return (self.SAMPLING_RATE, wav.astype(np.int16).T)

"""IndexTTS2 pipeline orchestrator — the TPU-native `infer_v2`.

Public surface mirrors the reference (`/root/reference/indextts/infer_v2.py`):

    tts = IndexTTS2(cfg_path, model_dir)
    tts.infer(spk_audio_prompt=..., text=..., output_path=...,
              emo_audio_prompt=..., emo_alpha=..., emo_vector=...,
              use_emo_text=..., emo_text=..., use_random=...,
              interval_silence=..., verbose=..., max_text_tokens_per_segment=...,
              stream_return=..., **generation_kwargs)

TPU-first redesign: the reference crosses host<->device per token, per Euler
step, and per stage; here everything between audio-in and audio-out runs as
four jitted XLA programs, compiled once per shape bucket:

  [P] prompt program: w2v-bert -> RepCodec quantize -> 22k mel -> Kaldi fbank
      -> CAMPPlus -> length-regulated prompt condition   (cached per prompt)
  [E] emotion/conditioning program: conformer+perceiver speaker latents,
      merged emotion vector, left-padded prefix embeddings
  [G] generate program: prefill + lax.while_loop KV-cached decode with
      on-device sampling (engine/decode.py)
  [S1] latent program: teacher-forced GPT latents -> gpt_layer + vq2emb
      (timed separately as `gpt_forward_time`, like the reference)
  [S2] synthesis program: length regulator -> 25-step CFM Euler scan
      (CFG batch 2); [V] vocoder program: BigVGAN -> waveform

Host work is tokenization, WAV I/O, cache bookkeeping, and the RTF report.
"""

from __future__ import annotations

import functools
import os
import time
import warnings
from typing import Dict, Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu import nn
from indextts_tpu.config import IndexTTS2Config, load_config
from indextts_tpu.engine.beam import generate_beam, generate_group_beam
from indextts_tpu.engine.decode import (SamplingConfig, generate,
                                         generate_adaptive)
from indextts_tpu.models.codec.repcodec import (init_repcodec, repcodec_quantize,
                                                repcodec_vq2emb)
from indextts_tpu.models.codec.w2vbert import init_w2vbert, w2vbert_forward
from indextts_tpu.models.gpt.gpt2 import GPT2Dims
from indextts_tpu.models.gpt import unified_voice as uv
from indextts_tpu.models.s2mel.campplus import campplus_forward, init_campplus
from indextts_tpu.models.s2mel.cfm import cfm_inference
from indextts_tpu.models.s2mel.length_regulator import length_regulate
from indextts_tpu.models.s2mel.s2mel import gpt_layer_forward, init_s2mel
from indextts_tpu.models.vocoder.bigvgan import bigvgan_forward, init_bigvgan
from indextts_tpu.nn import InitRng
from indextts_tpu.ops.mel import kaldi_fbank, mel_spectrogram
from indextts_tpu.pipeline.buckets import pad_to, pick_bucket
from indextts_tpu.pipeline.emotion import QwenEmotion, normalize_emo_vec
from indextts_tpu.text.front import TextNormalizer, TextTokenizer
from indextts_tpu.utils import convert
from indextts_tpu.utils.resample import resample_audio
from indextts_tpu.utils.wav_io import read_wav_mono, write_wav


def _spec_decode_gamma() -> int:
    """gamma for the B=1 self-gating speculative decoder. Default ON at
    gamma=8 (the online acceptance gate bounds the adversarial worst case
    under 1%, engine/speculative.py). INDEXTTS_SPEC_DECODE=0/off disables;
    any other integer overrides gamma."""
    raw = os.environ.get("INDEXTTS_SPEC_DECODE", "").strip().lower()
    if raw in ("", "on", "true", "default"):
        return 8
    if raw in ("0", "off", "false", "no"):
        return 0
    try:
        return max(0, int(raw))
    except ValueError:
        return 8


def _aux_decode_fn(sampling):
    """HF GenerationMode selection for the auxiliary decode modes:
    contrastive search when penalty_alpha > 0 and top_k > 1 and greedy
    (matching HF's mode rule — with do_sample=True the kwargs fall through
    to plain sampling, as in HF), DoLa when dola_layers is set. Both are
    num_beams == 1 modes (engine/modes.py; parity-tested vs the executing
    reference in tests/test_generation_modes.py)."""
    if sampling.num_beams > 1:
        return None
    if sampling.dola_layers is not None:
        from indextts_tpu.engine.modes import generate_dola
        return generate_dola
    if (sampling.penalty_alpha > 0 and sampling.top_k > 1
            and not sampling.do_sample):
        from indextts_tpu.engine.modes import generate_contrastive
        return generate_contrastive
    return None


def find_most_similar_cosine(query: jnp.ndarray, matrix: jnp.ndarray) -> int:
    """argmax cosine similarity (reference `infer_v2.py:719-725`)."""
    q = query.astype(jnp.float32)
    m = matrix.astype(jnp.float32)
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    mn = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-8)
    sims = mn @ qn.reshape(-1)
    return int(jnp.argmax(sims))


class IndexTTS2:
    """Zero-shot, emotion- and duration-controllable TTS (v2 model family)."""

    MEL_PER_CODE = 1.72  # 25 Hz codes -> ~86 Hz mel (infer_v2.py:651)
    SAMPLING_RATE = 22050

    def __init__(self, cfg_path: Optional[str] = "checkpoints/config.yaml",
                 model_dir: str = "checkpoints", use_fp16: bool = False,
                 device: Optional[str] = None, use_cuda_kernel: Optional[bool] = None,
                 use_deepspeed: bool = False, use_accel: bool = False,
                 use_torch_compile: bool = False, aux_paths: Optional[dict] = None,
                 seed: int = 0, dtype=jnp.bfloat16,
                 allow_random_init: bool = True,
                 quantization: Optional[str] = None,
                 cfg: Optional[IndexTTS2Config] = None,
                 mesh=None):
        """Accepts the reference's kwargs; CUDA-era knobs (use_cuda_kernel,
        use_deepspeed, use_accel, use_torch_compile) are accepted and ignored —
        XLA compilation subsumes all of them.

        mesh: optional `jax.sharding.Mesh` (or an int device count) — params
        are replicated across it and the batched segment decode + synthesis
        shard their segment rows over the `dp` axis (segments -> chips, the
        TPU analogue of the reference's `bucket_segments`).
        """
        del use_cuda_kernel, use_deepspeed, use_accel, use_torch_compile, device
        if isinstance(mesh, int):
            from indextts_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(mesh, tp=1)
        self.mesh = mesh
        from indextts_tpu.utils.xla_cache import enable_persistent_cache
        enable_persistent_cache()
        # emit a per-stage device sync for honest s2mel/vocoder split timing
        # (costs one relay RTT per segment; totals/RTF are exact either way)
        self.stage_sync = os.environ.get("INDEXTTS_STAGE_SYNC", "0") == "1"
        self.model_dir = model_dir
        if cfg is not None:
            self.cfg = cfg
        elif cfg_path and os.path.exists(cfg_path):
            self.cfg = load_config(cfg_path)
        else:
            self.cfg = IndexTTS2Config()
        self.dtype = jnp.float16 if use_fp16 else dtype
        self.quantization = quantization
        self.stop_mel_token = self.cfg.gpt.stop_mel_token
        self.model_version = self.cfg.version

        self._rng = jax.random.PRNGKey(seed)
        self._init_rng = InitRng(seed)
        self._load_models(aux_paths, allow_random_init)
        self._load_frontend()
        self._build_jits()

        # reference-audio caches (infer_v2.py:213-219)
        self.cache_spk_audio_prompt = None
        # (gamma, chunks, committed, singles) of the last B=1 speculative
        # decode — acceptance observability (tools/day_one.py)
        self.last_spec_stats = None
        self.cache_spk = None
        self.cache_emo_audio_prompt = None
        self.cache_emo_cond = None

        self.gr_progress = None
        self.qwen_emo = QwenEmotion(os.path.join(model_dir, self.cfg.qwen_emo_path))

    # ------------------------------------------------------------------ init
    def _load_models(self, aux_paths: Optional[dict], allow_random_init: bool):
        cfg = self.cfg
        rng = self._init_rng
        mdir = self.model_dir

        def path(p):
            return os.path.join(mdir, p) if p else None

        gpt_path = path(cfg.gpt_checkpoint)
        if gpt_path and os.path.exists(gpt_path):
            sd = convert.load_torch_state_dict(gpt_path)
            self.gpt_params = convert.convert_unified_voice(sd, cfg.gpt)
            print(">> GPT weights converted from:", gpt_path)
        elif allow_random_init:
            self.gpt_params = uv.init_unified_voice(rng, cfg.gpt)
            print(">> GPT randomly initialized (no checkpoint found)")
        else:
            raise FileNotFoundError(gpt_path)

        s2_path = path(cfg.s2mel_checkpoint)
        if s2_path and os.path.exists(s2_path):
            sd = convert.load_torch_state_dict(s2_path)
            self.s2mel_params = convert.convert_s2mel(sd, cfg.s2mel)
            print(">> s2mel weights converted from:", s2_path)
        else:
            self.s2mel_params = init_s2mel(rng, cfg.s2mel)
            print(">> s2mel randomly initialized")

        codec_path = (aux_paths or {}).get(
            "semantic_codec", path("hf_cache/semantic_codec_model.safetensors"))
        if codec_path and os.path.exists(codec_path):
            sd = convert.load_torch_state_dict(codec_path)
            self.codec_params = convert.convert_repcodec(sd, cfg.semantic_codec)
            print(">> semantic codec converted from:", codec_path)
        else:
            self.codec_params = init_repcodec(rng, cfg.semantic_codec)
            print(">> semantic codec randomly initialized")

        camp_path = (aux_paths or {}).get(
            "campplus", path("hf_cache/campplus_cn_common.bin"))
        if camp_path and os.path.exists(camp_path):
            sd = convert.load_torch_state_dict(camp_path)
            self.campplus_params = convert.convert_campplus(sd)
            print(">> campplus converted from:", camp_path)
        else:
            self.campplus_params = init_campplus(rng)
            print(">> campplus randomly initialized")

        bv_dir = (aux_paths or {}).get("bigvgan", path("hf_cache/bigvgan"))
        bv_ckpt = None
        # BigVGAN ships its own config.json (AttrDict in the reference,
        # `s2mel/modules/bigvgan/bigvgan.py:25-28`) — honor it when present
        if bv_dir and os.path.isfile(os.path.join(bv_dir, "config.json")):
            import json as _json

            from indextts_tpu.config import BigVGANConfig

            with open(os.path.join(bv_dir, "config.json"), "r",
                      encoding="utf-8") as f:
                bv_cfg = BigVGANConfig.from_dict(_json.load(f))
            self.cfg = dataclasses_replace_bigvgan(self.cfg, bv_cfg)
        if bv_dir and os.path.isdir(bv_dir):
            for cand in ("bigvgan_generator.pt", "pytorch_model.bin", "model.safetensors"):
                if os.path.exists(os.path.join(bv_dir, cand)):
                    bv_ckpt = os.path.join(bv_dir, cand)
                    break
        if bv_ckpt:
            sd = convert.load_torch_state_dict(bv_ckpt)
            if "generator" in sd:
                sd = sd["generator"]
            self.bigvgan_params = convert.convert_bigvgan(sd, cfg.bigvgan)
            print(">> bigvgan converted from:", bv_ckpt)
        else:
            self.bigvgan_params = init_bigvgan(rng, cfg.bigvgan)
            print(">> bigvgan randomly initialized")

        w2v_dir = (aux_paths or {}).get("w2v_bert", path("hf_cache/w2v-bert-2.0"))
        w2v_ckpt = None
        if w2v_dir and os.path.isdir(w2v_dir):
            for cand in ("model.safetensors", "pytorch_model.bin"):
                if os.path.exists(os.path.join(w2v_dir, cand)):
                    w2v_ckpt = os.path.join(w2v_dir, cand)
                    break
        if w2v_ckpt:
            sd = convert.load_torch_state_dict(w2v_ckpt)
            self.w2v_params = convert.convert_w2vbert(sd, cfg.w2v_bert)
            print(">> w2v-bert converted from:", w2v_ckpt)
        else:
            self.w2v_params = init_w2vbert(rng, cfg.w2v_bert)
            print(">> w2v-bert randomly initialized")

        stat_path = path(cfg.w2v_stat)
        if stat_path and os.path.exists(stat_path):
            sd = convert.load_torch_state_dict(stat_path)
            self.w2v_mean = jnp.asarray(sd.get("mean", np.zeros(1024, np.float32)))
            self.w2v_std = jnp.asarray(sd.get("std", np.ones(1024, np.float32)))
        else:
            self.w2v_mean = jnp.zeros((cfg.w2v_bert.hidden_size,), jnp.float32)
            self.w2v_std = jnp.ones((cfg.w2v_bert.hidden_size,), jnp.float32)

        # emotion/speaker matrices split per emotion group (infer_v2.py:190-198)
        emo_path, spk_path = path(cfg.emo_matrix), path(cfg.spk_matrix)
        n_rows = sum(cfg.emo_num)
        if emo_path and os.path.exists(emo_path):
            emo_mat = next(iter(convert.load_torch_state_dict(emo_path).values())) \
                if emo_path.endswith(".safetensors") else _load_plain_tensor(emo_path)
            spk_mat = _load_plain_tensor(spk_path)
        else:
            emo_mat = self._init_rng.rng.standard_normal(
                (n_rows, self.cfg.gpt.model_dim)).astype(np.float32)
            spk_mat = self._init_rng.rng.standard_normal((n_rows, 192)).astype(np.float32)
        splits = np.cumsum(cfg.emo_num)[:-1]
        self.emo_matrix = [jnp.asarray(m) for m in np.split(np.asarray(emo_mat), splits)]
        self.spk_matrix = [jnp.asarray(m) for m in np.split(np.asarray(spk_mat), splits)]

        # compute dtype cast (norm params are cast to fp32 inside the ops),
        # then ONE batched host->device transfer for the whole tree (a
        # per-tensor transfer is an RPC each on remote-attached TPUs).
        # Under a mesh trees are replicated by default so jitted programs can
        # take dp-sharded batch inputs without resharding params. With tp > 1
        # the GPT and DiT weight matrices are Megatron-sharded over the tp
        # axis instead (`parallel/mesh.py::gpt_param_shardings`) — GSPMD then
        # partitions the decode/DiT matmuls and inserts the all-reduces.
        tp = self.mesh.devices.shape[1] if self.mesh is not None else 1
        if self.mesh is not None:
            from indextts_tpu.parallel.mesh import replicated

            placement = replicated(self.mesh)
        else:
            placement = None
        tp_axis = (dict(self.mesh.shape).get("tp", 1)
                   if self.mesh is not None else 1)
        tp_kernel = (tp_axis == 2 and self.quantization in ("int8",)
                     and os.environ.get("INDEXTTS_TP_DECODE", "") == "kernel"
                     and os.environ.get("INDEXTTS_FUSED_DECODE", "1") != "0")
        if tp_kernel:
            # tp=2 fused decode kernel (shard_map + in-kernel RDMA
            # all-reduce, ops/pallas/decode_step_tp.py): store the qkv stack
            # head-aligned and point the engine at the mesh
            from indextts_tpu.engine import decode as _dec

            _dec.TP_MESH = self.mesh
            print(">> tp=2 mesh: fused decode kernel via shard_map "
                  "(INDEXTTS_TP_DECODE=kernel; int8 weights, bf16 cache; "
                  "sampling B<=24, beam ancestry B*beams<=12 — other "
                  "configs fall back to GSPMD)")
        elif tp > 1 and os.environ.get("INDEXTTS_FUSED_DECODE", "1") == "1":
            # the single-device fused kernel cannot take a tp-sharded
            # cache/params; without the tp kernel opt-in, use the GSPMD path
            os.environ["INDEXTTS_FUSED_DECODE"] = "0"
            print(">> tp>1 mesh: fused decode kernel disabled (GSPMD path; "
                  "opt in with INDEXTTS_TP_DECODE=kernel)")

        def put(tree, tp_shard=False):
            if tp_shard and tp > 1:
                from indextts_tpu.parallel.mesh import gpt_param_shardings

                return jax.device_put(tree, gpt_param_shardings(self.mesh,
                                                                tree))
            return jax.device_put(tree, placement) if placement is not None \
                else jax.device_put(tree)

        for name in ("gpt_params", "s2mel_params", "codec_params",
                     "bigvgan_params", "w2v_params"):
            tree = nn.cast_tree(getattr(self, name), self.dtype)
            if name == "gpt_params" and self.quantization in ("int8",
                                                              "int8kv"):
                # weight-only int8 for the decode hot path (HBM-bound);
                # scales stay fp32
                from indextts_tpu.models.gpt.gpt2 import quantize_gpt2_int8

                tree = dict(tree)
                tree["gpt"] = quantize_gpt2_int8(tree["gpt"])
                if tp_kernel:
                    from indextts_tpu.ops.pallas.decode_step_tp import \
                        gpt_tp_layout

                    tree["gpt"] = gpt_tp_layout(tree["gpt"])
                print(">> GPT decoder weights quantized to int8 (weight-only)")
            elif name == "gpt_params" and self.quantization in ("int4",
                                                                "int4kv"):
                # weight-only int4 (nibble-packed): halves decode weight DMA
                # again vs int8; unpack runs inside the fused decode kernel
                from indextts_tpu.models.gpt.gpt2 import quantize_gpt2_int4

                tree = dict(tree)
                tree["gpt"] = quantize_gpt2_int4(tree["gpt"])
                print(">> GPT decoder weights quantized to int4 (weight-only)")
            setattr(self, name,
                    put(tree, tp_shard=name in ("gpt_params", "s2mel_params")))
        self.campplus_params = put(nn.cast_tree(self.campplus_params, jnp.float32))
        if self.mesh is not None:
            self.w2v_mean = put(self.w2v_mean)
            self.w2v_std = put(self.w2v_std)
            self.emo_matrix = [put(m) for m in self.emo_matrix]
            self.spk_matrix = [put(m) for m in self.spk_matrix]

    def _capture_synth(self, cond_latents, emovec, text_ids, text_lens,
                       codes, code_lens, spk, rng, code_bucket, mel_bucket,
                       prompt_bucket):
        """Record the synth-program input boundary when `self.capture` is a
        list (set by eval/tiny_shim.py): everything a reference torch
        re-render of codes -> mel -> wav needs, including the CFM noise key
        so both renders integrate the same ODE path."""
        cap = getattr(self, "capture", None)
        if cap is None:
            return
        cap.append({
            "cond_latents": np.asarray(cond_latents, np.float32),
            "emovec": np.asarray(emovec, np.float32),
            "text_ids": np.asarray(text_ids, np.int32),
            "text_lens": np.asarray(text_lens, np.int32),
            "codes": np.asarray(codes, np.int32),
            "code_lens": np.asarray(code_lens, np.int32),
            "prompt_cond": np.asarray(spk["prompt_cond"], np.float32),
            "ref_mel": np.asarray(spk["ref_mel"], np.float32),
            "ref_len": int(spk["ref_len"]),
            "style": np.asarray(spk["style"], np.float32),
            "rng": rng,
            "code_bucket": int(code_bucket),
            "mel_bucket": int(mel_bucket),
            "prompt_bucket": int(prompt_bucket),
        })

    def _load_frontend(self):
        bpe_path = os.path.join(self.model_dir, self.cfg.dataset.get("bpe_model", "bpe.model"))
        self.normalizer = TextNormalizer(enable_glossary=True)
        self.normalizer.load()
        if os.path.exists(bpe_path):
            self.tokenizer = TextTokenizer(bpe_path, self.normalizer)
            print(">> bpe model loaded from:", bpe_path)
        else:
            self.tokenizer = None
            print(">> WARNING: no bpe.model; only pre-tokenized input supported")
        glossary_path = os.path.join(self.model_dir, "glossary.yaml")
        if os.path.exists(glossary_path):
            self.normalizer.load_glossary_from_yaml(glossary_path)
            print(">> Glossary loaded from:", glossary_path)

        try:
            from transformers import SeamlessM4TFeatureExtractor

            fe_dir = os.path.join(self.model_dir, "hf_cache", "w2v-bert-2.0")
            if os.path.isdir(fe_dir) and os.path.exists(
                    os.path.join(fe_dir, "preprocessor_config.json")):
                self.extract_features = SeamlessM4TFeatureExtractor.from_pretrained(
                    fe_dir, local_files_only=True)
            else:
                self.extract_features = SeamlessM4TFeatureExtractor()
        except Exception as e:
            raise RuntimeError(f"SeamlessM4TFeatureExtractor unavailable: {e}")

    # ------------------------------------------------------------------ jits
    def _build_jits(self):
        cfg = self.cfg
        eng = cfg.engine
        dims = GPT2Dims(cfg.gpt.layers, cfg.gpt.model_dim, cfg.gpt.heads)
        self.gpt_dims = dims
        dtype = self.dtype

        @functools.partial(jax.jit, static_argnames=())
        def cond_program(w2v_params, feats, flen, mean, std):
            """[P1] w2v-bert features -> standardized hidden[17]."""
            h = w2vbert_forward(w2v_params, cfg.w2v_bert, feats.astype(dtype), flen)
            h = (h.astype(jnp.float32) - mean) / std
            return h

        self._jit_cond = cond_program

        @jax.jit
        def prompt_program(codec_params, s2mel_params, campplus_params,
                           spk_cond_emb, flen, audio22k, alen22, fbank_feats, fblen):
            """[P2] prompt caches: quantized codes, ref mel, style, prompt cond."""
            _, s_ref = repcodec_quantize(codec_params, cfg.semantic_codec,
                                         spk_cond_emb.astype(dtype))
            mel = mel_spectrogram(
                audio22k,
                n_fft=cfg.s2mel.preprocess_params.spect_params.n_fft,
                num_mels=cfg.s2mel.preprocess_params.spect_params.n_mels,
                sampling_rate=cfg.s2mel.preprocess_params.sr,
                hop_size=cfg.s2mel.preprocess_params.spect_params.hop_length,
                win_size=cfg.s2mel.preprocess_params.spect_params.win_length,
                fmin=cfg.s2mel.preprocess_params.spect_params.fmin,
                fmax=cfg.s2mel.preprocess_params.spect_params.fmax,
            )  # (1, 80, frames)
            ref_mel = mel.transpose(0, 2, 1)  # (1, frames, 80)
            ref_len = alen22 // cfg.s2mel.preprocess_params.spect_params.hop_length
            # campplus style from mean-normalized fbank
            fb_mask = nn.sequence_mask(fblen, fbank_feats.shape[1])[:, :, None]
            fb_cnt = jnp.maximum(jnp.sum(fb_mask, axis=1, keepdims=True), 1)
            fb_mean = jnp.sum(jnp.where(fb_mask, fbank_feats, 0.0), axis=1,
                              keepdims=True) / fb_cnt
            fb = jnp.where(fb_mask, fbank_feats - fb_mean, 0.0)
            style = campplus_forward(campplus_params, fb, fblen)
            # length-regulate prompt semantic features to ref mel length
            prompt_cond = length_regulate(
                s2mel_params["length_regulator"], cfg.s2mel.length_regulator,
                jnp.zeros(s_ref.shape[:2], jnp.int32), flen, ref_len,
                out_size=ref_mel.shape[1], features=s_ref)
            return s_ref, ref_mel, ref_len, style, prompt_cond

        self._jit_prompt = prompt_program

        @functools.partial(jax.jit, static_argnames=("prefix_len",))
        def prefix_program(gpt_params, spk_cond_emb, spk_len, emo_cond_emb,
                           emo_len, alpha, text_ids, text_len, prefix_len):
            """[E] conditioning latents + merged emovec + prefix embeddings.

            The emo-vector path merges `emovec_mat` on the host afterwards
            (reference `infer_v2.py:568-570`), so no override rides in-graph.
            """
            cond_latents = uv.get_conditioning(gpt_params, cfg.gpt,
                                               spk_cond_emb.astype(dtype), spk_len)
            emovec = uv.merge_emovec(gpt_params, cfg.gpt,
                                     spk_cond_emb.astype(dtype),
                                     emo_cond_emb.astype(dtype),
                                     spk_len, emo_len, alpha)
            conds = uv.build_conds_latent(gpt_params, cond_latents, emovec)
            embeds, mask = uv.prepare_prefix_embeds(
                gpt_params, cfg.gpt, conds, text_ids, text_len, prefix_len,
                dtype=dtype)
            return cond_latents, emovec, embeds, mask

        self._jit_prefix = prefix_program

        @functools.partial(jax.jit, static_argnames=("prefix_len",))
        def prefix_batch_program(gpt_params, cond_latents, emovec,
                                 text_ids, text_len, prefix_len):
            """[EB] batched prefix embeddings: one speaker's conds broadcast
            over B text segments (left-padded rows, reference
            `prepare_gpt_inputs` batching, model_v2.py:633-696)."""
            conds = uv.build_conds_latent(gpt_params, cond_latents, emovec)
            B = text_ids.shape[0]
            conds = jnp.broadcast_to(conds, (B,) + conds.shape[1:])
            return uv.prepare_prefix_embeds(gpt_params, cfg.gpt, conds,
                                            text_ids, text_len, prefix_len,
                                            dtype=dtype)

        self._jit_prefix_batch = prefix_batch_program

        @functools.partial(jax.jit, static_argnames=("code_bucket",))
        def latent_program(gpt_params, s2mel_params, codec_params,
                           cond_latents, emovec, text_ids, text_len,
                           codes, code_len, code_bucket: int):
            """[S1] teacher-forced GPT latent forward -> semantic features.

            Split out of the synthesis program so the per-run report's
            `gpt_forward_time` measures the real latent-forward cost (the
            reference times it separately, `infer_v2.py:688-694`; a fused
            program left the field permanently 0.00 — VERDICT r3 item 4).
            The boundary tensor is (B, code_bucket, 1024); the extra
            dispatch is ~ms against a ~100 ms stage.
            """
            B = codes.shape[0]
            cond_latents = jnp.broadcast_to(
                cond_latents, (B,) + cond_latents.shape[1:])
            emovec = jnp.broadcast_to(emovec, (B,) + emovec.shape[1:])
            # teacher-forced GPT latents (infer_v2.py:628-639)
            latent = uv.forward_latents(gpt_params, cfg.gpt, cond_latents, emovec,
                                        text_ids, text_len, codes, code_len,
                                        dtype=dtype)  # (B, Lm+1, D)
            latent = latent[:, :code_bucket]
            latent = gpt_layer_forward(s2mel_params, latent)  # (B, Cb, 1024)
            s_infer = repcodec_vq2emb(codec_params, codes[:, :code_bucket])
            return s_infer + latent

        self._jit_latent = latent_program

        @functools.partial(jax.jit,
                           static_argnames=("mel_bucket", "prompt_bucket",
                                            "n_timesteps"))
        def synth_program(s2mel_params, s_infer, code_len,
                          prompt_cond, prompt_len, ref_mel, style, rng,
                          mel_bucket: int, prompt_bucket: int,
                          n_timesteps: int = 25):
            """[S2] semantic features -> target-region mel (regulator + CFM).

            Batch-generic: `s_infer`/`code_len` may carry B segment rows; the
            shared speaker tensors (prompt caches, style) are (1, ...) and
            broadcast — so the whole multi-segment synthesis (DiT 25xCFG-2
            Euler) runs as ONE XLA program with DiT batch 2B instead of B
            sequential dispatches.
            """
            B = s_infer.shape[0]
            prompt_cond = jnp.broadcast_to(
                prompt_cond, (B,) + prompt_cond.shape[1:])
            ref_mel = jnp.broadcast_to(ref_mel, (B,) + ref_mel.shape[1:])
            style = jnp.broadcast_to(style, (B,) + style.shape[1:])
            prompt_len = jnp.broadcast_to(prompt_len, (B,))
            target_len = (code_len.astype(jnp.float32) * IndexTTS2.MEL_PER_CODE
                          ).astype(jnp.int32)
            cond = length_regulate(s2mel_params["length_regulator"],
                                   cfg.s2mel.length_regulator,
                                   jnp.zeros(s_infer.shape[:2], jnp.int32),
                                   code_len, target_len, out_size=mel_bucket,
                                   features=s_infer)
            # concat [prompt_cond(ref region)][cond(target)] with dynamic
            # prompt_len: build by scatter into a (B, Pb+Mb, C) buffer
            total = prompt_bucket + mel_bucket
            buf = jnp.zeros((B, total, cond.shape[-1]), cond.dtype)
            buf = jax.lax.dynamic_update_slice(buf, prompt_cond[:, :prompt_bucket],
                                               (0, 0, 0))
            # place cond at offset prompt_len via gather-shift
            idx = jnp.arange(total)[None, :] - prompt_len[:, None]
            in_tgt = (idx >= 0) & (idx < mel_bucket)
            gathered = jnp.take_along_axis(
                cond, jnp.clip(idx, 0, mel_bucket - 1)[:, :, None], axis=1)
            in_prompt = jnp.arange(total)[None, :] < prompt_len[:, None]
            cat_cond = jnp.where(in_tgt[:, :, None] & ~in_prompt[:, :, None],
                                 gathered, buf)
            x_lens = prompt_len + target_len
            prompt_mel = jnp.zeros((B, total, cfg.s2mel.DiT.in_channels),
                                   jnp.float32)
            prompt_mel = jax.lax.dynamic_update_slice(
                prompt_mel, ref_mel[:, :prompt_bucket].astype(jnp.float32), (0, 0, 0))
            # [M] sequence parallel: on an sp mesh the DiT time axis shards
            # over sp (GSPMD partitions the backbone; see parallel/mesh.py)
            seq_sh = None
            if self.mesh is not None:
                from indextts_tpu.parallel.mesh import seq_sharding
                seq_sh = seq_sharding(self.mesh)
            vc = cfm_inference(s2mel_params["cfm"], cfg.s2mel,
                               cat_cond.astype(dtype), x_lens,
                               prompt_mel.astype(dtype), style.astype(dtype),
                               rng, n_timesteps=n_timesteps,
                               inference_cfg_rate=0.7, prompt_len=prompt_len,
                               seq_sharding=seq_sh)
            # shift target region back to offset 0
            idx2 = jnp.arange(mel_bucket)[None, :] + prompt_len[:, None]
            idx2 = jnp.minimum(idx2, total - 1)
            vc_tgt = jnp.take_along_axis(vc, idx2[:, :, None], axis=1)
            return vc_tgt, target_len

        self._jit_synth = synth_program

        @jax.jit
        def vocoder_program(bigvgan_params, vc_tgt, target_len):
            """[V] mel -> waveform (split from [S] so the pipeline reports
            s2mel vs vocoder stage times like the reference does)."""
            return bigvgan_forward(bigvgan_params, cfg.bigvgan,
                                   vc_tgt.astype(dtype), target_len)

        self._jit_vocoder = vocoder_program
        self._sr_hop = cfg.s2mel.preprocess_params.spect_params.hop_length

    # ----------------------------------------------------------- host helpers
    def _next_rng(self):
        self._rng, r = jax.random.split(self._rng)
        return r

    def _set_gr_progress(self, value, desc):
        if self.gr_progress is not None:
            self.gr_progress(value, desc=desc)

    def _load_and_cut_audio(self, audio_path, max_seconds, verbose=False, sr=None):
        audio, in_sr = read_wav_mono(audio_path, target_sr=sr)
        max_samples = int(max_seconds * in_sr)
        if audio.shape[1] > max_samples:
            if verbose:
                print(f"Audio too long ({audio.shape[1]} samples), "
                      f"truncating to {max_samples} samples")
            audio = audio[:, :max_samples]
        return audio, in_sr

    def _w2v_features(self, audio16k: np.ndarray):
        """Host SeamlessM4T feature extraction (numpy), like the reference."""
        inputs = self.extract_features(audio16k, sampling_rate=16000,
                                       return_tensors="np")
        feats = np.asarray(inputs["input_features"], np.float32)
        mask = np.asarray(inputs["attention_mask"])
        return feats, int(mask.sum())

    def _cond_emb(self, audio16k: np.ndarray) -> Tuple[jnp.ndarray, int]:
        feats, flen = self._w2v_features(audio16k)
        fb = pick_bucket(feats.shape[1], self.cfg.engine.cond_len_buckets)
        feats = pad_to(feats, fb, axis=1)
        emb = self._jit_cond(self.w2v_params, jnp.asarray(feats),
                             jnp.asarray([flen]), self.w2v_mean, self.w2v_std)
        return emb, flen

    def _prepare_spk_prompt(self, spk_audio_prompt: str, verbose: bool):
        """Compute (or fetch cached) speaker prompt tensors."""
        if (self.cache_spk is not None
                and self.cache_spk_audio_prompt == spk_audio_prompt):
            return self.cache_spk
        audio, sr = self._load_and_cut_audio(spk_audio_prompt, 15, verbose)
        audio_22k = resample_audio(audio, sr, 22050)
        audio_16k = resample_audio(audio, sr, 16000)

        spk_cond_emb, flen = self._cond_emb(audio_16k)

        mel_bucket = pick_bucket(audio_22k.shape[1] // self._sr_hop + 1,
                                 self.cfg.engine.mel_len_buckets)
        a22 = pad_to(audio_22k, mel_bucket * self._sr_hop, axis=1)
        # kaldi fbank at 100 fps: frames = 1 + (n - 400) // 160 (snip_edges);
        # bucket the frame count, pad audio so the framing lands exactly there
        fblen = max(1 + (audio_16k.shape[1] - 400) // 160, 1)
        fb_bucket = pick_bucket(fblen, self.cfg.engine.mel_len_buckets)
        a16 = pad_to(audio_16k, 160 * fb_bucket + 240, axis=1)
        fb_feats = np.asarray(kaldi_fbank(jnp.asarray(a16)))

        s_ref, ref_mel, ref_len, style, prompt_cond = self._jit_prompt(
            self.codec_params, self.s2mel_params, self.campplus_params,
            spk_cond_emb, jnp.asarray([flen]), jnp.asarray(a22),
            jnp.asarray([audio_22k.shape[1]]), jnp.asarray(fb_feats),
            jnp.asarray([fblen]))

        cache = {
            "spk_cond_emb": spk_cond_emb, "spk_len": flen,
            "s_ref": s_ref, "ref_mel": ref_mel,
            "ref_len": int(np.asarray(ref_len)[0]),
            "style": style, "prompt_cond": prompt_cond,
        }
        self.cache_spk = cache
        self.cache_spk_audio_prompt = spk_audio_prompt
        return cache

    def _prepare_emo_cond(self, emo_audio_prompt: str, verbose: bool):
        if (self.cache_emo_cond is not None
                and self.cache_emo_audio_prompt == emo_audio_prompt):
            return self.cache_emo_cond
        emo_audio, _ = self._load_and_cut_audio(emo_audio_prompt, 15, verbose, sr=16000)
        emb, flen = self._cond_emb(emo_audio)
        self.cache_emo_cond = (emb, flen)
        self.cache_emo_audio_prompt = emo_audio_prompt
        return self.cache_emo_cond

    def interval_silence(self, wavs, sampling_rate=22050, interval_silence=200):
        if not wavs or interval_silence <= 0:
            return wavs
        ch = wavs[0].shape[0]
        return np.zeros((ch, int(sampling_rate * interval_silence / 1000.0)),
                        np.float32)

    def insert_interval_silence(self, wavs, sampling_rate=22050, interval_silence=200):
        if not wavs or interval_silence <= 0:
            return wavs
        ch = wavs[0].shape[0]
        sil = np.zeros((ch, int(sampling_rate * interval_silence / 1000.0)),
                       np.float32)
        out = []
        for i, w in enumerate(wavs):
            out.append(w)
            if i < len(wavs) - 1:
                out.append(sil)
        return out

    def normalize_emo_vec(self, emo_vector, apply_bias=True):
        return normalize_emo_vec(emo_vector, apply_bias)

    # ------------------------------------------------------------------ infer
    def infer(self, spk_audio_prompt, text, output_path,
              emo_audio_prompt=None, emo_alpha=1.0, emo_vector=None,
              use_emo_text=False, emo_text=None, use_random=False,
              interval_silence=200, verbose=False,
              max_text_tokens_per_segment=120, stream_return=False,
              more_segment_before=0, **generation_kwargs):
        if stream_return:
            return self.infer_generator(
                spk_audio_prompt, text, output_path, emo_audio_prompt, emo_alpha,
                emo_vector, use_emo_text, emo_text, use_random, interval_silence,
                verbose, max_text_tokens_per_segment, stream_return,
                more_segment_before, **generation_kwargs)
        try:
            return list(self.infer_generator(
                spk_audio_prompt, text, output_path, emo_audio_prompt, emo_alpha,
                emo_vector, use_emo_text, emo_text, use_random, interval_silence,
                verbose, max_text_tokens_per_segment, stream_return,
                more_segment_before, **generation_kwargs))[0]
        except IndexError:
            return None

    def infer_generator(self, spk_audio_prompt, text, output_path,
                        emo_audio_prompt=None, emo_alpha=1.0, emo_vector=None,
                        use_emo_text=False, emo_text=None, use_random=False,
                        interval_silence=200, verbose=False,
                        max_text_tokens_per_segment=120, stream_return=False,
                        quick_streaming_tokens=0, **generation_kwargs):
        print(">> starting inference...")
        self._set_gr_progress(0, "starting inference...")
        if verbose:
            print(f"origin text:{text}, spk_audio_prompt:{spk_audio_prompt}, "
                  f"emo_audio_prompt:{emo_audio_prompt}, emo_alpha:{emo_alpha}, "
                  f"emo_vector:{emo_vector}, use_emo_text:{use_emo_text}, "
                  f"emo_text:{emo_text}")
        start_time = time.perf_counter()

        if use_emo_text or emo_vector is not None:
            emo_audio_prompt = None
        if use_emo_text:
            if emo_text is None:
                emo_text = text
            emo_dict = self.qwen_emo.inference(emo_text)
            print(f"detected emotion vectors from text: {emo_dict}")
            emo_vector = list(emo_dict.values())
        if emo_vector is not None:
            scale = max(0.0, min(1.0, emo_alpha))
            if scale != 1.0:
                emo_vector = [int(x * scale * 10000) / 10000 for x in emo_vector]
                print(f"scaled emotion vectors to {scale}x: {emo_vector}")
        if emo_audio_prompt is None:
            emo_audio_prompt = spk_audio_prompt
            emo_alpha = 1.0

        spk = self._prepare_spk_prompt(spk_audio_prompt, verbose)
        emo_cond_emb, emo_len = self._prepare_emo_cond(emo_audio_prompt, verbose)

        emovec_mat = None
        weight_sum = None
        if emo_vector is not None:
            weight_vector = jnp.asarray(np.asarray(emo_vector, np.float32))
            if use_random:
                import random as _random

                idxs = [_random.randint(0, n - 1) for n in self.cfg.emo_num]
            else:
                idxs = [find_most_similar_cosine(spk["style"][0], m)
                        for m in self.spk_matrix]
            rows = [m[i][None, :] for i, m in zip(idxs, self.emo_matrix)]
            emo_mat = jnp.concatenate(rows, axis=0)  # (8, D)
            emovec_mat = jnp.sum(weight_vector[:, None] * emo_mat, axis=0)[None, :]
            weight_sum = float(jnp.sum(weight_vector))

        self._set_gr_progress(0.1, "text processing...")
        if self.tokenizer is None:
            raise RuntimeError("no tokenizer loaded (missing bpe.model)")
        tokens = self.tokenizer.tokenize(text)
        segments = self.tokenizer.split_segments(
            tokens, max_text_tokens_per_segment,
            quick_streaming_tokens=quick_streaming_tokens)
        if verbose:
            print("text_tokens_list:", tokens)
            print("segments count:", len(segments))

        do_sample = generation_kwargs.pop("do_sample", True)
        top_p = generation_kwargs.pop("top_p", 0.8)
        top_k = generation_kwargs.pop("top_k", 30)
        temperature = generation_kwargs.pop("temperature", 0.8)
        length_penalty = generation_kwargs.pop("length_penalty", 0.0)
        num_beams = generation_kwargs.pop("num_beams", 3)
        repetition_penalty = generation_kwargs.pop("repetition_penalty", 10.0)
        max_mel_tokens = generation_kwargs.pop("max_mel_tokens", 1500)
        typical_sampling = generation_kwargs.pop("typical_sampling", False)
        typical_mass = generation_kwargs.pop("typical_mass", 0.9)
        min_new_tokens = generation_kwargs.pop("min_new_tokens", 0)
        # auxiliary HF generation modes (the reference forwards arbitrary
        # generation kwargs into its vendored GenerationMixin via
        # inference_speech(**hf_generate_kwargs), model_v2.py:698)
        num_beam_groups = int(generation_kwargs.pop("num_beam_groups", 1))
        diversity_penalty = float(
            generation_kwargs.pop("diversity_penalty", 0.0))
        penalty_alpha = float(generation_kwargs.pop("penalty_alpha", 0.0))
        dola_layers = generation_kwargs.pop("dola_layers", None)
        if isinstance(dola_layers, list):
            dola_layers = tuple(dola_layers)
        if num_beam_groups > 1:
            if int(num_beams) % num_beam_groups:
                raise ValueError(
                    "num_beams must be divisible by num_beam_groups")
            if do_sample:
                raise ValueError(
                    "diverse beam search requires do_sample=False")
        if dola_layers is not None and int(num_beams) > 1:
            raise ValueError("dola_layers requires num_beams=1")
        sampling = SamplingConfig(
            do_sample=bool(do_sample), temperature=float(temperature),
            top_k=int(top_k), top_p=float(top_p),
            repetition_penalty=float(repetition_penalty),
            num_beams=int(num_beams), length_penalty=float(length_penalty),
            typical_sampling=bool(typical_sampling),
            typical_mass=float(typical_mass),
            min_new_tokens=int(min_new_tokens),
            num_beam_groups=num_beam_groups,
            diversity_penalty=diversity_penalty,
            penalty_alpha=penalty_alpha, dola_layers=dola_layers,
            kv_quant=self.quantization in ("int8kv", "int4kv"))
        beam_fn = (generate_group_beam if sampling.num_beam_groups > 1
                   else generate_beam)
        aux_fn = _aux_decode_fn(sampling)

        wavs = []
        gpt_gen_time = gpt_forward_time = s2mel_time = bigvgan_time = 0.0
        has_warned = False
        silence = None
        eng = self.cfg.engine
        n_cond = self.cfg.gpt.condition_num_latent + 2

        # tokenize all segments up front
        seg_ids = [self.tokenizer.convert_tokens_to_ids(s) for s in segments]
        seg_tlens = [len(ids) for ids in seg_ids]

        # [GB] batched decode: all segments as one left-padded batch. The AR
        # loop is HBM-bound on weight reads, so B segments decode in roughly
        # the time of one (new capability vs the reference's sequential loop).
        batched = (eng.batch_segments and len(segments) > 1
                   and not stream_return)
        batch_codes = batch_code_lens = None
        cond_latents = emovec = None
        if batched:
            m_start = time.perf_counter()
            nseg = len(segments)
            tb_all = pick_bucket(max(seg_tlens), eng.text_buckets)
            # [M] mesh: segment rows shard over dp; pad the batch to a dp
            # multiple (padded rows repeat segment 0 and are dropped on host)
            seg_tlens_b = list(seg_tlens)
            nrows = nseg
            if self.mesh is not None:
                dp = self.mesh.devices.shape[0]
                nrows = -(-nseg // dp) * dp
                seg_tlens_b += [seg_tlens[0]] * (nrows - nseg)
            text_mat = np.zeros((nrows, tb_all), np.int32)
            for i in range(nrows):
                ids = seg_ids[i] if i < nseg else seg_ids[0]
                text_mat[i, :len(ids)] = ids
            prefix_len_all = n_cond + tb_all + 2
            cond_latents, emovec, _, _ = self._jit_prefix(
                self.gpt_params, spk["spk_cond_emb"], jnp.asarray([spk["spk_len"]]),
                emo_cond_emb, jnp.asarray([emo_len]), jnp.asarray(float(emo_alpha)),
                jnp.asarray(text_mat[:1]), jnp.asarray([seg_tlens[0]]),
                prefix_len_all)
            if emo_vector is not None:
                emovec = emovec_mat + (1.0 - weight_sum) * emovec
            pe, pm = self._jit_prefix_batch(
                self.gpt_params, cond_latents, emovec, jnp.asarray(text_mat),
                jnp.asarray(seg_tlens_b, np.int32), prefix_len_all)
            if self.mesh is not None:
                from indextts_tpu.parallel.mesh import batch_sharding

                pe = jax.device_put(pe, batch_sharding(self.mesh))
                pm = jax.device_put(pm, batch_sharding(self.mesh))
            # beams > 1 -> batched (B, K) beam search; otherwise the
            # adaptive-cache sampling loop. Beam batches whose B*K exceeds
            # the fused kernel's ancestry cap decode in row chunks so every
            # chunk keeps the in-kernel ancestry path (B*K<=24 via 32-slot
            # kv blocks; each extra chunk re-streams all weights per token)
            # instead of the whole batch falling back to the per-step cache
            # gather; rows are independent and per-row keys make chunking
            # token-identical (tests/test_beam.py batched==sequential).
            if sampling.num_beams > 1:
                K = sampling.num_beams
                B_rows = pe.shape[0]
                chunk = (int(os.environ.get("INDEXTTS_BEAM_CHUNK", "0"))
                         or max(1, 24 // K))
                if B_rows > chunk and self.mesh is None:
                    keys = jax.random.split(self._next_rng(), B_rows)
                    parts = [beam_fn(
                        self.gpt_params, self.cfg.gpt, self.gpt_dims,
                        pe[i:i + chunk], pm[i:i + chunk], keys[i:i + chunk],
                        max_new_tokens=max_mel_tokens, sampling=sampling,
                        dtype=self.dtype) for i in range(0, B_rows, chunk)]
                    batch_codes = jnp.concatenate([p[0] for p in parts], 0)
                    batch_code_lens = jnp.concatenate([p[1] for p in parts], 0)
                else:
                    batch_codes, batch_code_lens = beam_fn(
                        self.gpt_params, self.cfg.gpt, self.gpt_dims, pe, pm,
                        self._next_rng(), max_new_tokens=max_mel_tokens,
                        sampling=sampling, dtype=self.dtype)
            else:
                # sampling batches beyond the fused kernel's B<=24 cap
                # decode in row chunks so every chunk stays on the kernel
                # instead of the whole batch falling back to XLA (2-4x
                # slower per token). Greedy chunked == unchunked exactly;
                # sampled rows draw from per-chunk key streams.
                B_rows = pe.shape[0]
                chunk = (int(os.environ.get("INDEXTTS_DECODE_CHUNK", "0"))
                         or 24)
                if aux_fn is not None:
                    # contrastive / DoLa: diagnostic modes on the dense XLA
                    # path, batched over all rows (no kernel chunking)
                    batch_codes, batch_code_lens = aux_fn(
                        self.gpt_params, self.cfg.gpt, self.gpt_dims, pe, pm,
                        self._next_rng(), max_new_tokens=max_mel_tokens,
                        sampling=sampling, dtype=self.dtype)
                elif B_rows > chunk and self.mesh is None:
                    # ONE _next_rng() split across chunks: the host rng
                    # stream advances exactly as in the unchunked call, so
                    # the downstream CFM noise (and greedy audio) match
                    ngrp = -(-B_rows // chunk)
                    keys = jax.random.split(self._next_rng(), ngrp)
                    parts = [generate_adaptive(
                        self.gpt_params, self.cfg.gpt, self.gpt_dims,
                        pe[i:i + chunk], pm[i:i + chunk], keys[g],
                        max_new_tokens=max_mel_tokens, sampling=sampling,
                        dtype=self.dtype)
                        for g, i in enumerate(range(0, B_rows, chunk))]
                    width = max(p[0].shape[1] for p in parts)
                    batch_codes = jnp.concatenate(
                        [jnp.pad(p[0], ((0, 0), (0, width - p[0].shape[1])),
                                 constant_values=self.cfg.gpt.stop_mel_token)
                         for p in parts], 0)
                    batch_code_lens = jnp.concatenate(
                        [p[1] for p in parts], 0)
                else:
                    batch_codes, batch_code_lens = generate_adaptive(
                        self.gpt_params, self.cfg.gpt, self.gpt_dims, pe, pm,
                        self._next_rng(), max_new_tokens=max_mel_tokens,
                        sampling=sampling, dtype=self.dtype)
            batch_code_lens = np.asarray(batch_code_lens)
            gpt_gen_time += time.perf_counter() - m_start

            # [SB] batched synthesis: ONE synth program (DiT batch 2B) and ONE
            # vocoder call for all segments, instead of B sequential dispatches
            # (TPU analogue of the reference's `bucket_segments`,
            # `/root/reference/indextts/infer.py:191-247`)
            m_start = time.perf_counter()
            clens_all = np.maximum(batch_code_lens, 1).astype(np.int32)
            cb_all = pick_bucket(int(clens_all.max()), eng.mel_len_buckets)
            if batch_codes.shape[1] >= cb_all:
                codes_all = batch_codes[:, :cb_all]
            else:
                codes_all = jnp.pad(
                    batch_codes, ((0, 0), (0, cb_all - batch_codes.shape[1])),
                    constant_values=self.stop_mel_token)
            mel_bucket_all = pick_bucket(
                int(clens_all.max() * self.MEL_PER_CODE) + 1,
                eng.mel_len_buckets)
            prompt_bucket = spk["prompt_cond"].shape[1]
            if self.mesh is not None:
                from indextts_tpu.parallel.mesh import batch_sharding

                codes_all = jax.device_put(codes_all, batch_sharding(self.mesh))
            rng_synth = self._next_rng()
            self._capture_synth(
                cond_latents, emovec, text_mat, seg_tlens_b, codes_all,
                clens_all, spk, rng_synth, cb_all, mel_bucket_all,
                prompt_bucket)
            s_infer = self._jit_latent(
                self.gpt_params, self.s2mel_params, self.codec_params,
                cond_latents, emovec,
                jnp.asarray(text_mat), jnp.asarray(seg_tlens_b, np.int32),
                codes_all, jnp.asarray(clens_all), code_bucket=cb_all)
            if self.stage_sync:
                np.asarray(s_infer[0, 0, 0])
            gpt_forward_time += time.perf_counter() - m_start
            m_start = time.perf_counter()
            vc_all, _ = self._jit_synth(
                self.s2mel_params, s_infer, jnp.asarray(clens_all),
                spk["prompt_cond"], jnp.asarray([spk["ref_len"]]),
                spk["ref_mel"], spk["style"], rng_synth,
                mel_bucket=mel_bucket_all, prompt_bucket=prompt_bucket)
            if self.stage_sync:
                np.asarray(vc_all[0, 0, 0])
            s2mel_time += time.perf_counter() - m_start
            m_start = time.perf_counter()
            tlen_all = (clens_all.astype(np.float32)
                        * np.float32(self.MEL_PER_CODE)).astype(np.int32)
            # vocoder batch runs in power-of-two row chunks ({8,4,2,1}): no
            # padded rows, a bounded set of compile buckets for arbitrary
            # segment counts, and it keeps the folded-antialias kernel on
            # batch shapes it is validated at (a B=5 whole-vocoder program
            # hits an XLA-layout-dependent kernel fault; see CLAUDE.md)
            parts = []
            row = 0
            nrows_v = vc_all.shape[0]
            while row < nrows_v:
                step_rows = 8
                while step_rows > nrows_v - row:
                    step_rows //= 2
                parts.append(self._jit_vocoder(
                    self.bigvgan_params, vc_all[row:row + step_rows],
                    jnp.asarray(tlen_all[row:row + step_rows])))
                row += step_rows
            batch_wav_np = np.concatenate(
                [np.asarray(p, np.float32) for p in parts], axis=0)
            bigvgan_time += time.perf_counter() - m_start

        for seg_idx, sent in enumerate(segments):
            self._set_gr_progress(0.2 + 0.7 * seg_idx / len(segments),
                                  f"speech synthesis {seg_idx + 1}/{len(segments)}...")
            ids = seg_ids[seg_idx]
            tlen = seg_tlens[seg_idx]

            if batched:
                # decode + synthesis already ran as one batch; slice this
                # segment's rows out of the host-side results
                code_lens_np = batch_code_lens[seg_idx:seg_idx + 1]
                if not has_warned and int(code_lens_np[0]) >= max_mel_tokens:
                    warnings.warn(
                        f"WARN: generation stopped due to exceeding `max_mel_tokens` "
                        f"({max_mel_tokens}). Consider reducing "
                        f"`max_text_tokens_per_segment`({max_text_tokens_per_segment}) "
                        f"or increasing `max_mel_tokens`.", RuntimeWarning)
                    has_warned = True
                clen = max(int(code_lens_np[0]), 1)
                if verbose:
                    print(f"segment {seg_idx}: text_tokens={tlen}, codes={clen}")
                n_samples = int(np.float32(clen)
                                * np.float32(self.MEL_PER_CODE)) * 256
                wav_np = batch_wav_np[seg_idx:seg_idx + 1, :n_samples]
                wav_np = np.clip(32767 * wav_np, -32767.0, 32767.0)
                if verbose:
                    print(f"wav shape: {wav_np.shape}", "min:", wav_np.min(),
                          "max:", wav_np.max())
                wavs.append(wav_np)
                continue

            tb = pick_bucket(tlen, eng.text_buckets)
            text_ids = np.zeros((1, tb), np.int32)
            text_ids[0, :tlen] = ids

            m_start = time.perf_counter()
            # [E] prefix
            prefix_len = n_cond + tb + 2
            cond_latents, emovec, prefix_embeds, prefix_mask = self._jit_prefix(
                self.gpt_params, spk["spk_cond_emb"], jnp.asarray([spk["spk_len"]]),
                emo_cond_emb, jnp.asarray([emo_len]), jnp.asarray(float(emo_alpha)),
                jnp.asarray(text_ids), jnp.asarray([tlen]), prefix_len)
            if emo_vector is not None:
                # emovec = emovec_mat + (1 - sum(w)) * merged (infer_v2.py:568-570)
                emovec = emovec_mat + (1.0 - weight_sum) * emovec
                conds = uv.build_conds_latent(self.gpt_params, cond_latents, emovec)
                prefix_embeds, prefix_mask = uv.prepare_prefix_embeds(
                    self.gpt_params, self.cfg.gpt, conds, jnp.asarray(text_ids),
                    jnp.asarray([tlen]), prefix_len, dtype=self.dtype)

            # [G] decode (beam search when num_beams > 1, the reference
            # default; otherwise the self-gating speculative B=1 decoder —
            # DEFAULT ON: a short probe span measures draft acceptance
            # online and demotes to the plain fused step when speculation
            # is not clearing its device cost ratio, so the adversarial
            # worst case is <1% (engine/speculative.py). Token-identical to
            # generate() on the CPU lane; INDEXTTS_SPEC_DECODE=0 reverts.
            spec_gamma = (0 if (sampling.num_beams > 1
                                or aux_fn is not None
                                or self.mesh is not None)
                          else _spec_decode_gamma())
            if spec_gamma > 0:
                from indextts_tpu.engine.speculative import (
                    generate_spec_adaptive, spec_commit_ratio)

                codes, code_lens, spec_stats = generate_spec_adaptive(
                    self.gpt_params, self.cfg.gpt, self.gpt_dims,
                    prefix_embeds, prefix_mask, self._next_rng(),
                    max_new_tokens=max_mel_tokens, sampling=sampling,
                    dtype=self.dtype, gamma=spec_gamma,
                    ngram=int(os.environ.get("INDEXTTS_SPEC_NGRAM", "2")))
                # ONE batched host readback for lengths + stats (each
                # readback is a full relay RTT); the stats ride along as
                # acceptance observability for deployments
                # (tools/day_one.py sweeps gamma through this)
                code_lens_np, stats_np = jax.device_get((code_lens,
                                                         spec_stats))
                self.last_spec_stats = (spec_gamma,
                                        *(int(v) for v in stats_np))
                if verbose:
                    _, ch, com, sg = self.last_spec_stats
                    acc = ((com - ch) / (ch * spec_gamma)) if ch else 0.0
                    print(f">> spec decode: {ch} chunk verifies committed "
                          f"{com} tokens, {sg} single steps (per-draft "
                          f"acceptance {acc:.2f}; gate "
                          f"{spec_commit_ratio(spec_gamma):.2f} "
                          f"commits/chunk, docs/KERNELS.md §1)")
            else:
                decode_fn = (beam_fn if sampling.num_beams > 1
                             else (aux_fn or generate_adaptive))
                codes, code_lens = decode_fn(
                    self.gpt_params, self.cfg.gpt, self.gpt_dims,
                    prefix_embeds, prefix_mask, self._next_rng(),
                    max_new_tokens=max_mel_tokens, sampling=sampling,
                    dtype=self.dtype)
                code_lens_np = np.asarray(code_lens)
            gpt_gen_time += time.perf_counter() - m_start

            if not has_warned and int(code_lens_np[0]) >= max_mel_tokens:
                warnings.warn(
                    f"WARN: generation stopped due to exceeding `max_mel_tokens` "
                    f"({max_mel_tokens}). Consider reducing "
                    f"`max_text_tokens_per_segment`({max_text_tokens_per_segment}) "
                    f"or increasing `max_mel_tokens`.", RuntimeWarning)
                has_warned = True

            clen = max(int(code_lens_np[0]), 1)
            cb = pick_bucket(clen, eng.mel_len_buckets)
            # pad/slice the codes to the bucket ON DEVICE — generate() already
            # stop-pads past the stop token, so this is a pure shape op and
            # avoids a readback+reupload round-trip through the relay
            if codes.shape[1] >= cb:
                codes_b = codes[:, :cb]
            else:
                codes_b = jnp.pad(codes, ((0, 0), (0, cb - codes.shape[1])),
                                  constant_values=self.stop_mel_token)
            mel_bucket = pick_bucket(int(clen * self.MEL_PER_CODE) + 1,
                                     eng.mel_len_buckets)
            prompt_bucket = spk["prompt_cond"].shape[1]

            if verbose:
                print(f"segment {seg_idx}: text_tokens={tlen}, codes={clen}")

            # [S] synthesis to mel
            m_start = time.perf_counter()
            rng_synth = self._next_rng()
            self._capture_synth(
                cond_latents, emovec, text_ids, [tlen], codes_b, [clen], spk,
                rng_synth, cb, mel_bucket, prompt_bucket)
            s_infer = self._jit_latent(
                self.gpt_params, self.s2mel_params, self.codec_params,
                cond_latents, emovec,
                jnp.asarray(text_ids), jnp.asarray([tlen]),
                codes_b, jnp.asarray([clen]), code_bucket=cb)
            if self.stage_sync:
                # a host readback is the only true sync on relay-attached
                # TPUs (block_until_ready returns before compute drains);
                # costs one RTT, so only when stage timing is requested
                np.asarray(s_infer[0, 0, 0])
            gpt_forward_time += time.perf_counter() - m_start
            m_start = time.perf_counter()
            vc_tgt, target_len = self._jit_synth(
                self.s2mel_params, s_infer, jnp.asarray([clen]),
                spk["prompt_cond"], jnp.asarray([spk["ref_len"]]),
                spk["ref_mel"], spk["style"], rng_synth,
                mel_bucket=mel_bucket, prompt_bucket=prompt_bucket)
            if self.stage_sync:
                np.asarray(vc_tgt[0, 0, 0])
            s2mel_time += time.perf_counter() - m_start

            # [V] vocoder
            m_start = time.perf_counter()
            wav = self._jit_vocoder(self.bigvgan_params, vc_tgt, target_len)
            # target_len == int(float32(clen) * 1.72) — recompute on host to
            # avoid reading the scalar back through the relay
            n_samples = int(np.float32(clen) * np.float32(self.MEL_PER_CODE)) * 256
            wav_np = np.asarray(wav[:, :n_samples], np.float32)
            bigvgan_time += time.perf_counter() - m_start

            wav_np = np.clip(32767 * wav_np, -32767.0, 32767.0)
            if verbose:
                print(f"wav shape: {wav_np.shape}", "min:", wav_np.min(),
                      "max:", wav_np.max())
            wavs.append(wav_np)
            if stream_return:
                yield wav_np
                if silence is None:
                    silence = self.interval_silence(
                        wavs, sampling_rate=self.SAMPLING_RATE,
                        interval_silence=interval_silence)
                yield silence

        end_time = time.perf_counter()
        self._set_gr_progress(0.9, "saving audio...")
        wavs = self.insert_interval_silence(
            wavs, sampling_rate=self.SAMPLING_RATE, interval_silence=interval_silence)
        wav = np.concatenate(wavs, axis=1) if wavs else np.zeros((1, 0), np.float32)
        wav_length = wav.shape[-1] / self.SAMPLING_RATE
        # programmatic stage profile (meaningful when INDEXTTS_STAGE_SYNC=1:
        # the timers then end on a device sync instead of dispatch)
        self.last_stage_times = {
            "gpt": round(gpt_gen_time, 4),
            "gpt_forward": round(gpt_forward_time, 4),
            "s2mel": round(s2mel_time, 4),
            "bigvgan": round(bigvgan_time, 4),
            "total": round(end_time - start_time, 4),
            "audio_s": round(wav_length, 4),
            "stage_sync": self.stage_sync,
        }
        print(f">> gpt_gen_time: {gpt_gen_time:.2f} seconds")
        print(f">> gpt_forward_time: {gpt_forward_time:.2f} seconds")
        print(f">> s2mel_time: {s2mel_time:.2f} seconds")
        print(f">> bigvgan_time: {bigvgan_time:.2f} seconds")
        print(f">> Total inference time: {end_time - start_time:.2f} seconds")
        print(f">> Generated audio length: {wav_length:.2f} seconds")
        if wav_length > 0:
            print(f">> RTF: {(end_time - start_time) / wav_length:.4f}")

        if output_path:
            if os.path.isfile(output_path):
                os.remove(output_path)
                print(">> remove old wav file:", output_path)
            write_wav(output_path, wav.astype(np.int16), self.SAMPLING_RATE)
            print(">> wav file saved to:", output_path)
            if stream_return:
                return
            yield output_path
        else:
            if stream_return:
                return
            yield (self.SAMPLING_RATE, wav.astype(np.int16).T)


def dataclasses_replace_bigvgan(cfg: IndexTTS2Config, bv) -> IndexTTS2Config:
    import dataclasses

    return dataclasses.replace(cfg, bigvgan=bv)


def _load_plain_tensor(path):
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(t, "numpy"):
        return t.detach().float().numpy()
    return np.asarray(t, np.float32)

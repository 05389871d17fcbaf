"""Checkpoint-free parity harness: torch-reference render at tiny scale.

Builds a tiny model directory whose checkpoints are SAVED FROM the torch
reference modules (instantiated via tests/reference_shim.py) so that the TPU
pipeline and the reference share weights, then re-renders each case's audio
through the reference torch stack:

    UnifiedVoice latents -> gpt_layer -> RepCodec vq2emb -> length regulator
    -> CFM Euler (same noise: the pipeline's captured PRNG key) -> BigVGAN

from the synth-boundary capture recorded by `IndexTTS2._capture_synth`.
Everything upstream of that boundary (w2v-bert / campplus / conformer
conditioning) is an input captured identically for both renders; everything
downstream runs twice — once in JAX, once in torch — with converted weights,
so the MCD measured by eval/parity_eval.py --tiny exercises the real parity
surface without real checkpoints (VERDICT r2 item 8).

Reference call recipes follow the golden-parity tests
(tests/test_parity_gpt.py / test_parity_s2mel.py / test_parity_vocoder.py);
reference behavior: /root/reference/indextts/infer_v2.py:628-668 and
s2mel/modules/flow_matching.py:57-120.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

MEL_PER_CODE = 1.72
SR = 22050


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def shim_config():
    """tiny e2e config, but with the reference's hardcoded 1024-d
    conditioning input (model_v2.py:353,367) so every module can be
    instantiated in torch and converted."""
    from indextts_tpu.config import W2VBertConfig
    from tests.test_pipeline_e2e import tiny_config

    cfg = tiny_config()
    # the 1024-d semantic feature chain is hardcoded in the reference
    # (w2v-bert hidden -> codec hidden -> gpt_layer out -> regulator in)
    cfg = dataclasses.replace(
        cfg,
        gpt=dataclasses.replace(cfg.gpt, cond_input_dim=1024),
        w2v_bert=W2VBertConfig(hidden_size=1024, num_hidden_layers=2,
                               num_attention_heads=4, intermediate_size=64,
                               output_hidden_layer=1),
        semantic_codec=dataclasses.replace(cfg.semantic_codec,
                                           hidden_size=1024),
        s2mel=dataclasses.replace(
            cfg.s2mel, gpt_proj_dims=(32, 1024),
            length_regulator=dataclasses.replace(
                cfg.s2mel.length_regulator, in_channels=1024)),
    )
    return cfg


def build_assets(d: str) -> None:
    """bpe.model + prompt.wav (same recipe as the e2e test fixture)."""
    from indextts_tpu.text.spm import build_model_file
    from indextts_tpu.utils.wav_io import write_wav

    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    vocab = []
    for w in ["▁HELLO", "▁WORLD", "▁THE", "▁CAT", "▁DOG", "▁RUNS", "▁."]:
        vocab += [w[:i] for i in range(2, len(w) + 1)]
    vocab += ["▁", ".", "▁,", "E", "L", "O", "S"]
    seen, score = set(), -1.0
    for w in vocab:
        if w not in seen:
            seen.add(w)
            pieces.append((w, score, 1))
            score -= 1.0
    build_model_file(pieces, os.path.join(d, "bpe.model"))
    t = np.arange(int(1.0 * 16000)) / 16000
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)
           * (1 + 0.2 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    write_wav(os.path.join(d, "prompt.wav"), wav, 16000)


def make_cases(path: str, n: int = 3) -> None:
    """Up to n single-segment cases; texts from examples/cases.jsonl when its
    tokens exist in the tiny vocab, else built-ins."""
    texts = ["hello world .", "the cat runs .", "the dog . hello ."]
    with open(path, "w", encoding="utf-8") as f:
        for t in texts[:n]:
            f.write(json.dumps({"prompt_audio": "prompt.wav", "text": t,
                                "emo_mode": 0}) + "\n")


def build_checkpoints(d: str, cfg):
    """Instantiate the torch reference modules at shim scale, save their
    state dicts as the checkpoint files IndexTTS2 loads, and return the live
    modules for the reference render."""
    import reference_shim

    reference_shim.install()
    import torch

    torch.manual_seed(0)

    from indextts.gpt.model_v2 import UnifiedVoice
    from indextts.s2mel.modules.flow_matching import CFM
    from indextts.s2mel.modules.length_regulator import InterpolateRegulator
    from indextts.s2mel.modules.bigvgan.bigvgan import BigVGAN
    from indextts.s2mel.modules.campplus.DTDNN import CAMPPlus
    from indextts.utils.maskgct.models.codec.kmeans.repcodec_model import \
        RepCodec

    g = cfg.gpt
    cm = dict(output_size=g.condition_module.output_size,
              linear_units=g.condition_module.linear_units,
              attention_heads=g.condition_module.attention_heads,
              num_blocks=g.condition_module.num_blocks,
              input_layer=g.condition_module.input_layer,
              perceiver_mult=g.condition_module.perceiver_mult)
    uv = UnifiedVoice(
        layers=g.layers, model_dim=g.model_dim, heads=g.heads,
        max_text_tokens=g.max_text_tokens, max_mel_tokens=g.max_mel_tokens,
        number_text_tokens=g.number_text_tokens,
        number_mel_codes=g.number_mel_codes,
        start_mel_token=g.start_mel_token, stop_mel_token=g.stop_mel_token,
        checkpointing=False, condition_type="conformer_perceiver",
        condition_module=cm, emo_condition_module=dict(cm)).eval()
    torch.save(uv.state_dict(), os.path.join(d, "gpt.pth"))

    s2 = cfg.s2mel
    c = s2.DiT
    args = _NS(
        dit_type="DiT", reg_loss_type="l1",
        DiT=_NS(time_as_token=False, style_as_token=False,
                uvit_skip_connection=False, depth=c.depth,
                num_heads=c.num_heads, hidden_dim=c.hidden_dim,
                in_channels=c.in_channels, content_type="discrete",
                content_codebook_size=c.content_codebook_size,
                content_dim=c.content_dim, is_causal=False,
                final_layer_type="wavenet", class_dropout_prob=0.1,
                style_condition=True, long_skip_connection=True),
        wavenet=_NS(hidden_dim=s2.wavenet.hidden_dim,
                    kernel_size=s2.wavenet.kernel_size,
                    dilation_rate=s2.wavenet.dilation_rate,
                    num_layers=s2.wavenet.num_layers, p_dropout=0.0,
                    style_condition=True),
        style_encoder=_NS(dim=s2.style_encoder.dim),
    )
    cfm = CFM(args).eval()
    cfm.estimator.setup_caches(max_batch_size=8, max_seq_length=1024)
    lr = s2.length_regulator
    reg = InterpolateRegulator(channels=lr.channels,
                               sampling_ratios=lr.sampling_ratios,
                               is_discrete=lr.is_discrete,
                               in_channels=lr.in_channels,
                               codebook_size=lr.content_codebook_size).eval()
    dims = (s2.gpt_dim,) + tuple(s2.gpt_proj_dims)
    gpt_layer = torch.nn.Sequential(*[
        torch.nn.Linear(dims[i], dims[i + 1])
        for i in range(len(dims) - 1)]).eval()
    s2_sd = {}
    for k, v in cfm.estimator.state_dict().items():
        s2_sd["cfm.estimator." + k] = v
    for k, v in reg.state_dict().items():
        s2_sd["length_regulator." + k] = v
    for k, v in gpt_layer.state_dict().items():
        s2_sd["gpt_layer." + k] = v
    torch.save(s2_sd, os.path.join(d, "s2mel.pth"))

    sc = cfg.semantic_codec
    codec = RepCodec(codebook_size=sc.codebook_size, hidden_size=sc.hidden_size,
                     codebook_dim=sc.codebook_dim, vocos_dim=sc.vocos_dim,
                     vocos_intermediate_dim=sc.vocos_intermediate_dim,
                     vocos_num_layers=sc.vocos_num_layers,
                     num_quantizers=1, downsample_scale=1).eval()
    os.makedirs(os.path.join(d, "hf_cache"), exist_ok=True)
    try:
        from safetensors.torch import save_file

        save_file({k: v.contiguous() for k, v in codec.state_dict().items()},
                  os.path.join(d, "hf_cache", "semantic_codec_model.safetensors"))
    except ImportError:  # fall back to .pth via the aux-path override
        torch.save(codec.state_dict(),
                   os.path.join(d, "hf_cache", "semantic_codec_model.safetensors"))

    camp = CAMPPlus(feat_dim=80, embedding_size=192).eval()
    torch.save(camp.state_dict(),
               os.path.join(d, "hf_cache", "campplus_cn_common.bin"))

    from indextts.s2mel.modules.bigvgan.env import AttrDict

    h = cfg.bigvgan
    bv_dir = os.path.join(d, "hf_cache", "bigvgan")
    os.makedirs(bv_dir, exist_ok=True)
    with open(os.path.join(bv_dir, "config.json"), "w", encoding="utf-8") as f:
        json.dump(dataclasses.asdict(h), f)
    bv_cfg = AttrDict({
        "num_mels": h.num_mels, "upsample_rates": list(h.upsample_rates),
        "upsample_kernel_sizes": list(h.upsample_kernel_sizes),
        "upsample_initial_channel": h.upsample_initial_channel,
        "resblock": "1",
        "resblock_kernel_sizes": list(h.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(x) for x in h.resblock_dilation_sizes],
        "activation": h.activation, "snake_logscale": h.snake_logscale,
        "use_tanh_at_final": h.use_tanh_at_final,
        "use_bias_at_final": h.use_bias_at_final,
    })
    bv = BigVGAN(bv_cfg, use_cuda_kernel=False).eval()
    # flat state dict: load_torch_state_dict keeps only tensor values, so a
    # {"generator": sd} wrapper would be silently dropped
    torch.save(bv.state_dict(), os.path.join(bv_dir, "bigvgan_generator.pt"))

    return {"uv": uv, "cfm": cfm, "reg": reg, "gpt_layer": gpt_layer,
            "codec": codec, "bigvgan": bv,
            "codebook_size": sc.codebook_size}


def render_reference(mods, cap: dict, out_path: str) -> None:
    """Torch re-render of one captured synth call (B segments) -> wav file.

    Mirrors `infer_v2.synth_program` + vocoder with the reference modules;
    the CFM integrates the SAME noise (captured PRNG key)."""
    import jax
    import jax.numpy as jnp
    import torch

    from indextts_tpu.utils.wav_io import write_wav

    B = cap["codes"].shape[0]
    cb, mb, pb = cap["code_bucket"], cap["mel_bucket"], cap["prompt_bucket"]
    rl = cap["ref_len"]
    t = lambda a: torch.tensor(np.asarray(a))

    with torch.no_grad():
        cond_lat = t(np.broadcast_to(
            cap["cond_latents"], (B,) + cap["cond_latents"].shape[1:]).copy())
        emovec = t(np.broadcast_to(
            cap["emovec"], (B,) + cap["emovec"].shape[1:]).copy())
        dummy_spk = torch.zeros(B, 1024, 8)
        dummy_lens = torch.full((B,), 8, dtype=torch.long)
        lat = mods["uv"](
            cond_lat, t(cap["text_ids"]).long(), t(cap["text_lens"]).long(),
            t(cap["codes"]).long(), t(cap["code_lens"]).long(), dummy_spk,
            cond_mel_lengths=dummy_lens, emo_cond_mel_lengths=dummy_lens,
            emo_vec=emovec, use_speed=torch.zeros(B).long())
        lat = lat[:, :cb]
        lat = mods["gpt_layer"](lat)                       # (B, cb, C)
        # the JAX embedding clamps out-of-range ids (start/stop tokens in
        # the padded tail); torch F.embedding raises — clamp identically
        codes_c = np.clip(cap["codes"][:, :cb], 0, mods["codebook_size"] - 1)
        emb = mods["codec"].quantizer.vq2emb(
            t(codes_c).long().unsqueeze(1))                 # (B, C, cb)
        s_infer = emb.transpose(1, 2) + lat
        target_len = (cap["code_lens"].astype(np.float32)
                      * np.float32(MEL_PER_CODE)).astype(np.int32)
        cond = mods["reg"](s_infer, ylens=t(target_len).long())[0]
        cond = cond.numpy()                                 # (B, max(tl), C)

        total = pb + mb
        C = cond.shape[-1]
        cat = np.zeros((B, total, C), np.float32)
        cat[:, :pb] = np.broadcast_to(cap["prompt_cond"][:, :pb],
                                      (B, pb, C))
        for b in range(B):
            n = min(int(target_len[b]), mb, cond.shape[1])
            cat[b, rl:rl + n] = cond[b, :n]
        x_lens = t((rl + target_len).astype(np.int64))

        prompt = np.broadcast_to(cap["ref_mel"][:, :rl],
                                 (B, rl) + cap["ref_mel"].shape[2:])
        prompt_t = t(prompt.copy()).transpose(1, 2)         # (B, 80, rl)
        n_mels = cap["ref_mel"].shape[-1]
        z = jax.random.normal(cap["rng"], (B, total, n_mels),
                              dtype=jnp.float32)
        z_t = t(np.asarray(z).transpose(0, 2, 1)).clone()   # (B, 80, total)
        t_span = torch.linspace(0, 1, 26)
        vc = mods["cfm"].solve_euler(z_t, x_lens, prompt_t, t(cat),
                                     t(np.broadcast_to(
                                         cap["style"],
                                         (B,) + cap["style"].shape[1:]).copy()),
                                     None, t_span, inference_cfg_rate=0.7)
        vc_tgt = vc[..., rl:rl + mb].clone()                # (B, 80, mb)
        for b in range(B):
            # the pipeline's vocoder masks mel by target_len; match it so
            # boundary samples see the same (zero) tail context
            vc_tgt[b, :, int(target_len[b]):] = 0
        wav = mods["bigvgan"](vc_tgt)[:, 0].numpy()          # (B, samples)

    rows = []
    for b in range(B):
        n = int(np.float32(cap["code_lens"][b]) * np.float32(MEL_PER_CODE)) * 256
        rows.append(wav[b, :n])
    out = np.concatenate(rows)
    out = np.round(np.clip(out * 32767.0, -32767.0, 32767.0)).astype(np.int16)
    write_wav(out_path, out[None, :], SR)

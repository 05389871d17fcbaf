"""Dump full-scale checkpoint key/shape manifests from the reference modules.

Instantiates every reference torch module family at the SHIPPED architecture
scale (the defaults in `indextts_tpu/config.py`, which mirror the released
`config.yaml`) and records each family's state-dict key -> shape map, plus
the on-disk wrapping (`gpt.pth` stores the raw module state dict; `s2mel.pth`
stores `{"net": {module: state_dict}}`, `s2mel/modules/commons.py:589-592`;
`bigvgan_generator.pt` stores `{"generator": state_dict}`, `bigvgan.py:407`).

No weights are needed — modules are built on torch's meta device where
possible (CPU init as fallback). The output fixture pins the conversion
surface before real checkpoints ever arrive:
`tests/test_convert_manifest.py` fails on any converter/key drift.

Run: python tools/dump_ref_manifests.py   (writes tests/fixtures/ckpt_manifests.json)
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import reference_shim

reference_shim.install()

import torch  # noqa: E402

from indextts_tpu.config import IndexTTS2Config  # noqa: E402

CFG = IndexTTS2Config()


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _shapes(m: torch.nn.Module):
    return {k: list(v.shape) for k, v in m.state_dict().items()}


def _build(fn):
    """Meta-device init (no memory); CPU fallback for modules whose init
    does real tensor math."""
    try:
        with torch.device("meta"):
            return fn()
    except Exception as e:  # noqa: BLE001
        print(f"  meta init failed ({type(e).__name__}: {e}); CPU init",
              file=sys.stderr)
        return fn()


def build_gpt():
    from indextts.gpt.model_v2 import UnifiedVoice

    g = CFG.gpt

    def cm(c):
        return dict(output_size=c.output_size, linear_units=c.linear_units,
                    attention_heads=c.attention_heads, num_blocks=c.num_blocks,
                    input_layer=c.input_layer, perceiver_mult=c.perceiver_mult)

    return UnifiedVoice(
        layers=g.layers, model_dim=g.model_dim, heads=g.heads,
        max_text_tokens=g.max_text_tokens, max_mel_tokens=g.max_mel_tokens,
        max_conditioning_inputs=g.max_conditioning_inputs,
        mel_length_compression=g.mel_length_compression,
        number_text_tokens=g.number_text_tokens,
        start_text_token=g.start_text_token, stop_text_token=g.stop_text_token,
        number_mel_codes=g.number_mel_codes, start_mel_token=g.start_mel_token,
        stop_mel_token=g.stop_mel_token, types=g.types,
        condition_num_latent=g.condition_num_latent,
        condition_type=g.condition_type, checkpointing=False,
        condition_module=cm(g.condition_module),
        emo_condition_module=cm(g.emo_condition_module))


def build_s2mel():
    from indextts.s2mel.modules.commons import MyModel

    s2 = CFG.s2mel
    c, w, lr = s2.DiT, s2.wavenet, s2.length_regulator
    args = _NS(
        dit_type="DiT", reg_loss_type=s2.reg_loss_type,
        DiT=_NS(time_as_token=c.time_as_token, style_as_token=c.style_as_token,
                uvit_skip_connection=c.uvit_skip_connection, depth=c.depth,
                num_heads=c.num_heads, hidden_dim=c.hidden_dim,
                in_channels=c.in_channels, content_type=c.content_type,
                content_codebook_size=c.content_codebook_size,
                content_dim=c.content_dim, is_causal=c.is_causal,
                final_layer_type=c.final_layer_type,
                class_dropout_prob=c.class_dropout_prob,
                style_condition=c.style_condition,
                long_skip_connection=c.long_skip_connection,
                zero_prompt_speech_token=c.zero_prompt_speech_token,
                target=c.target),
        wavenet=_NS(hidden_dim=w.hidden_dim, kernel_size=w.kernel_size,
                    dilation_rate=w.dilation_rate, num_layers=w.num_layers,
                    p_dropout=w.p_dropout, style_condition=w.style_condition),
        style_encoder=_NS(dim=s2.style_encoder.dim),
        length_regulator=_NS(channels=lr.channels,
                             sampling_ratios=list(lr.sampling_ratios),
                             is_discrete=lr.is_discrete,
                             in_channels=lr.in_channels,
                             content_codebook_size=lr.content_codebook_size,
                             vector_quantize=lr.vector_quantize),
    )
    return MyModel(args, use_gpt_latent=True)


def build_semantic_codec():
    from indextts.utils.maskgct.models.codec.kmeans.repcodec_model import \
        RepCodec

    c = CFG.semantic_codec
    return RepCodec(codebook_size=c.codebook_size, hidden_size=c.hidden_size,
                    codebook_dim=c.codebook_dim, vocos_dim=c.vocos_dim,
                    vocos_intermediate_dim=c.vocos_intermediate_dim,
                    vocos_num_layers=c.vocos_num_layers,
                    num_quantizers=c.num_quantizers,
                    downsample_scale=c.downsample_scale)


def build_campplus():
    from indextts.s2mel.modules.campplus.DTDNN import CAMPPlus

    return CAMPPlus(feat_dim=80, embedding_size=192)


def build_bigvgan():
    from indextts.s2mel.modules.bigvgan.bigvgan import BigVGAN
    from indextts.s2mel.modules.bigvgan.env import AttrDict

    h = CFG.bigvgan
    cfg = AttrDict({
        "num_mels": h.num_mels, "upsample_rates": list(h.upsample_rates),
        "upsample_kernel_sizes": list(h.upsample_kernel_sizes),
        "upsample_initial_channel": h.upsample_initial_channel,
        "resblock": h.resblock,
        "resblock_kernel_sizes": list(h.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(d) for d in h.resblock_dilation_sizes],
        "activation": h.activation, "snake_logscale": h.snake_logscale,
        "use_tanh_at_final": h.use_tanh_at_final,
        "use_bias_at_final": h.use_bias_at_final,
    })
    return BigVGAN(cfg, use_cuda_kernel=False)


def build_w2vbert():
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    c = CFG.w2v_bert
    hf = Wav2Vec2BertConfig(
        hidden_size=c.hidden_size, num_hidden_layers=c.num_hidden_layers,
        num_attention_heads=c.num_attention_heads,
        intermediate_size=c.intermediate_size,
        feature_projection_input_dim=c.feature_projection_input_dim,
        position_embeddings_type=c.position_embeddings_type,
        left_max_position_embeddings=c.left_max_position_embeddings,
        right_max_position_embeddings=c.right_max_position_embeddings,
        conv_depthwise_kernel_size=c.conv_depthwise_kernel_size)
    return Wav2Vec2BertModel(hf)


def main():
    out = {}

    print("gpt (UnifiedVoice v2, full scale)", file=sys.stderr)
    # gpt.pth: raw state dict (or {'model': sd}); utils/checkpoint.py:22-25
    out["gpt"] = {"wrapper": None, "keys": _shapes(_build(build_gpt))}

    print("s2mel (MyModel)", file=sys.stderr)
    m = _build(build_s2mel)
    # s2mel.pth: {'net': {module_key: state_dict}} (commons.py:589-592);
    # flattened here as '<module>.<param>' (the loader flattens identically)
    out["s2mel"] = {
        "wrapper": "net",
        "keys": {f"{mod}.{k}": list(v.shape)
                 for mod in m.models
                 for k, v in m.models[mod].state_dict().items()},
    }

    print("semantic_codec (RepCodec)", file=sys.stderr)
    out["semantic_codec"] = {"wrapper": None,
                             "keys": _shapes(_build(build_semantic_codec))}

    print("campplus", file=sys.stderr)
    out["campplus"] = {"wrapper": None, "keys": _shapes(_build(build_campplus))}

    print("bigvgan (v2 generator)", file=sys.stderr)
    # bigvgan_generator.pt: {'generator': state_dict} (bigvgan.py:407),
    # weight-norm NOT folded on disk (from_pretrained folds after load)
    out["bigvgan"] = {"wrapper": "generator",
                      "keys": _shapes(_build(build_bigvgan))}

    print("w2vbert (w2v-bert-2.0)", file=sys.stderr)
    out["w2vbert"] = {"wrapper": None, "keys": _shapes(_build(build_w2vbert))}

    dst = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "ckpt_manifests.json")
    dst = os.path.abspath(dst)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    for fam, d in out.items():
        n = len(d["keys"])
        sz = sum(int(np.prod(s)) if s else 1 for s in d["keys"].values())
        print(f"{fam}: {n} keys, {sz / 1e6:.1f} M params", file=sys.stderr)
    print(f"wrote {dst}", file=sys.stderr)


if __name__ == "__main__":
    import numpy as np

    main()

"""Golden-parity: JAX w2v-bert encoder vs installed HF Wav2Vec2BertModel."""

import numpy as np
import torch

import jax.numpy as jnp

from indextts_tpu.config import W2VBertConfig
from indextts_tpu.models.codec.w2vbert import w2vbert_forward
from indextts_tpu.utils import convert

torch.manual_seed(0)


def _tiny():
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    hf_cfg = Wav2Vec2BertConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=48, feature_projection_input_dim=20,
        left_max_position_embeddings=8, right_max_position_embeddings=4,
        conv_depthwise_kernel_size=7, position_embeddings_type="relative_key",
        mask_time_prob=0.0, mask_feature_prob=0.0)
    model = Wav2Vec2BertModel(hf_cfg).eval()
    cfg = W2VBertConfig(hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
                        intermediate_size=48, feature_projection_input_dim=20,
                        left_max_position_embeddings=8, right_max_position_embeddings=4,
                        conv_depthwise_kernel_size=7, output_hidden_layer=2)
    return model, cfg


def test_w2vbert_hidden_state_parity():
    model, cfg = _tiny()
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    params = convert.convert_w2vbert(sd, cfg)

    rng = np.random.default_rng(0)
    B, T = 2, 25
    feats = rng.standard_normal((B, T, 20)).astype(np.float32)
    attn = np.ones((B, T), np.int64)
    attn[1, 18:] = 0

    with torch.no_grad():
        out = model(input_features=torch.tensor(feats),
                    attention_mask=torch.tensor(attn),
                    output_hidden_states=True)
    ref_h = out.hidden_states[cfg.output_hidden_layer].numpy()

    lens = attn.sum(axis=1)
    mine = np.asarray(w2vbert_forward(params, cfg, jnp.asarray(feats),
                                      jnp.asarray(lens)))
    m = attn.astype(bool)
    np.testing.assert_allclose(mine[m], ref_h[m], atol=5e-4, rtol=1e-2)


def test_w2vbert_last_layer_parity():
    model, cfg = _tiny()
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    params = convert.convert_w2vbert(sd, cfg)

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 17, 20)).astype(np.float32)
    with torch.no_grad():
        out = model(input_features=torch.tensor(feats), output_hidden_states=True)
    ref_h = out.hidden_states[3].numpy()
    mine = np.asarray(w2vbert_forward(params, cfg, jnp.asarray(feats),
                                      output_layer=3))
    np.testing.assert_allclose(mine, ref_h, atol=5e-4, rtol=1e-2)

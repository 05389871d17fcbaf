"""s2mel container: CFM estimator + length regulator + GPT-latent projection.

Behavioral reference: `MyModel` (`s2mel/modules/commons.py:390-449`) —
models = {cfm, length_regulator, gpt_layer: Linear(1280->256->128->1024)}.
"""

from __future__ import annotations

import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.config import S2MelConfig
from indextts_tpu.models.s2mel.dit import init_dit
from indextts_tpu.models.s2mel.length_regulator import init_length_regulator
from indextts_tpu.nn import InitRng, Params


def init_s2mel(rng: InitRng, cfg: S2MelConfig, use_gpt_latent: bool = True) -> Params:
    p: Params = {
        "cfm": init_dit(rng, cfg),
        "length_regulator": init_length_regulator(rng, cfg.length_regulator),
    }
    if use_gpt_latent:
        dims = (cfg.gpt_dim,) + tuple(cfg.gpt_proj_dims)
        p["gpt_layer"] = [nn.dense_init(rng, dims[i], dims[i + 1])
                          for i in range(len(dims) - 1)]
    return p


def gpt_layer_forward(p: Params, latent: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 1280) GPT latents -> (B, T, 1024) codec-space features."""
    x = latent
    for lp in p["gpt_layer"]:
        x = nn.dense(lp, x)
    return x

"""Distributed training step (new capability; the reference's training code is
vestigial — SURVEY.md §2.11).

One jitted SPMD program over a (dp, tp) mesh:
- GPT (UnifiedVoice) teacher-forced CE on text and mel streams
  (the v1 training objective, reference `gpt/model.py:526-594`)
- CFM (OT flow matching) loss on the s2mel DiT
  (reference `flow_matching.py:116-159`)
- optax adamw update

Batch rows shard over ``dp``; GPT attention heads / MLP hidden shard over
``tp`` (Megatron-style column/row parallel via GSPMD annotations — XLA
inserts the psum/all-gathers over ICI).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from indextts_tpu.config import GPTConfig, S2MelConfig
from indextts_tpu.models.gpt import unified_voice as uv
from indextts_tpu.models.s2mel.cfm import cfm_loss
from indextts_tpu.parallel.mesh import (batch_sharding, gpt_param_shardings,
                                        replicated)


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return jnp.sum(nll * mask) / denom


def gpt_loss(params, cfg: GPTConfig, batch: Dict) -> jnp.ndarray:
    """Teacher-forced text+mel CE, weighted like the reference trainer
    (text_weight 0.01 / mel_weight 1.0 in tortoise-family trainers)."""
    cond_latents = uv.get_conditioning(params, cfg, batch["cond_emb"],
                                       batch["cond_lens"])
    emo_vec = uv.get_emovec(params, cfg, batch["emo_emb"], batch["emo_lens"])
    text_logits, mel_logits, tgt = uv.forward_logits(
        params, cfg, cond_latents, emo_vec, batch["text_ids"],
        batch["text_lens"], batch["mel_codes"], batch["mel_lens"])
    t_mask = jnp.ones(tgt["text_targets"].shape, jnp.float32)
    m_mask = jnp.ones(tgt["mel_targets"].shape, jnp.float32)
    loss_text = cross_entropy(text_logits, tgt["text_targets"], t_mask)
    loss_mel = cross_entropy(mel_logits, tgt["mel_targets"], m_mask)
    return 0.01 * loss_text + loss_mel


def make_train_state(params, lr: float = 1e-4):
    tx = optax.adamw(lr, weight_decay=0.01)
    return tx, tx.init(params)


def make_train_step(mesh: Mesh, gpt_cfg: GPTConfig, s2_cfg: S2MelConfig,
                    tx: optax.GradientTransformation):
    """Build the jitted SPMD train step over both model families."""

    def loss_fn(trainable, batch, rng):
        l_gpt = gpt_loss(trainable["gpt"], gpt_cfg, batch)
        l_cfm = cfm_loss(trainable["s2mel"]["cfm"], s2_cfg, batch["mel_target"],
                         batch["mel_frames"], batch["prompt_frames"],
                         batch["cfm_cond"], batch["style"], rng)
        return l_gpt + l_cfm, {"gpt": l_gpt, "cfm": l_cfm}

    def train_step(trainable, opt_state, batch, rng):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss, parts

    # sharding layout: batch over dp, GPT tensor weights over tp
    def param_shardings(trainable):
        gpt_sh = gpt_param_shardings(mesh, trainable["gpt"])
        s2_sh = jax.tree_util.tree_map(lambda _: replicated(mesh),
                                       trainable["s2mel"])
        return {"gpt": gpt_sh, "s2mel": s2_sh}

    def batch_shardings(batch):
        return jax.tree_util.tree_map(lambda _: batch_sharding(mesh), batch)

    return train_step, param_shardings, batch_shardings


def jit_train_step(mesh, train_step, trainable, opt_state, batch,
                   param_sh, batch_sh):
    """jit with explicit in/out shardings (GSPMD does the rest)."""
    opt_sh = jax.tree_util.tree_map(
        lambda _: replicated(mesh), opt_state,
        is_leaf=lambda x: hasattr(x, "shape") or x is None)
    rng_sh = replicated(mesh)
    step = jax.jit(
        train_step,
        in_shardings=(param_sh, None, batch_sh, rng_sh),
        out_shardings=(param_sh, None, replicated(mesh),
                       {"gpt": replicated(mesh), "cfm": replicated(mesh)}),
        donate_argnums=(0, 1),
    )
    return step

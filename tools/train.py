"""Distributed training loop driver with checkpoint/resume.

    python tools/train.py --steps 1000 --dp 4 --tp 2 \
        --ckpt-dir runs/exp0 --save-every 100 [--resume]

New capability vs the reference (its training code is vestigial, SURVEY §2.11):
one jitted SPMD step over a (dp, tp) mesh (`parallel/train.py` — GPT CE +
CFM flow-matching loss, optax adamw), with the full train state (params,
optimizer state, step) checkpointed so runs survive preemption. Data comes
from a synthetic generator by default (smoke/bringup) or an npz batch
directory via --data-dir; each file holds one batch with the train-step's
input keys.

Checkpoint layout: <ckpt-dir>/state-<step>/ npz trees + a STEP marker file.
Resume picks the newest state dir. Determinism: the per-step rng is
`fold_in(base_key, step)`, so save/resume at any step reproduces the exact
same trajectory as an uninterrupted run (tested in tests/test_train_loop.py).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np


def synthetic_batch(step: int, B: int, gpt_cfg, s2_cfg):
    import jax.numpy as jnp

    r = np.random.default_rng(1234 + step)
    T_cond, Lt, Lm = 16, 8, 12
    T_mel = 24
    cd = gpt_cfg.cond_input_dim
    return {
        "cond_emb": jnp.asarray(r.standard_normal((B, T_cond, cd)), jnp.float32),
        "cond_lens": jnp.full((B,), T_cond, jnp.int32),
        "emo_emb": jnp.asarray(r.standard_normal((B, T_cond, cd)), jnp.float32),
        "emo_lens": jnp.full((B,), T_cond, jnp.int32),
        "text_ids": jnp.asarray(
            r.integers(2, gpt_cfg.number_text_tokens, (B, Lt)), jnp.int32),
        "text_lens": jnp.full((B,), Lt, jnp.int32),
        "mel_codes": jnp.asarray(
            r.integers(0, gpt_cfg.start_mel_token, (B, Lm)), jnp.int32),
        "mel_lens": jnp.full((B,), Lm, jnp.int32),
        "mel_target": jnp.asarray(
            r.standard_normal((B, T_mel, s2_cfg.DiT.in_channels)), jnp.float32),
        "mel_frames": jnp.full((B,), T_mel, jnp.int32),
        "prompt_frames": jnp.full((B,), 6, jnp.int32),
        "cfm_cond": jnp.asarray(
            r.standard_normal((B, T_mel, s2_cfg.length_regulator.channels)),
            jnp.float32),
        "style": jnp.asarray(
            r.standard_normal((B, s2_cfg.style_encoder.dim)), jnp.float32),
    }


def npz_batch(path: str):
    import jax.numpy as jnp

    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}


def latest_state_dir(ckpt_dir: str):
    dirs = sorted(glob.glob(os.path.join(ckpt_dir, "state-*")),
                  key=lambda p: int(p.rsplit("-", 1)[1]))
    return dirs[-1] if dirs else None


def save_state(ckpt_dir: str, step: int, trainable, opt_state):
    import jax

    from indextts_tpu.utils.checkpoint import save_params_npz

    d = os.path.join(ckpt_dir, f"state-{step}")
    os.makedirs(d, exist_ok=True)
    host = jax.tree_util.tree_map(np.asarray, trainable)
    save_params_npz(os.path.join(d, "params.npz"), host)
    opt_host = jax.tree_util.tree_map(np.asarray, opt_state)
    save_params_npz(os.path.join(d, "opt_state.npz"), opt_host)
    with open(os.path.join(d, "STEP"), "w", encoding="utf-8") as f:
        f.write(str(step))
    return d


def load_state(state_dir: str, trainable, opt_state):
    from indextts_tpu.utils.checkpoint import load_params_npz

    trainable = load_params_npz(os.path.join(state_dir, "params.npz"),
                                trainable)
    opt_state = load_params_npz(os.path.join(state_dir, "opt_state.npz"),
                                opt_state)
    with open(os.path.join(state_dir, "STEP"), encoding="utf-8") as f:
        step = int(f.read().strip())
    return trainable, opt_state, step


def run(args, gpt_cfg=None, s2_cfg=None):
    import jax
    import jax.numpy as jnp

    from indextts_tpu.config import (ConditionModuleConfig, DiTConfig,
                                     GPTConfig, LengthRegulatorConfig,
                                     S2MelConfig, StyleEncoderConfig,
                                     WaveNetConfig)
    from indextts_tpu.models.gpt import unified_voice as uv
    from indextts_tpu.models.s2mel.dit import init_dit
    from indextts_tpu.nn import InitRng
    from indextts_tpu.parallel.mesh import make_mesh, shard_tree
    from indextts_tpu.parallel.train import (jit_train_step, make_train_state,
                                             make_train_step)

    if gpt_cfg is None:
        # bringup-scale config; pass full GPTConfig() for the real model
        gpt_cfg = GPTConfig(
            layers=2, model_dim=64, heads=4, max_text_tokens=32,
            max_mel_tokens=64, number_text_tokens=40, number_mel_codes=50,
            start_mel_token=48, stop_mel_token=49, cond_input_dim=32,
            condition_module=ConditionModuleConfig(
                output_size=32, linear_units=48, attention_heads=2,
                num_blocks=1, input_layer="linear", perceiver_mult=2),
            emo_condition_module=ConditionModuleConfig(
                output_size=32, linear_units=48, attention_heads=2,
                num_blocks=1, input_layer="linear", perceiver_mult=2))
    if s2_cfg is None:
        s2_cfg = S2MelConfig(
            DiT=DiTConfig(hidden_dim=32, num_heads=2, depth=1, in_channels=8,
                          content_dim=16, final_layer_type="wavenet"),
            wavenet=WaveNetConfig(hidden_dim=32, num_layers=2, kernel_size=5),
            style_encoder=StyleEncoderConfig(dim=12),
            length_regulator=LengthRegulatorConfig(channels=16, in_channels=16))

    mesh = make_mesh(args.dp * args.tp, tp=args.tp)
    trainable = {
        "gpt": uv.init_unified_voice(InitRng(args.seed), gpt_cfg),
        "s2mel": {"cfm": init_dit(InitRng(args.seed), s2_cfg)},
    }
    tx, _ = make_train_state(trainable)
    train_step, param_sh_fn, batch_sh_fn = make_train_step(mesh, gpt_cfg,
                                                           s2_cfg, tx)
    param_sh = param_sh_fn(trainable)
    trainable = shard_tree(mesh, trainable, param_sh)
    opt_state = tx.init(trainable)

    start_step = 0
    if args.resume:
        sd = latest_state_dir(args.ckpt_dir)
        if sd is not None:
            trainable, opt_state, start_step = load_state(sd, trainable,
                                                          opt_state)
            trainable = shard_tree(mesh, trainable, param_sh)
            print(f">> resumed from {sd} (step {start_step})")

    base_key = jax.random.PRNGKey(args.seed)
    data_files = (sorted(glob.glob(os.path.join(args.data_dir, "*.npz")))
                  if args.data_dir else None)

    step_fn = None
    losses = []
    t0 = time.perf_counter()
    for step in range(start_step, args.steps):
        if data_files:
            batch = npz_batch(data_files[step % len(data_files)])
        else:
            batch = synthetic_batch(step, args.batch, gpt_cfg, s2_cfg)
        batch_sh = batch_sh_fn(batch)
        batch = shard_tree(mesh, batch, batch_sh)
        if step_fn is None:
            step_fn = jit_train_step(mesh, train_step, trainable, opt_state,
                                     batch, param_sh, batch_sh)
        key = jax.random.fold_in(base_key, step)
        trainable, opt_state, loss, parts = step_fn(trainable, opt_state,
                                                    batch, key)
        if (step + 1) % args.log_every == 0:
            lf = float(loss)
            losses.append(lf)
            dt = time.perf_counter() - t0
            print(f"step {step + 1}: loss={lf:.4f} "
                  f"gpt={float(parts['gpt']):.4f} "
                  f"cfm={float(parts['cfm']):.4f} ({dt:.1f}s)", flush=True)
        if args.ckpt_dir and (step + 1) % args.save_every == 0:
            d = save_state(args.ckpt_dir, step + 1, trainable, opt_state)
            print(f">> saved {d}", flush=True)
    if args.ckpt_dir:
        save_state(args.ckpt_dir, args.steps, trainable, opt_state)
    return trainable, opt_state, losses


def main(argv=None):
    ap = argparse.ArgumentParser(description="IndexTTS-TPU training loop")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--save-every", type=int, default=100)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--data-dir", default=None,
                    help="Directory of .npz batches (default: synthetic)")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)
    run(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())

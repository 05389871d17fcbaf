"""Full-scale int8-vs-bf16 GPT quality A/B on device (VERDICT r2 item 6).

Same prefix, same rng: greedy decode with int8 weights vs bf16 weights at
the shipped 24x1280 scale, reporting token agreement over the first
divergence-free span and teacher-forced mel-logit cosine. Results recorded
in docs/KERNELS.md.

Run from /root/repo: timeout 3000 python tools/quant_ab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu.config import GPTConfig
    from indextts_tpu.engine import decode as dec
    from indextts_tpu.engine.decode import SamplingConfig
    from indextts_tpu.models.gpt import gpt2
    from indextts_tpu.models.gpt.unified_voice import (forward_logits,
                                                       init_unified_voice)
    from indextts_tpu.nn import InitRng, cast_tree

    t0 = time.perf_counter()
    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    cfg = GPTConfig()
    dims = gpt2.GPT2Dims(cfg.layers, cfg.model_dim, cfg.heads)
    host = init_unified_voice(InitRng(0), cfg)
    q = dict(host)
    q["gpt"] = gpt2.quantize_gpt2_int8(host["gpt"])
    params_bf = jax.device_put(cast_tree(host, jnp.bfloat16))
    params_q = jax.device_put(q)

    r = np.random.default_rng(1)
    B, P = 1, 160
    emb = jnp.asarray(r.normal(0, 0.3, (B, P, cfg.model_dim)), jnp.bfloat16)
    mask = jnp.ones((B, P), bool)
    key = jax.random.PRNGKey(0)
    N = 300
    samp = SamplingConfig(do_sample=False, min_new_tokens=N - 1)

    toks = {}
    for name, p in (("bf16", params_bf), ("int8", params_q)):
        t0 = time.perf_counter()
        c, _ = dec.generate(p, cfg, dims, emb, mask, key, N, sampling=samp)
        c = np.asarray(c)
        print(f"{name}: decode {time.perf_counter() - t0:.1f}s", flush=True)
        toks[name] = c[0]
    agree = toks["bf16"] == toks["int8"]
    first_div = int(np.argmin(agree)) if not agree.all() else N
    print(f"greedy token agreement: {agree.mean() * 100:.1f}% "
          f"(first divergence at step {first_div}/{N})")

    # teacher-forced logit cosine on the bf16 trajectory
    Lt, Lm = 24, 128
    text = jnp.asarray(r.integers(2, cfg.number_text_tokens, (B, Lt)), jnp.int32)
    mel = jnp.asarray(toks["bf16"][None, :Lm].clip(0, cfg.start_mel_token - 1),
                      jnp.int32)
    cond = jnp.asarray(r.normal(0, 0.3, (B, cfg.condition_num_latent,
                                         cfg.model_dim)), jnp.float32)
    emo = jnp.asarray(r.normal(0, 0.3, (B, cfg.model_dim)), jnp.float32)
    tl = jnp.full((B,), Lt, jnp.int32)
    ml = jnp.full((B,), Lm, jnp.int32)
    lb = np.asarray(forward_logits(params_bf, cfg, cond, emo, text, tl, mel,
                                   ml, dtype=jnp.bfloat16)[1], np.float32)
    lq = np.asarray(forward_logits(params_q, cfg, cond, emo, text, tl, mel,
                                   ml, dtype=jnp.bfloat16)[1], np.float32)
    fb, fq = lb.reshape(-1, lb.shape[-1]), lq.reshape(-1, lq.shape[-1])
    cos = np.sum(fb * fq, -1) / np.maximum(
        np.linalg.norm(fb, axis=-1) * np.linalg.norm(fq, axis=-1), 1e-9)
    am = np.mean(fb.argmax(-1) == fq.argmax(-1))
    print(f"teacher-forced mel-logit cosine: mean {np.mean(cos):.5f} "
          f"min {np.min(cos):.5f}; argmax agreement {am * 100:.1f}%")


if __name__ == "__main__":
    main()

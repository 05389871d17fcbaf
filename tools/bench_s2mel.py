"""Device profile of the s2mel (CFM/DiT) stage at full scale.

Times `cfm_inference` (25 Euler steps, CFG-stacked batch 2B) at the serving
shape (8 segments -> B=8, T=1152) and A/Bs the round-3 suspects:
  - WaveNet reflect-pad gathers (INDEXTTS_WN_PAD=zero bound)
  - DiT flash vs dense attention at this shape (INDEXTTS_FLASH_DIT)
Each timing ends with a host readback (block_until_ready is unreliable
through the axon relay). min over reps.

Run from /root/repo: timeout 3000 python tools/bench_s2mel.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu.config import S2MelConfig
    from indextts_tpu.models.s2mel import cfm as cfm_mod
    from indextts_tpu.models.s2mel.dit import init_dit
    from indextts_tpu.nn import InitRng, cast_tree

    t0 = time.perf_counter()
    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    s2 = S2MelConfig()
    params = cast_tree(init_dit(InitRng(0), s2), jnp.bfloat16)
    params = jax.device_put(params)

    B, T = 8, 1152
    r = np.random.default_rng(0)
    mu = jnp.asarray(r.standard_normal((B, T, s2.DiT.content_dim)), jnp.bfloat16)
    prompt = jnp.asarray(r.standard_normal((B, T, 80)), jnp.bfloat16)
    style = jnp.asarray(r.standard_normal((B, 192)), jnp.bfloat16)
    x_lens = jnp.full((B,), T - 64, jnp.int32)
    plens = jnp.full((B,), 192, jnp.int32)
    key = jax.random.PRNGKey(0)

    fn = jax.jit(lambda p, mu, prompt, style, k: cfm_mod.cfm_inference(
        p, s2, mu, x_lens, prompt, style, k, n_timesteps=25,
        inference_cfg_rate=0.7, prompt_len=plens))

    def timed(label, reps=3):
        t0 = time.perf_counter()
        out = fn(params, mu, prompt, style, key)
        np.asarray(out[..., :1])
        print(f"{label}: first (compile+run) {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(params, mu, prompt, style, key)
            np.asarray(out[..., :1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: best {best * 1e3:.1f} ms  "
              f"({best * 40:.1f} ms/step at 25 steps)", flush=True)
        return best

    # (wn_pad, packed, flash, adaln_f32) — packed-pair attention is the
    # production default (r4); flash/dense rows document the dispatcher's
    # fallbacks at this shape
    results = {}
    for wn_pad, packed, flash, ada in (
            ("edgefix", "1", "1", "0"),   # production default
            ("reflect", "1", "1", "0"),   # suspect: per-layer pad gather
            ("zero", "1", "1", "0"),      # pad-cost bound (wrong at edges)
            ("edgefix", "0", "1", "0"),   # flash attention fallback
            ("edgefix", "0", "0", "0"),   # dense attention fallback
            ("edgefix", "1", "1", "1")):  # suspect: adaLN f32 elementwise
        os.environ["INDEXTTS_WN_PAD"] = wn_pad
        os.environ["INDEXTTS_PACKED_ATTN"] = packed
        os.environ["INDEXTTS_FLASH_DIT"] = flash
        os.environ["INDEXTTS_ADALN_F32"] = ada
        fn.clear_cache()
        results[(wn_pad, packed, flash, ada)] = timed(
            f"pad={wn_pad} packed={packed} flash={flash} adaln_f32={ada}")

    base = results[("edgefix", "1", "1", "0")]
    print(f"\nedgefix vs reflect-gather: "
          f"{(results[('reflect', '1', '1', '0')] - base) * 1e3:.1f} ms saved")
    print(f"edgefix vs zero bound: "
          f"{(base - results[('zero', '1', '1', '0')]) * 1e3:.1f} ms residual")
    print(f"packed-vs-flash delta: "
          f"{(results[('edgefix', '0', '1', '0')] - base) * 1e3:.1f} ms "
          f"(positive = packed wins)")
    print(f"packed-vs-dense delta: "
          f"{(results[('edgefix', '0', '0', '0')] - base) * 1e3:.1f} ms")
    print(f"adaLN f32 elementwise cost: "
          f"{(results[('edgefix', '1', '1', '1')] - base) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()

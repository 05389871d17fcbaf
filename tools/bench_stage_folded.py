"""Device A/B: plain vs stage-carried folded MRF stages in BigVGAN.

The third narrow-conv attempt (docs/KERNELS.md): per-op folding and grouped
MRF both won standalone but lost whole-model to fold/unfold repacks at every
op boundary; `_amp_stage_folded` folds once per stage and carries the
(B, T/f, f*C) layout through all 18 resblock convs + activations + masks.
Run from /root/repo: timeout 3000 python tools/bench_stage_folded.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    from indextts_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from indextts_tpu import nn
    from indextts_tpu.config import BigVGANConfig
    from indextts_tpu.models.vocoder.bigvgan import (bigvgan_forward,
                                                     init_bigvgan)
    from indextts_tpu.nn import InitRng

    t0 = time.perf_counter()
    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    h = BigVGANConfig()
    params = jax.device_put(nn.cast_tree(init_bigvgan(InitRng(0), h),
                                         jnp.bfloat16))
    r = np.random.default_rng(0)

    for B, T in ((4, 1088), (8, 896), (1, 896)):
        mel = jnp.asarray(r.standard_normal((B, T, h.num_mels)) * 0.3,
                          jnp.bfloat16)
        lens = jnp.asarray([T - 17 * i for i in range(B)], jnp.int32)

        def run(label):
            fn = jax.jit(lambda p, m, l: bigvgan_forward(p, h, m, l))
            t0 = time.perf_counter()
            out = fn(params, mel, lens)
            np.asarray(out[:, :1])
            print(f"  {label}: first {time.perf_counter() - t0:.1f}s",
                  flush=True)
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(params, mel, lens)
                np.asarray(out[:, :1])
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"  {label}: best {best * 1e3:.1f} ms", flush=True)
            return best, np.asarray(out)

        print(f"--- B={B} T={T}", flush=True)
        os.environ["INDEXTTS_STAGE_FOLDED"] = "0"
        t_plain, w_plain = run("plain    ")
        os.environ["INDEXTTS_STAGE_FOLDED"] = "1"
        t_fold, w_fold = run("folded   ")
        os.environ["INDEXTTS_MATMUL_CONV"] = "1"
        t_both, w_both = run("folded+mm")
        os.environ["INDEXTTS_SUBPIXEL_CONVT"] = "1"
        t_all, w_all = run("fold+mm+sub")
        os.environ["INDEXTTS_STAGE_FOLDED"] = "0"
        os.environ["INDEXTTS_SUBPIXEL_CONVT"] = "0"
        t_mm, w_mm = run("mm only  ")
        os.environ["INDEXTTS_MATMUL_CONV"] = "0"
        os.environ["INDEXTTS_SUBPIXEL_CONVT"] = "1"
        t_sub, w_sub = run("sub only ")
        os.environ["INDEXTTS_SUBPIXEL_CONVT"] = "0"
        diff = float(np.max(np.abs(w_plain - w_fold)))
        diff2 = float(np.max(np.abs(w_plain - w_all)))
        print(f"  folded {t_plain / t_fold:.2f}x  +mm {t_plain / t_both:.2f}x"
              f"  all {t_plain / t_all:.2f}x  mm-only {t_plain / t_mm:.2f}x"
              f"  sub-only {t_plain / t_sub:.2f}x  "
              f"max|dw| folded {diff:.2e} all {diff2:.2e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

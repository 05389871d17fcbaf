"""Device A/B: plain ConvTranspose1d upsamples vs the subpixel restructure
(INDEXTTS_SUBPIXEL_CONVT) on the whole vocoder. Trimmed from
bench_stage_folded.py after the stage-folded/matmul-conv variants were
eliminated (folded lost 576->896 ms whole-model; matmul-conv's unrolled
program exceeded the compile relay's request-size limit).

Run from /root/repo: timeout 2400 python tools/bench_subpixel.py
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

    # bigvgan.py:289 only honors INDEXTTS_SUBPIXEL_CONVT=1 on tpu/axon
    # backends — run on CPU this would silently A/B plain-vs-plain and
    # report ~1.00x (advisor r3 finding)
    assert jax.default_backend() in ("tpu", "axon"), (
        "bench_subpixel measures nothing off-TPU (the =1 flag value is "
        f"TPU-gated); backend is {jax.default_backend()!r}")

    t0 = time.perf_counter()
    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    h = BigVGANConfig()
    params = jax.device_put(nn.cast_tree(init_bigvgan(InitRng(0), h),
                                         jnp.bfloat16))
    r = np.random.default_rng(0)

    for B, T in ((4, 1088), (8, 896)):
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
            for _ in range(4):
                t0 = time.perf_counter()
                out = fn(params, mel, lens)
                np.asarray(out[:, :1])
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"  {label}: best {best * 1e3:.1f} ms", flush=True)
            return best, np.asarray(out)

        print(f"--- B={B} T={T}", flush=True)
        os.environ["INDEXTTS_SUBPIXEL_CONVT"] = "0"
        t_plain, w_plain = run("plain")
        os.environ["INDEXTTS_SUBPIXEL_CONVT"] = "1"
        t_sub, w_sub = run("sub  ")
        os.environ["INDEXTTS_SUBPIXEL_CONVT"] = "0"
        diff = float(np.max(np.abs(w_plain - w_sub)))
        print(f"  sub {t_plain / t_sub:.2f}x  max|dw| {diff:.2e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

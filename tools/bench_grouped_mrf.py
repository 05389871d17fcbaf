"""Device A/B: whole-vocoder grouped-MRF vs per-resblock narrow stages.

Same in-process methodology that caught the fold_conv inversion: the FULL
bigvgan_forward at serving shape (B=4, mel T=1088, bf16), both variants
jitted in one process, min of 4 timed runs each, numerics cross-checked.

Run from /root/repo: timeout 3000 python tools/bench_grouped_mrf.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B, T = 4, 1088


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu.config import BigVGANConfig
    from indextts_tpu.models.vocoder import bigvgan as bv
    from indextts_tpu.nn import InitRng

    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print("warm", flush=True)

    h = BigVGANConfig()
    params = bv.init_bigvgan(InitRng(0), h)
    params = jax.device_put(jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32) if hasattr(a, "dtype") else a,
        params))
    r = np.random.default_rng(0)
    mel = jnp.asarray(r.standard_normal((B, T, h.num_mels)), jnp.bfloat16)
    lens = jnp.asarray([T, T, 900, 700], jnp.int32)

    outs = {}
    for mode in ("0", "1"):
        os.environ["INDEXTTS_GROUPED_MRF"] = mode

        @jax.jit
        def f(params, mel, lens):
            return bv.bigvgan_forward(params, h, mel, lens)

        np.asarray(f(params, mel, lens))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = f(params, mel, lens)
            np.asarray(out[:, :256])
            best = min(best, time.perf_counter() - t0)
        outs[mode] = np.asarray(out, np.float32)
        name = "plain  " if mode == "0" else "grouped"
        print(f"{name}: {best * 1e3:7.1f} ms", flush=True)

    L = 700 * 256
    d = np.abs(outs["0"][:, :L] - outs["1"][:, :L]).max()
    print(f"max |plain - grouped| over valid samples: {d:.3e}", flush=True)


if __name__ == "__main__":
    main()

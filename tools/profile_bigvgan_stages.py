"""Per-stage wall profile of the full-scale BigVGAN (B=4, mel T=896).

Round-3 cost-center numbers said convs are ~544 ms of the 577 ms total but
not WHERE. This runs stage prefixes (pre, up0..up5, post) as separate jitted
programs and diffs them: stage i cost = t(prefix i) - t(prefix i-1).
Channels per stage: 768, 384, 192, 96, 48, 24 after the 1536-ch conv_pre.

Run from /root/repo: timeout 3600 python tools/profile_bigvgan_stages.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B, T = 4, 896


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu.config import BigVGANConfig
    from indextts_tpu.models.vocoder.bigvgan import (_amp_block, _mask,
                                                     antialias_activation)
    from indextts_tpu.nn import InitRng
    from indextts_tpu import nn
    from indextts_tpu.models.vocoder import bigvgan as bv

    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print("warm", flush=True)

    h = BigVGANConfig()
    params = bv.init_bigvgan(InitRng(0), h)
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32) if hasattr(a, "dtype") else a,
        params)
    params = jax.device_put(params)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, 80)),
                      jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)

    def prefix(n_stages, with_post):
        def f(p, mel, mel_lens):
            x = _mask(mel, mel_lens)
            x = nn.conv1d(p["conv_pre"], x, padding=3)
            lens = mel_lens
            nk = len(h.resblock_kernel_sizes)
            for i, (u, k) in enumerate(zip(h.upsample_rates,
                                           h.upsample_kernel_sizes)):
                if i >= n_stages:
                    break
                x = _mask(x, lens)
                x = nn.conv_transpose1d(p["ups"][i], x, stride=u,
                                        padding=(k - u) // 2)
                lens = lens * u
                x = _mask(x, lens)
                xs = None
                for j, (ks, dils) in enumerate(zip(h.resblock_kernel_sizes,
                                                   h.resblock_dilation_sizes)):
                    r = _amp_block(p["resblocks"][i * nk + j], h, x, ks,
                                   dils, lens)
                    xs = r if xs is None else xs + r
                x = xs / nk
            if with_post:
                ap = p["activation_post"]
                x = antialias_activation(x, ap["alpha"], ap.get("beta"),
                                         lens, h.snake_logscale)
                x = _mask(x, lens)
                x = nn.conv1d(p["conv_post"], x, padding=3)
                x = jnp.clip(x, -1.0, 1.0)
            return x[:1, :1, :1]
        return jax.jit(f)

    labels = ["pre only"] + [f"up{i} (C={1536 // 2 ** (i + 1)})"
                             for i in range(6)] + ["post"]
    runs = [(0, False)] + [(i + 1, False) for i in range(6)] + [(6, True)]
    prev = 0.0
    for label, (ns, wp) in zip(labels, runs):
        f = prefix(ns, wp)
        f(params, mel, lens)  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(params, mel, lens)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{label:16s}: cum {best * 1e3:7.1f} ms  "
              f"stage {1e3 * (best - prev):+7.1f} ms", flush=True)
        prev = best


if __name__ == "__main__":
    main()

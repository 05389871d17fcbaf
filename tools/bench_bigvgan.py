"""Device profile of the BigVGAN vocoder at serving shape.

Times `bigvgan_forward` (B=4, T=1088 mel frames -> ~12.6 s audio per row)
and isolates the cost centers by monkeypatching:
  - noact:  antialias activations -> identity (bounds the conv+mask share)
  - nomask: interior `_mask` calls -> identity (bounds the masking share;
            output is wrong, timing only)
Run from /root/repo: timeout 3000 python tools/bench_bigvgan.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu import nn
    from indextts_tpu.config import BigVGANConfig
    from indextts_tpu.models.vocoder import bigvgan as bv
    from indextts_tpu.nn import InitRng
    from indextts_tpu.ops import snake

    t0 = time.perf_counter()
    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    h = BigVGANConfig()
    params = jax.device_put(nn.cast_tree(init_params(h), jnp.bfloat16))
    B, T = 4, 1088
    r = np.random.default_rng(0)
    mel = jnp.asarray(r.standard_normal((B, T, h.num_mels)), jnp.bfloat16)
    lens = jnp.asarray([T, T - 32, T - 64, T - 128], jnp.int32)

    orig_act = snake.antialias_activation
    orig_mask = bv._mask

    def run_variant(label, act, mask):
        snake.antialias_activation = act
        bv._mask = mask
        fn = jax.jit(lambda p, m, l: bv.bigvgan_forward(p, h, m, l))
        t0 = time.perf_counter()
        out = fn(params, mel, lens)
        np.asarray(out[:, :1])
        print(f"{label}: first {time.perf_counter() - t0:.1f}s", flush=True)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(params, mel, lens)
            np.asarray(out[:, :1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: best {best * 1e3:.1f} ms", flush=True)
        return best

    import os

    ident_act = lambda x, a, b, lengths=None, logscale=True: x
    ident_mask = lambda x, lengths: x
    try:
        os.environ["INDEXTTS_FOLDED_CONV"] = "0"
        full0 = run_variant("full (plain convs)", orig_act, orig_mask)
        os.environ["INDEXTTS_FOLDED_CONV"] = "1"
        full1 = run_variant("full (folded convs)", orig_act, orig_mask)
        os.environ["INDEXTTS_FOLDED_CONV"] = "0"
        noact = run_variant("noact (convs+masks only)", ident_act, orig_mask)
        nomask = run_variant("nomask (convs+acts only)", orig_act, ident_mask)
        neither = run_variant("neither (convs only)", ident_act, ident_mask)
    finally:
        snake.antialias_activation = orig_act
        bv._mask = orig_mask
        os.environ.pop("INDEXTTS_FOLDED_CONV", None)

    print(f"\nfolded-conv speedup: {full0 / full1:.2f}x "
          f"({(full0 - full1) * 1e3:.1f} ms)")
    print(f"act share  ~{(full0 - noact) * 1e3:.1f} ms")
    print(f"mask share ~{(full0 - nomask) * 1e3:.1f} ms")
    print(f"conv floor ~{neither * 1e3:.1f} ms")


def init_params(h):
    from indextts_tpu.models.vocoder.bigvgan import init_bigvgan
    from indextts_tpu.nn import InitRng

    return init_bigvgan(InitRng(0), h)


if __name__ == "__main__":
    main()

"""In-scan decode-step timing across batch sizes (fused kernel vs XLA).

Validates the B>12 32-slot-block kernel variant at serving span: B=16/24
must decode through the kernel at a sane per-token cost (VERDICT r2 item 5:
B=16/S=1024 <= 2x the B=8 cost). Each variant runs `STEPS` decode steps
inside one lax.scan (per-dispatch floor through the relay is ~4 ms, so
single-step timing would measure dispatch).

Run from /root/repo: timeout 3000 python tools/bench_decode_batch.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

STEPS = 200


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu.models.gpt.gpt2 import (GPT2Dims, gpt2_decode_step,
                                              init_gpt2, init_kv_cache,
                                              quantize_gpt2_int8)
    from indextts_tpu.nn import InitRng
    from indextts_tpu.ops.pallas.decode_step import fused_decode_step

    t0 = time.perf_counter()
    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    dims = GPT2Dims(24, 1280, 20)
    params = quantize_gpt2_int8(init_gpt2(InitRng(0), dims))
    params = jax.device_put(params)
    S = 1024
    pos0 = S - STEPS - 8

    def run(B, fused=True):
        r = np.random.default_rng(B)
        cache = {
            "k": jnp.asarray(r.standard_normal((dims.layers, B, S, dims.dim)),
                             jnp.bfloat16),
            "v": jnp.asarray(r.standard_normal((dims.layers, B, S, dims.dim)),
                             jnp.bfloat16),
        }
        if not fused:
            cache = {k: v.reshape(dims.layers, B, S, dims.heads,
                                  dims.head_dim) for k, v in cache.items()}
        x0 = jnp.asarray(r.standard_normal((B, dims.dim)), jnp.bfloat16)
        valid0 = jnp.arange(S)[None, :] < pos0
        valid0 = jnp.broadcast_to(valid0, (B, S))

        @jax.jit
        def scan_steps(params, x0, cache, valid0):
            # params as an ARGUMENT: a closure would inline ~500 MB of int8
            # weights as constants into the compile payload (relay 413)
            def body(carry, i):
                x, kv, valid = carry
                pos = pos0 + i
                valid = valid.at[:, pos].set(True)
                if fused:
                    h, kv = fused_decode_step(params, x, dims, pos, kv, valid)
                else:
                    h, kv = gpt2_decode_step(params, x, dims, pos, kv, valid)
                return (h[:, :dims.dim].astype(jnp.bfloat16), kv, valid), None
            (xf, _, _), _ = jax.lax.scan(body, (x0, cache, valid0),
                                         jnp.arange(STEPS))
            return xf

        label = f"B={B} {'fused' if fused else 'xla'}"
        t0 = time.perf_counter()
        out = scan_steps(params, x0, cache, valid0)
        np.asarray(out[:1, :1])
        print(f"{label}: first (compile+run) {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = scan_steps(params, x0, cache, valid0)
            np.asarray(out[:1, :1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: {best / STEPS * 1e3:.2f} ms/token "
              f"({STEPS} steps in-scan, min of 3)", flush=True)
        return best / STEPS

    r8 = run(8)
    r16 = run(16)
    r24 = run(24)
    x16 = run(16, fused=False)
    print(f"\nB=16 fused/B=8 fused = {r16 / r8:.2f}x (target <= 2x)")
    print(f"B=16 fused vs XLA: {r16 * 1e3:.2f} vs {x16 * 1e3:.2f} ms/token")
    print(f"B=24 fused: {r24 * 1e3:.2f} ms/token")


if __name__ == "__main__":
    main()

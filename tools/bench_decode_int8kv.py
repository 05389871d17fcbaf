"""In-scan decode A/B: fused kernel with bf16 cache vs flat int8 cache.

At long spans the KV cache dominates the decode DMA (per token, per layer:
2*B*S*D bytes bf16 vs B*S*(2*D + 512) with int8 + packed scale rows —
1.67x less). Times STEPS decode steps in one lax.scan per variant, min of
3, same process.

Run from /root/repo: timeout 3000 python tools/bench_decode_int8kv.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

STEPS = 200


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu.models.gpt.gpt2 import (GPT2Dims, init_gpt2,
                                              kv_quantize_flat,
                                              quantize_gpt2_int8)
    from indextts_tpu.nn import InitRng
    from indextts_tpu.ops.pallas.decode_step import fused_decode_step

    t0 = time.perf_counter()
    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    dims = GPT2Dims(24, 1280, 20)
    params = quantize_gpt2_int8(init_gpt2(InitRng(0), dims))
    params = jax.device_put(params)

    def run(B, S, kvq):
        pos0 = S - STEPS - 8
        r = np.random.default_rng(B)
        k = jnp.asarray(r.standard_normal((dims.layers, B, S, dims.dim)),
                        jnp.bfloat16)
        v = jnp.asarray(r.standard_normal((dims.layers, B, S, dims.dim)),
                        jnp.bfloat16)
        if kvq:
            kq, vq, kvs = jax.jit(
                lambda k, v: kv_quantize_flat(k, v, dims.heads))(k, v)
            cache = {"k": kq, "v": vq, "kvs": kvs}
        else:
            cache = {"k": k, "v": v}
        x0 = jnp.asarray(r.standard_normal((B, dims.dim)), jnp.bfloat16)
        valid0 = jnp.broadcast_to(jnp.arange(S)[None, :] < pos0, (B, S))

        @jax.jit
        def scan_steps(params, x0, cache, valid0):
            def body(carry, i):
                x, kv, valid = carry
                pos = pos0 + i
                valid = valid.at[:, pos].set(True)
                h, kv = fused_decode_step(params, x, dims, pos, kv, valid)
                return (h[:, :dims.dim].astype(jnp.bfloat16), kv, valid), None
            (xf, _, _), _ = jax.lax.scan(body, (x0, cache, valid0),
                                         jnp.arange(STEPS))
            return xf

        label = f"B={B} S={S} {'int8kv' if kvq else 'bf16kv'}"
        t0 = time.perf_counter()
        np.asarray(scan_steps(params, x0, cache, valid0)[:1, :1])
        print(f"{label}: first (compile+run) {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(scan_steps(params, x0, cache, valid0)[:1, :1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: {best / STEPS * 1e3:.2f} ms/token "
              f"({STEPS} steps in-scan, min of 3)", flush=True)
        return best / STEPS

    # (4, 1664) = the serving-cap bucket (max_mel_tokens=1500 + prefix,
    # 128-aligned) — the regime where the cache dominates the weight DMA.
    # B=1 rows are the bench's actual serving-cap config (single segment,
    # max_mel_tokens=1500) — VERDICT r3 item 1.
    for B, S in ((1, 1024), (1, 1664), (4, 1024), (8, 1024), (8, 512),
                 (4, 1664)):
        a = run(B, S, False)
        b = run(B, S, True)
        print(f"B={B} S={S}: int8kv/bf16 = {b / a:.2f}x\n", flush=True)


if __name__ == "__main__":
    main()

"""In-scan decode A/B: fused kernel with int8 vs int4 (nibble-packed)
weights, both unpack formulations.

Weights dominate decode DMA at small B (483 MB/token int8 at full scale);
int4 halves that to 242 MB — IF the in-kernel VPU unpack (shifts + concat
per (640, 640) block, 24 blocks/layer) is cheaper than the DMA it saves.
Times STEPS decode steps in one lax.scan per variant, min of 3, same
process.

Run from /root/repo: timeout 3000 python tools/bench_decode_int4.py
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
                                              quantize_gpt2_int4,
                                              quantize_gpt2_int8)
    from indextts_tpu.nn import InitRng
    from indextts_tpu.ops.pallas.decode_step import fused_decode_step

    t0 = time.perf_counter()
    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    dims = GPT2Dims(24, 1280, 20)
    raw = init_gpt2(InitRng(0), dims)
    params8 = jax.device_put(quantize_gpt2_int8(raw))
    params4 = jax.device_put(quantize_gpt2_int4(raw))

    def run(params, B, S, label, w4f=None):
        pos0 = S - STEPS - 8
        r = np.random.default_rng(B)
        cache = {
            "k": jnp.asarray(r.standard_normal((dims.layers, B, S, dims.dim)),
                             jnp.bfloat16),
            "v": jnp.asarray(r.standard_normal((dims.layers, B, S, dims.dim)),
                             jnp.bfloat16)}
        x0 = jnp.asarray(r.standard_normal((B, dims.dim)), jnp.bfloat16)
        valid0 = jnp.broadcast_to(jnp.arange(S)[None, :] < pos0, (B, S))

        @jax.jit
        def scan_steps(params, x0, cache, valid0):
            def body(carry, i):
                x, kv, valid = carry
                pos = pos0 + i
                valid = valid.at[:, pos].set(True)
                h, kv = fused_decode_step(params, x, dims, pos, kv, valid,
                                          w4f=w4f)
                return (h[:, :dims.dim].astype(jnp.bfloat16), kv, valid), None
            (xf, _, _), _ = jax.lax.scan(body, (x0, cache, valid0),
                                         jnp.arange(STEPS))
            return xf

        label = f"B={B} S={S} {label}"
        try:
            t0 = time.perf_counter()
            np.asarray(scan_steps(params, x0, cache, valid0)[:1, :1])
            print(f"{label}: first (compile+run) "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
        except Exception as e:
            print(f"{label}: FAILS — {str(e).splitlines()[0][:140]}",
                  flush=True)
            return None
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(scan_steps(params, x0, cache, valid0)[:1, :1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: {best / STEPS * 1e3:.2f} ms/token "
              f"({STEPS} steps in-scan, min of 3)", flush=True)
        return best / STEPS

    # (1, 640) = single-segment decode, where weights are ~all of the DMA
    # and the int4 win (if the unpack is cheap) is largest
    for B, S in ((1, 640), (4, 512), (4, 1024), (8, 512)):
        a = run(params8, B, S, "int8")
        b = run(params4, B, S, "int4/shift", w4f="shift")
        c = run(params4, B, S, "int4/f32", w4f="f32")
        for name, t in (("shift", b), ("f32", c)):
            if t is not None and a is not None:
                print(f"B={B} S={S}: int4/{name} vs int8 = {t / a:.2f}x",
                      flush=True)
        print("", flush=True)


if __name__ == "__main__":
    main()

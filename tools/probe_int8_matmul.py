"""Probe: does int8 x int8 -> int32 dot_general hit the MXU's 2x-bf16 rate
on this chip? Decides whether int8 DiT matmuls are worth building for the
flop-bound CFM stage (s2mel ~51 TF/s bf16 = 76% of practical ceiling).

Measurement rules (CLAUDE.md): in-graph chain via lax.scan, 1-element host
readback, min of >=3 reps, A/B in one process.

Run from /root/repo: timeout 3000 python tools/probe_int8_matmul.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N = 4096
REPS = 24


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    t0 = time.perf_counter()
    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    r = np.random.default_rng(0)
    a_bf = jnp.asarray(r.standard_normal((N, N)), jnp.bfloat16)
    b_bf = jnp.asarray(r.standard_normal((N, N)), jnp.bfloat16)
    a_i8 = jnp.asarray(r.integers(-127, 127, (N, N)), jnp.int8)
    b_i8 = jnp.asarray(r.integers(-127, 127, (N, N)), jnp.int8)

    def chain(dot, cast):
        # feed a tiny data dependence through the chain so XLA can't CSE it
        def body(c, _):
            o = dot(c)
            return cast(o), None

        def run(a):
            out, _ = lax.scan(body, a, None, length=REPS)
            return out

        return jax.jit(run)

    flops = 2 * N * N * N * REPS

    def bench(label, fn, x):
        fn(x)  # compile
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(x)
            np.asarray(out[:1, :1])
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best * 1e3:7.2f} ms  {flops / best / 1e12:6.1f} TF/s",
              flush=True)
        return best

    # bf16 x bf16 -> f32 accumulate (the current CFM path)
    bench("bf16xbf16", chain(
        lambda x: lax.dot(x, b_bf, preferred_element_type=jnp.float32),
        lambda o: o.astype(jnp.bfloat16)), a_bf)

    # int8 x int8 -> int32 (native MXU int8 if supported)
    bench("int8xint8->i32", chain(
        lambda x: lax.dot(x, b_i8, preferred_element_type=jnp.int32),
        lambda o: jnp.clip(o >> 8, -127, 127).astype(jnp.int8)), a_i8)

    # int8 x int8 with f32 accumulate (how a quantized layer would read out)
    bench("int8xint8->f32", chain(
        lambda x: lax.dot(x, b_i8, preferred_element_type=jnp.float32),
        lambda o: jnp.clip(o * (1 / 256), -127, 127).astype(jnp.int8)), a_i8)

    # realistic quantized layer: bf16 act -> quantize -> int8 dot -> dequant
    scale = jnp.float32(0.05)

    def qlayer(x):
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / amax * 127), -127,
                     127).astype(jnp.int8)
        o = lax.dot(q, b_i8, preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * (amax * scale / 127)).astype(
            jnp.bfloat16)

    bench("qdq layer (bf16 io)", chain(qlayer, lambda o: o), a_bf)


if __name__ == "__main__":
    main()

"""Probe: which int4-unpack formulations lower in Mosaic, and what they
cost at the decode kernel's weight-block shape.

int4 weights would halve the fused decode kernel's weight DMA (483 -> 242
MB/token), but only if the in-kernel nibble unpack is cheap. Candidates
per (640, 640) int8 packed block (= one (1280, 640) int4 weight block):

  a) shifts  — hi = p >> 4 (arith), lo = (p << 4) >> 4   [int8 bit ops]
  b) f32     — pf = f32(p); hi = floor(pf/16); lo = pf - 16*hi,
               lo -= 16*(lo >= 8)                         [VPU arithmetic]

Each variant runs as a Pallas kernel unpacking REPS blocks in sequence
(sum-reduced output); reports lowering success + per-block cost.

Run from /root/repo: timeout 3000 python tools/probe_mosaic_int4.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

R, C = 640, 640
REPS = 32


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print("warm", flush=True)
    r = np.random.default_rng(0)
    packed = jnp.asarray(r.integers(-128, 128, (REPS, R, C)), jnp.int8)
    x = jnp.asarray(r.standard_normal((8, 2 * R)) * 0.1, jnp.bfloat16)

    def kern_shift(p_ref, x_ref, o_ref):
        acc = jnp.zeros((8, C), jnp.float32)
        for i in range(REPS):
            p = p_ref[i]
            hi = jax.lax.shift_right_arithmetic(p, jnp.int8(4))
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(p, jnp.int8(4)), jnp.int8(4))
            w = jnp.concatenate([lo, hi], 0).astype(jnp.bfloat16)
            acc += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
        o_ref[...] = acc

    def kern_f32(p_ref, x_ref, o_ref):
        acc = jnp.zeros((8, C), jnp.float32)
        for i in range(REPS):
            pf = p_ref[i].astype(jnp.float32)
            hi = jnp.floor(pf / 16.0)
            lo = pf - 16.0 * hi
            lo = lo - 16.0 * (lo >= 8.0).astype(jnp.float32)
            w = jnp.concatenate([lo, hi], 0).astype(jnp.bfloat16)
            acc += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
        o_ref[...] = acc

    def kern_base(p_ref, x_ref, o_ref):
        # baseline: int8 cast only (no unpack) — isolates the unpack cost
        acc = jnp.zeros((8, C), jnp.float32)
        for i in range(REPS):
            w = p_ref[i].astype(jnp.bfloat16)
            acc += jnp.dot(x_ref[:, :R], w,
                           preferred_element_type=jnp.float32)
        o_ref[...] = acc

    for name, kern in [("base ", kern_base), ("shift", kern_shift),
                       ("f32  ", kern_f32)]:
        try:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 2**20),
            )
            g = jax.jit(lambda p, x, f=f: f(p, x))
            out = np.asarray(g(packed, x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(g(packed, x))
                best = min(best, time.perf_counter() - t0)
            print(f"{name}: LOWERS  {best / REPS * 1e6:7.1f} us/block  "
                  f"sum={out.sum():.1f}", flush=True)
        except Exception as e:
            print(f"{name}: FAILS — {str(e).splitlines()[0][:120]}",
                  flush=True)


if __name__ == "__main__":
    main()

"""Probe: which int4-unpack formulations lower in Mosaic, and what they
cost at the decode kernel's weight-block shape.

int4 weights would halve the fused decode kernel's weight DMA (483 -> 242
MB/token), but only if the in-kernel nibble unpack is cheap. Candidates
per (640, 640) int8 packed block (= one (1280, 640) int4 weight block):

  a) shifts  — hi = p >> 4 (arith), lo = (p << 4) >> 4   [int8 bit ops]
  b) f32     — pf = f32(p); hi = floor(pf/16); lo = pf - 16*hi,
               lo -= 16*(lo >= 8)                         [VPU arithmetic]
  c) i32     — widen to int32, then the same shift pair   [int32 bit ops]
  d) native  — a jnp.int4 input ref + one astype(bf16): XLA S4 is packed
               2-per-byte in HBM, so if Mosaic lowers the load+convert,
               the DMA halves with NO explicit unpack arithmetic (r5)
  e) nat-dma — (d) but streamed via make_async_copy from an ANY-space
               pool into int4 VMEM scratch, the decode kernel's actual
               access pattern

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

    def kern_i32(p_ref, x_ref, o_ref):
        acc = jnp.zeros((8, C), jnp.float32)
        for i in range(REPS):
            p = p_ref[i].astype(jnp.int32)
            hi = jax.lax.shift_right_arithmetic(p, 4)
            lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p, 28), 28)
            w = jnp.concatenate([lo, hi], 0).astype(jnp.bfloat16)
            acc += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
        o_ref[...] = acc

    def kern_native(p4_ref, x_ref, o_ref):
        acc = jnp.zeros((8, C), jnp.float32)
        for i in range(REPS):
            w = p4_ref[i].astype(jnp.bfloat16)
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

    # native-int4 operand: the same nibbles as `packed`, laid out unpacked
    # (lo rows then hi rows per block, matching the concat order above).
    # The axon relay rejects the direct host->S4 convert path
    # (`jnp.asarray(np_int8, jnp.int4)` recursively re-enters jit), so try
    # ml_dtypes device_put first, then an on-device int8->int4 cast.
    # r5 DEVICE VERDICT (native S4 is a dead end on this stack):
    #   - `jax.device_put(ml_dtypes.int4 array)` succeeds but POISONS the
    #     process: every later execution (incl. int8-only kernels) fails
    #     "UNIMPLEMENTED: TPU backend error". Use the on-device
    #     int8->int4 cast instead, which is benign.
    #   - XLA reports the S4 array at 1 byte/element (nbytes == the
    #     unpacked int8 size) — there is NO bit-packed HBM layout and
    #     hence no DMA halving to win.
    #   - pallas_call with an S4 operand fails to trace through the axon
    #     relay ("Recursively calling jit") for both VMEM and ANY inputs.
    #   - Of the unpack arithmetics: f32 765 us/block beats i32 shifts
    #     796; int8 shifts still crash tpu_compile_helper; no-unpack int8
    #     base is 741 — f32 unpack costs ~3%, confirming the r3
    #     "speed-neutral memory knob" verdict for packed int4.
    # PROBE_INT4_NATIVE=0 skips S4 operand creation entirely.
    import os
    want_native = os.environ.get("PROBE_INT4_NATIVE", "1") != "0"
    pk = np.asarray(packed, np.int32)
    hi = pk >> 4
    lo = (pk << 28) >> 28
    nib = np.concatenate([lo, hi], 1)
    packed4 = None
    if want_native:
        try:
            packed4 = jax.jit(lambda a: a.astype(jnp.int4))(
                jnp.asarray(nib, jnp.int8))
            packed4.block_until_ready()
            print("int4 operand via on-device cast", flush=True)
        except Exception as e:
            print(f"on-device int4 cast failed: "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
    if packed4 is not None:
        print(f"int4 operand nbytes (XLA view): {packed4.nbytes} "
              f"(int8 packed: {packed.nbytes})", flush=True)

    def bench_one(name, build, parg):
        # lowering failures surface at trace/compile inside the first
        # execution, so the whole build+run+min-of-3 sits in one try
        try:
            f = build()
            g = jax.jit(lambda p, x, f=f: f(p, x))
            out = np.asarray(g(parg, x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(g(parg, x))
                best = min(best, time.perf_counter() - t0)
            print(f"{name}: LOWERS  {best / REPS * 1e6:7.1f} us/block  "
                  f"sum={out.sum():.1f}", flush=True)
        except Exception as e:
            print(f"{name}: FAILS — {str(e).splitlines()[0][:120]}",
                  flush=True)

    variants = [("base  ", kern_base, packed),
                ("shift ", kern_shift, packed),
                ("f32   ", kern_f32, packed),
                ("i32   ", kern_i32, packed)]
    if packed4 is not None:
        variants.append(("native", kern_native, packed4))
    for name, kern, parg in variants:
        bench_one(name, lambda kern=kern: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        ), parg)

    # e) the decode kernel's actual pattern: weights live in an ANY-space
    # pool, each block DMA'd into a double-buffered VMEM scratch. Probe
    # whether an int4 pool DMAs (at half the bytes) + converts in-kernel.
    def kern_natdma(p4_ref, x_ref, o_ref, buf, sem):
        def start(j, slot):
            pltpu.make_async_copy(p4_ref.at[j], buf.at[slot],
                                  sem.at[slot]).start()
        start(0, 0)
        start(1, 1)

        def body(i, acc):
            slot = i % 2
            pltpu.make_async_copy(p4_ref.at[i], buf.at[slot],
                                  sem.at[slot]).wait()
            # consume the slot BEFORE prefetching into it (the decode
            # kernel prefetches into the OTHER slot; with only two slots
            # and stride 2 the next copy targets this one)
            w = buf[slot].astype(jnp.bfloat16)
            acc = acc + jnp.dot(x_ref[...], w,
                                preferred_element_type=jnp.float32)

            @pl.when(i + 2 < REPS)
            def _():
                start(i + 2, slot)
            return acc

        o_ref[...] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((8, C), jnp.float32))

    # dma8: identical streaming structure, int8 operand at FULL rows
    # (2R, C) — twice the bytes IF the int4 pool is truly bit-packed on
    # device; the natdma/dma8 time ratio measures the real DMA saving.
    unpacked8 = jnp.asarray(nib, jnp.int8)

    dma_variants = [("dma8  ", jnp.int8, unpacked8)]
    if packed4 is not None:
        dma_variants.insert(0, ("natdma", jnp.int4, packed4))
    for name, dt, parg in dma_variants:
        bench_one(name, lambda dt=dt: pl.pallas_call(
            kern_natdma,
            out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, 2 * R, C), dt),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        ), parg)


if __name__ == "__main__":
    main()

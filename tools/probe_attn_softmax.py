"""Probe: what the DiT attention actually spends its 39 ms/step on.

Round-3 stage profile: attention += 982 ms of the 1473 ms s2mel CFM
(13 layers x 25 steps at B=16, H=8, T=1152, D=64) — ~14.5 TF/s effective
while the backbone matmuls hit ~180 TF/s. Arithmetic says the (T, T) f32
softmax is VPU-transcendental-bound (~170M score elements per layer-step),
so this probes kernel variants that cut VPU ops per element:

  v0 matmuls-only   — q@kT cast bf16 @ v (no softmax): the MXU floor
  v1 current        — mask -> rowmax -> exp(s-m) -> rowsum -> divide
  v2 nodiv          — fold 1/rowsum into the (T, D) output (T/D x fewer divs)
  v3 exp2+nodiv     — exp2((s-m)*log2e) instead of exp, fold divide
  v4 bf16exp+nodiv  — scores to bf16 before exp (2-wide VPU if supported)
  v5 nomax          — exp2(s*log2e - C), C a static bound (UNSAFE; speed only)
  v6 qblock-skip    — v3 + skip query row-blocks past `length` (len=896)

Each variant runs in a 13-iteration lax.scan (one CFM step's layers),
min of 3 after warmup. Also times the XLA (B,T,H,D)<->(B,H,T,D)
transposes around the kernel call to size their share.

Run from /root/repo: timeout 3600 python tools/probe_attn_softmax.py
"""

import functools
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B, H, T, D = 16, 8, 1152, 64
LAYERS = 13
LEN = 896
LOG2E = 1.4426950408889634


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print("warm", flush=True)
    scale = 1.0 / math.sqrt(D)

    def mk_kernel(variant):
        def kernel(len_ref, q_ref, k_ref, v_ref, o_ref):
            b = pl.program_id(0)
            if variant.startswith("b"):
                q = q_ref[0, 0]          # bf16 in, f32 MXU accumulation
                k = k_ref[0, 0]
            else:
                q = q_ref[0, 0].astype(jnp.float32)
                k = k_ref[0, 0].astype(jnp.float32)
            length = len_ref[b]
            variant_n = "v" + variant[1:]

            def scores():
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                key_ok = jax.lax.broadcasted_iota(
                    jnp.int32, (T, T), 1) < length
                return jnp.where(key_ok, s, jnp.float32(-1e9))

            if variant_n == "v0":
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                o = jnp.dot(s.astype(v_ref.dtype), v_ref[0, 0],
                            preferred_element_type=jnp.float32)
            elif variant_n == "v1":
                s = scores()
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=1, keepdims=True)
                o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                            preferred_element_type=jnp.float32)
            elif variant_n == "v2":
                s = scores()
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
                r = jnp.sum(p, axis=1, keepdims=True)
                o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                            preferred_element_type=jnp.float32) / r
            elif variant_n == "v3":
                s = scores()
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp2(s * LOG2E - m * LOG2E)
                r = jnp.sum(p, axis=1, keepdims=True)
                o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                            preferred_element_type=jnp.float32) / r
            elif variant_n == "v4":
                s = scores()
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp((s - m).astype(jnp.bfloat16))
                r = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
                o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                            preferred_element_type=jnp.float32) / r
            elif variant_n == "v5":
                s = scores()
                p = jnp.exp2(s * LOG2E - 40.0)
                r = jnp.sum(p, axis=1, keepdims=True)
                o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                            preferred_element_type=jnp.float32) / r
            elif variant_n == "v6":
                o_ref[0, 0] = jnp.zeros((T, D), o_ref.dtype)
                nblk = T // 128
                for i in range(nblk):
                    @pl.when(i * 128 < length)
                    def _(i=i):
                        qb = q[i * 128:(i + 1) * 128]
                        s = jax.lax.dot_general(
                            qb, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
                        key_ok = jax.lax.broadcasted_iota(
                            jnp.int32, (128, T), 1) < length
                        s = jnp.where(key_ok, s, jnp.float32(-1e9))
                        m = jnp.max(s, axis=1, keepdims=True)
                        p = jnp.exp2(s * LOG2E - m * LOG2E)
                        r = jnp.sum(p, axis=1, keepdims=True)
                        o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                                    preferred_element_type=jnp.float32) / r
                        o_ref[0, 0, i * 128:(i + 1) * 128] = \
                            o.astype(o_ref.dtype)
                return
            o_ref[0, 0] = o.astype(o_ref.dtype)
        return kernel

    spec = pl.BlockSpec((1, 1, T, D), lambda b, h, *_: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)

    def attn(variant, q, k, v, lengths):
        return pl.pallas_call(
            mk_kernel(variant),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(B, H),
                in_specs=[spec, spec, spec], out_specs=spec),
            out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        )(lengths, q, k, v)

    r = np.random.default_rng(0)
    qkv = jnp.asarray(r.standard_normal((3, B, H, T, D)), jnp.bfloat16)
    qkv_btHD = jnp.asarray(
        r.standard_normal((3, B, T, H, D)), jnp.bfloat16)
    lengths = jnp.full((B,), LEN, jnp.int32)

    def timed(f, *args):
        f = jax.jit(f)
        np.asarray(f(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3 / LAYERS

    for variant in ["v0", "b0", "b1", "b2", "b3", "b5", "b6"]:
        def f(qkv, lengths, _v=variant):
            def body(x, _):
                o = attn(_v, x[0], x[1], x[2], lengths)
                x = x.at[0].set(x[0] + 1e-6 * o)
                return x, None
            x, _ = jax.lax.scan(body, qkv, None, length=LAYERS)
            return x[0, :1, :1, :1, :1]
        ms = timed(f, qkv, lengths)
        print(f"{variant}: {ms:6.2f} ms/layer", flush=True)

    # transpose overhead: same chain but inputs (B, T, H, D), transposed
    # around each call like the production dit_backbone_forward
    def f_tr(qkv, lengths):
        def body(x, _):
            o = attn("v1", x[0].transpose(0, 2, 1, 3),
                     x[1].transpose(0, 2, 1, 3),
                     x[2].transpose(0, 2, 1, 3), lengths)
            x = x.at[0].set(x[0] + 1e-6 * o.transpose(0, 2, 1, 3))
            return x, None
        x, _ = jax.lax.scan(body, qkv_btHD, None, length=LAYERS)
        return x[0, :1, :1, :1, :1]
    ms = timed(f_tr, qkv_btHD, lengths)
    print(f"v1 + 4 transposes: {ms:6.2f} ms/layer", flush=True)


if __name__ == "__main__":
    main()

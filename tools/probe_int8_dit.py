"""Probe: W8A8 vs bf16 at the CFM's REAL layer shapes.

The 4096^3 probe measured int8 at 1.22x bf16 (94.6 vs 77.4 TF/s) on this
chip — far from the 2x spec ratio. This probe checks whether that ratio
holds at the DiT's actual shapes (M = B*T = 16*1152, D=512, inter=1536,
13 layers) plus the WaveNet in_layer conv (k=5 as matmul, K=2560), i.e.
whether an int8 CFM is worth building at all.

Run from /root/repo: timeout 3000 python tools/probe_int8_dit.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

M = 16 * 1152
D = 512
INTER = 1536
LAYERS = 13
STEPS = 8  # CFM Euler steps to simulate per timed call


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print("warm", flush=True)

    r = np.random.default_rng(0)

    def mk(k, n, dt):
        if dt == jnp.int8:
            return jnp.asarray(r.integers(-127, 127, (LAYERS, k, n)), jnp.int8)
        return jnp.asarray(r.standard_normal((LAYERS, k, n)) * 0.02, dt)

    shapes = [("qkv", D, 3 * D), ("wo", D, D), ("w1", D, INTER),
              ("w3", D, INTER), ("w2", INTER, D), ("wn_in", 5 * D, 2 * D)]

    Wbf = {nm: mk(k, n, jnp.bfloat16) for nm, k, n in shapes}
    Wi8 = {nm: mk(k, n, jnp.int8) for nm, k, n in shapes}
    wscale = {nm: jnp.full((LAYERS, 1, n), 0.02, jnp.float32)
              for nm, k, n in shapes}
    x0 = jnp.asarray(r.standard_normal((M, D)), jnp.bfloat16)

    flops_layer = 2 * M * (D * 3 * D + D * D + 2 * D * INTER + INTER * D
                           + 5 * D * 2 * D)
    flops = flops_layer * LAYERS * STEPS

    def bf_stack(x):
        def step(x, _):
            def body(h, w):
                a = lax.dot(h, w["qkv"], preferred_element_type=jnp.float32)
                h = h + lax.dot(a[:, :D].astype(jnp.bfloat16), w["wo"],
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
                u = lax.dot(h, w["w1"], preferred_element_type=jnp.float32)
                g = lax.dot(h, w["w3"], preferred_element_type=jnp.float32)
                f = (jax.nn.silu(u) * g).astype(jnp.bfloat16)
                h = h + lax.dot(f, w["w2"],
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
                wn = lax.dot(jnp.concatenate([h] * 5, -1), w["wn_in"],
                             preferred_element_type=jnp.float32)
                h = h + wn[:, :D].astype(jnp.bfloat16)
                return h, None
            x, _ = lax.scan(body, x, Wbf)
            return x, None
        out, _ = lax.scan(step, x, None, length=STEPS)
        return out

    def q(x):
        amax = jnp.maximum(jnp.max(jnp.abs(x), -1, keepdims=True), 1e-6
                           ).astype(jnp.float32)
        qx = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / amax)),
                      -127, 127).astype(jnp.int8)
        return qx, amax / 127.0

    def i8_stack(x):
        def step(x, _):
            def body(h, wpack):
                w, ws = wpack

                def dot(hq, hs, nm):
                    o = lax.dot(hq, w[nm], preferred_element_type=jnp.int32)
                    return o.astype(jnp.float32) * (hs * ws[nm])

                hq, hs = q(h)
                a = dot(hq, hs, "qkv")
                h = h + dot(*q(a[:, :D].astype(jnp.bfloat16)), "wo"
                            ).astype(jnp.bfloat16)
                hq, hs = q(h)
                u = dot(hq, hs, "w1")
                g = dot(hq, hs, "w3")
                f = (jax.nn.silu(u) * g).astype(jnp.bfloat16)
                h = h + dot(*q(f), "w2").astype(jnp.bfloat16)
                hq, hs = q(jnp.concatenate([h] * 5, -1))
                wn = dot(hq, hs, "wn_in")
                h = h + wn[:, :D].astype(jnp.bfloat16)
                return h, None
            x, _ = lax.scan(body, x, (Wi8, wscale))
            return x, None
        out, _ = lax.scan(step, x, None, length=STEPS)
        return out

    for label, fn in [("bf16", bf_stack), ("w8a8", i8_stack)]:
        jf = jax.jit(fn)
        jf(x0)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = jf(x0)
            np.asarray(out[:1, :1])
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best * 1e3:7.2f} ms  {flops / best / 1e12:6.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()

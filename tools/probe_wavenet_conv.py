"""Probe: WaveNet-head conv lowering at the real s2mel shape.

The WN head costs ~263 ms per 25-step CFM batch (~88-100 TF/s): 8 layers
of k=5 d=1 conv (B=16, T=1152, 512 -> 1024) + 1x1 res_skip (512 -> 1024).
Backbone matmuls at the same batch hit ~180 TF/s, so if the k=5 conv
lowers below that there may be ~80 ms on the table. Strategies:

  a) conv      — lax.conv_general_dilated NWC (as shipped, nn.conv1d)
  b) im2col    — 5 shifted slices -> (B, T, 5*512) @ (2560, 1024)
  c) sum-mm    — 5 separate (B, T, 512) @ (512, 1024) matmuls on shifted
                 views, summed (no concat materialization)

Each in a REPS-iteration lax.scan (dispatch amortized), min of 3,
readback-synced. Also cross-checks numerics.

Run from /root/repo: timeout 3000 python tools/probe_wavenet_conv.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B, T, CIN, COUT, K = 16, 1152, 512, 1024, 5
REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print("warm", flush=True)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, T, CIN)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(r.standard_normal((K, CIN, COUT)) * 0.02, jnp.bfloat16)
    pad = (K - 1) // 2

    def timed(f, *args):
        f = jax.jit(f)
        out = f(*args)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3 / REPS

    def conv(x):
        def step(h, _):
            y = lax.conv_general_dilated(
                h, w, (1,), [(pad, pad)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32)
            return (y[:, :, :CIN] + y[:, :, CIN:2 * CIN] * 1e-3
                    ).astype(h.dtype), None
        return lax.scan(step, x, None, length=REPS)[0][:, :1, :1]

    def im2col(x):
        wm = w.reshape(K * CIN, COUT)

        def step(h, _):
            hp = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
            cols = jnp.concatenate(
                [lax.dynamic_slice_in_dim(hp, j, T, 1) for j in range(K)],
                axis=-1)
            y = jnp.dot(cols, wm, preferred_element_type=jnp.float32)
            return (y[:, :, :CIN] + y[:, :, CIN:2 * CIN] * 1e-3
                    ).astype(h.dtype), None
        return lax.scan(step, x, None, length=REPS)[0][:, :1, :1]

    def summm(x):
        def step(h, _):
            hp = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
            y = None
            for j in range(K):
                hj = lax.dynamic_slice_in_dim(hp, j, T, 1)
                yj = jnp.dot(hj, w[j], preferred_element_type=jnp.float32)
                y = yj if y is None else y + yj
            return (y[:, :, :CIN] + y[:, :, CIN:2 * CIN] * 1e-3
                    ).astype(h.dtype), None
        return lax.scan(step, x, None, length=REPS)[0][:, :1, :1]

    gflop = 2 * B * T * K * CIN * COUT * 1e-9
    outs = {}
    for name, f in [("conv  ", conv), ("im2col", im2col), ("sum-mm", summm)]:
        t = timed(f, x)
        outs[name] = np.asarray(jax.jit(f)(x), np.float32)
        print(f"{name}: {t:6.2f} ms/conv ({gflop / t:6.1f} TF/s)", flush=True)
    for name in ("im2col", "sum-mm"):
        d = np.abs(outs[name] - outs["conv  "]).max()
        print(f"max |{name} - conv| {d:.3e}", flush=True)


if __name__ == "__main__":
    main()

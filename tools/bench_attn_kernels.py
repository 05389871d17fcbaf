"""Device A/B: single_block_attention (grid B*H) vs packed_pair_attention
(grid B, pair-packed full-tile matmuls) at the DiT serving shape.

Slope-timed: each kernel runs in a 13-layer and a 52-layer lax.scan inside
one jit; per-layer cost = (t52 - t13) / 39. The relay's fixed per-call
wall (~25 ms) cancels in the difference. Also cross-checks numerical
equality on device at bf16.

Run from /root/repo: timeout 3600 python tools/bench_attn_kernels.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B, H, T, D = 16, 8, 1152, 64
LEN = 896


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu.ops.pallas.attn import (packed_pair_attention,
                                              single_block_attention)

    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print("warm", flush=True)
    r = np.random.default_rng(0)
    qkv = jnp.asarray(r.standard_normal((3, B, T, H * D)), jnp.bfloat16)
    lengths = jnp.full((B,), LEN, jnp.int32)

    def timed(f, *args):
        f = jax.jit(f)
        np.asarray(f(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    def mk_old(layers):
        def f(qkv, lengths):
            def body(x, _):
                o = single_block_attention(
                    x[0].reshape(B, T, H, D).transpose(0, 2, 1, 3),
                    x[1].reshape(B, T, H, D).transpose(0, 2, 1, 3),
                    x[2].reshape(B, T, H, D).transpose(0, 2, 1, 3), lengths)
                o = o.transpose(0, 2, 1, 3).reshape(B, T, H * D)
                return x.at[0].set(x[0] + 1e-6 * o), None
            x, _ = jax.lax.scan(body, qkv, None, length=layers)
            return x[0, :1, :1, :1]
        return f

    def mk_new(layers):
        def f(qkv, lengths):
            def body(x, _):
                o = packed_pair_attention(x[0], x[1], x[2], lengths, heads=H)
                return x.at[0].set(x[0] + 1e-6 * o), None
            x, _ = jax.lax.scan(body, qkv, None, length=layers)
            return x[0, :1, :1, :1]
        return f

    # device numerical equality first (one call each)
    o_old = jax.jit(lambda a, l: single_block_attention(
        a[0].reshape(B, T, H, D).transpose(0, 2, 1, 3),
        a[1].reshape(B, T, H, D).transpose(0, 2, 1, 3),
        a[2].reshape(B, T, H, D).transpose(0, 2, 1, 3), l)
        .transpose(0, 2, 1, 3).reshape(B, T, H * D))(qkv, lengths)
    o_new = jax.jit(lambda a, l: packed_pair_attention(
        a[0], a[1], a[2], l, heads=H))(qkv, lengths)
    d = np.abs(np.asarray(o_old, np.float32)[:, :LEN]
               - np.asarray(o_new, np.float32)[:, :LEN])
    print(f"max |old - new| over valid rows: {d.max():.3e}", flush=True)

    for name, mk in [("old grid(B,H)", mk_old), ("new packed  ", mk_new)]:
        t13 = timed(mk(13), qkv, lengths)
        t52 = timed(mk(52), qkv, lengths)
        per = (t52 - t13) / 39
        print(f"{name}: {per * 1e3:6.2f} ms/layer  "
              f"[13L {t13 * 1e3:.1f} ms, 52L {t52 * 1e3:.1f} ms]", flush=True)


if __name__ == "__main__":
    main()

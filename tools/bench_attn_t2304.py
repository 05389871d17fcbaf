"""Device check: packed_pair_attention at the serving-cap DiT shape
(B=2 rows x CFG 2, T=2304 = 2048-mel bucket + 256 prompt) vs the dense
masked-softmax path it replaces there. Slope-timed (13 vs 52 scan layers).

Run from /root/repo: timeout 3000 python tools/bench_attn_t2304.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B, H, T, D = 4, 8, 2304, 64
LEN = 2200


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu import nn
    from indextts_tpu.ops.pallas.attn import packed_pair_attention

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

    def dense_one(a, l):
        q = a[0].reshape(B, T, H, D).transpose(0, 2, 1, 3)
        k = a[1].reshape(B, T, H, D).transpose(0, 2, 1, 3)
        v = a[2].reshape(B, T, H, D).transpose(0, 2, 1, 3)
        mask = (jnp.arange(T)[None, :] < l[:, None])[:, None, None, :]
        o = nn.mha(q, k, v, mask=mask)
        return o.transpose(0, 2, 1, 3).reshape(B, T, H * D)

    o_old = jax.jit(dense_one)(qkv, lengths)
    o_new = jax.jit(lambda a, l: packed_pair_attention(
        a[0], a[1], a[2], l, heads=H))(qkv, lengths)
    d = np.abs(np.asarray(o_old, np.float32)[:, :LEN]
               - np.asarray(o_new, np.float32)[:, :LEN])
    print(f"max |dense - packed| over valid rows: {d.max():.3e}", flush=True)

    def mk(fn):
        def f(layers):
            def g(qkv, lengths):
                def body(x, _):
                    o = fn(x, lengths)
                    return x.at[0].set(x[0] + 1e-6 * o), None
                x, _ = jax.lax.scan(body, qkv, None, length=layers)
                return x[0, :1, :1, :1]
            return g
        return f

    new_fn = mk(lambda a, l: packed_pair_attention(a[0], a[1], a[2], l,
                                                   heads=H))
    old_fn = mk(dense_one)
    for name, m in [("dense ", old_fn), ("packed", new_fn)]:
        t13 = timed(m(13), qkv, lengths)
        t52 = timed(m(52), qkv, lengths)
        per = (t52 - t13) / 39
        print(f"{name}: {per * 1e3:6.2f} ms/layer  "
              f"[13L {t13 * 1e3:.1f} ms, 52L {t52 * 1e3:.1f} ms]", flush=True)


if __name__ == "__main__":
    main()

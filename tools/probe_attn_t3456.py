"""Device probe: packed_pair_attention past the r3 T<=3072 gate.

The r5 mel-bucket fix extended the serving envelope to 2688 target frames;
with the 512/768-frame prompt buckets the serving-cap DiT runs at
T in {3200, 3456} — past the old gate, so it silently fell back to DENSE
attention exactly where attention is most expensive (T^2). This probes
compile + speed + parity of the packed kernel at those shapes (B=2 =
single segment x CFG 2, the serving-cap batch).

Run from /root/repo: timeout 3000 python tools/probe_attn_t3456.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

H, D = 8, 64


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu import nn
    from indextts_tpu.ops.pallas.attn import packed_pair_attention

    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print("warm", flush=True)

    for B, T in ((2, 3200), (2, 3456), (4, 3200)):
        LEN = T - 100
        r = np.random.default_rng(0)
        qkv = jnp.asarray(r.standard_normal((3, B, T, H * D)), jnp.bfloat16)
        lengths = jnp.full((B,), LEN, jnp.int32)

        def dense_one(a, l):
            q = a[0].reshape(B, T, H, D).transpose(0, 2, 1, 3)
            k = a[1].reshape(B, T, H, D).transpose(0, 2, 1, 3)
            v = a[2].reshape(B, T, H, D).transpose(0, 2, 1, 3)
            mask = (jnp.arange(T)[None, :] < l[:, None])[:, None, None, :]
            o = nn.mha(q, k, v, mask=mask)
            return o.transpose(0, 2, 1, 3).reshape(B, T, H * D)

        def packed_one(a, l):
            return packed_pair_attention(a[0], a[1], a[2], l, heads=H)

        try:
            o_new = jax.jit(packed_one)(qkv, lengths)
            o_old = jax.jit(dense_one)(qkv, lengths)
            d = np.abs(np.asarray(o_old, np.float32)[:, :LEN]
                       - np.asarray(o_new, np.float32)[:, :LEN])
            print(f"B={B} T={T}: max |dense - packed| {d.max():.3e}",
                  flush=True)
        except Exception as e:
            print(f"B={B} T={T}: packed FAILED to compile/run: {e!r}",
                  flush=True)
            continue

        # slope-timed: 13 vs 39 stacked layers in one scan
        def mk(fn, layers):
            def g(a, l):
                def body(x, _):
                    o = fn((x, a[1], a[2]), l)
                    return o.astype(x.dtype), None
                x, _ = jax.lax.scan(body, a[0], jnp.arange(layers))
                return x[:1, :1, :1]
            return jax.jit(g)

        for name, fn in (("packed", packed_one), ("dense", dense_one)):
            ts = {}
            for layers in (13, 39):
                f = mk(fn, layers)
                np.asarray(f(qkv, lengths))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(f(qkv, lengths))
                    best = min(best, time.perf_counter() - t0)
                ts[layers] = best
            per_layer = (ts[39] - ts[13]) / 26
            print(f"B={B} T={T} {name}: {per_layer * 1e3:.2f} ms/layer "
                  f"(13L {ts[13] * 1e3:.1f} ms, 39L {ts[39] * 1e3:.1f} ms)",
                  flush=True)


if __name__ == "__main__":
    main()

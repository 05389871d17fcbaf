"""Device A/B: XLA-side rope + packed attention vs the rope-fused kernel,
in a model-like chain (wqkv matmul -> split -> attention -> wo matmul) so
the rope's narrow-lane elementwise traffic and kernel-boundary layouts are
measured, not just the kernel body. Slope-timed 13 vs 52 scan layers.

Run from /root/repo: timeout 3000 python tools/bench_attn_rope.py
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
                                              packed_pair_attention_rope)
    from indextts_tpu.ops.rope import (apply_rotary_emb_half,
                                       precompute_freqs_cis)

    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print("warm", flush=True)
    r = np.random.default_rng(0)
    HD = H * D
    x0 = jnp.asarray(r.standard_normal((B, T, HD)), jnp.bfloat16)
    wqkv = jnp.asarray(r.standard_normal((HD, 3 * HD)) * 0.02, jnp.bfloat16)
    wo = jnp.asarray(r.standard_normal((HD, HD)) * 0.02, jnp.bfloat16)
    lengths = jnp.full((B,), LEN, jnp.int32)
    freqs = jnp.asarray(precompute_freqs_cis(T, D))

    def timed(f, *args):
        f = jax.jit(f)
        np.asarray(f(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    def attn_xla_rope(x, lengths):
        qkv = jnp.dot(x, wqkv, preferred_element_type=jnp.float32
                      ).astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = apply_rotary_emb_half(q.reshape(B, T, H, D), freqs)
        k = apply_rotary_emb_half(k.reshape(B, T, H, D), freqs)
        out = packed_pair_attention(q.reshape(B, T, HD),
                                    k.reshape(B, T, HD),
                                    v, lengths, heads=H)
        return jnp.dot(out, wo, preferred_element_type=jnp.float32
                       ).astype(x.dtype)

    def attn_fused_rope(x, lengths):
        qkv = jnp.dot(x, wqkv, preferred_element_type=jnp.float32
                      ).astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = packed_pair_attention_rope(q, k, v, lengths, freqs, heads=H)
        return jnp.dot(out, wo, preferred_element_type=jnp.float32
                       ).astype(x.dtype)

    o1 = jax.jit(attn_xla_rope)(x0, lengths)
    o2 = jax.jit(attn_fused_rope)(x0, lengths)
    d = np.abs(np.asarray(o1, np.float32)[:, :LEN]
               - np.asarray(o2, np.float32)[:, :LEN])
    print(f"max |xla-rope - fused-rope| over valid rows: {d.max():.3e}",
          flush=True)

    def mk(fn):
        def f(layers):
            def g(x, lengths):
                def body(xc, _):
                    return xc + 1e-3 * fn(xc, lengths), None
                xc, _ = jax.lax.scan(body, x, None, length=layers)
                return xc[:1, :1, :1]
            return g
        return f

    for name, fn in [("xla rope  ", attn_xla_rope),
                     ("fused rope", attn_fused_rope)]:
        m = mk(fn)
        t13 = timed(m(13), x0, lengths)
        t52 = timed(m(52), x0, lengths)
        per = (t52 - t13) / 39
        print(f"{name}: {per * 1e3:6.2f} ms/layer  "
              f"[13L {t13 * 1e3:.1f} ms, 52L {t52 * 1e3:.1f} ms]",
              flush=True)


if __name__ == "__main__":
    main()

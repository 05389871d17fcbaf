"""Per-op BigVGAN conv micro-profile: as-is vs rewritten formulations.

Hypotheses for the 546 ms conv floor (21% MXU efficiency):
  1. conv_transpose via lhs_dilation zero-stuffs the input (u x wasted
     flops) -> subpixel rewrite: dense conv producing u*Cout channels +
     depth-to-space reshape.
  2. narrow-channel stages (C <= 128) waste MXU lanes -> time-fold rewrite:
     (B, T, C) -> (B, T/f, f*C) with a block-structured folded kernel.
Each variant runs R times in-graph (lax.scan) to beat the ~4 ms dispatch
floor. Run from /root/repo: timeout 3000 python tools/bench_bigvgan_ops.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

R = 20


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    r = np.random.default_rng(0)

    def timed(label, fn, *args):
        @jax.jit
        def loop(*a):
            def body(c, _):
                # the op input depends on the carry (blocks loop-invariant
                # hoisting) and the carry on the output (blocks DCE); the
                # 1e-12 scales keep both from constant-folding
                x = a[0] + (c[0] * 1e-12).astype(a[0].dtype)
                out = fn(x, *a[1:-1], c)
                return (c + out.reshape(-1)[:c.shape[0]].astype(c.dtype)
                        * 1e-12), None
            c, _ = jax.lax.scan(body, a[-1], None, length=R)
            return c
        t0 = time.perf_counter()
        out = loop(*args)
        np.asarray(out[:1])
        first = time.perf_counter() - t0
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(*args)
            np.asarray(out[:1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: {best / R * 1e3:.2f} ms/op (first {first:.0f}s)",
              flush=True)
        return best / R

    B = 4

    # ---- 1. conv_transpose stage 1: (B, 1088, 1536) -> (B, 4352, 768) ----
    T, Cin, Cout, k, u = 1088, 1536, 768, 8, 4
    x = jnp.asarray(r.standard_normal((B, T, Cin)), jnp.bfloat16)
    w = jnp.asarray(r.standard_normal((k, Cin, Cout)) * 0.02, jnp.bfloat16)
    carry = jnp.zeros((128,), jnp.float32)

    def convt_asis(x, w, c):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(k - u - (k - u) // 2,
                                                 k - u - (k - u) // 2)],
            lhs_dilation=(u,), dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    # subpixel: taps for output phase r are w[r::u] reversed — here we only
    # compare SPEED, so a same-shape reorganized kernel is sufficient
    k2 = k // u
    w_sub = jnp.asarray(
        r.standard_normal((k2, Cin, u * Cout)) * 0.02, jnp.bfloat16)

    def convt_subpixel(x, w, c):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(1, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        return y.reshape(B, T * u, Cout)

    t_a = timed("convT s1 as-is (lhs_dilation)", convt_asis, x, w, carry)
    t_b = timed("convT s1 subpixel", convt_subpixel, x, w_sub, carry)
    print(f"  -> subpixel speedup {t_a / t_b:.2f}x")

    # ---- 2. narrow-channel resblock conv: stage 6 (C=24, T=278528) -------
    # fold to C' = f*C >= 384 lanes (first sweep at C' = 192 showed narrow
    # lanes still dominate)
    for (C, Tn, kn, f) in ((24, 16384 * 17, 11, 16), (48, 8192 * 17, 7, 8),
                           (96, 4096 * 17, 3, 4), (192, 2048 * 17, 11, 2)):
        xn = jnp.asarray(r.standard_normal((B, Tn, C)), jnp.bfloat16)
        wn = jnp.asarray(r.standard_normal((kn, C, C)) * 0.05, jnp.bfloat16)

        def conv_asis(x, w, c):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(1,), padding=[((kn - 1) // 2,) * 2],
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32).astype(x.dtype)

        kf = (kn - 1) // f + 2  # folded kernel width
        wf = jnp.asarray(r.standard_normal((kf, f * C, f * C)) * 0.05,
                         jnp.bfloat16)

        def conv_folded(x, w, c):
            xf = x.reshape(B, Tn // f, f * C)
            y = jax.lax.conv_general_dilated(
                xf, w, window_strides=(1,), padding=[(kf // 2, kf - 1 - kf // 2)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32).astype(x.dtype)
            return y.reshape(B, Tn, C)

        t_a = timed(f"res conv C={C} k={kn} as-is", conv_asis, xn, wn, carry)
        t_b = timed(f"res conv C={C} k={kn} folded f={f} (k'={kf})",
                    conv_folded, xn, wf, carry)
        flops_ratio = kf * f / kn
        print(f"  -> folded wall speedup {t_a / t_b:.2f}x "
              f"(runs {flops_ratio:.2f}x the flops)")

    # ---- 3. dilated conv: d=5, k=7, C=48 ---------------------------------
    C, Tn, kn, d = 48, 8192 * 17, 7, 5
    xn = jnp.asarray(r.standard_normal((B, Tn, C)), jnp.bfloat16)
    wn = jnp.asarray(r.standard_normal((kn, C, C)) * 0.05, jnp.bfloat16)

    def dconv_asis(x, w, c):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[((kn * d - d) // 2,) * 2],
            rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    t_a = timed(f"dilated conv C={C} k={kn} d={d} as-is", dconv_asis, xn, wn,
                carry)

    # folded dilated: span (k-1)*d folds into k'' rows of a dense
    # (k'', f*C, f*C) block kernel (structure zeroed; speed-only here)
    f = 8
    span = (kn - 1) * d
    kf2 = span // f + 2
    wf2 = jnp.asarray(r.standard_normal((kf2, f * C, f * C)) * 0.05,
                      jnp.bfloat16)

    def dconv_folded(x, w, c):
        xf = x.reshape(B, Tn // f, f * C)
        y = jax.lax.conv_general_dilated(
            xf, w, window_strides=(1,), padding=[(kf2 // 2, kf2 - 1 - kf2 // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        return y.reshape(B, Tn, C)

    t_b = timed(f"dilated conv folded f={f} (k''={kf2})", dconv_folded, xn,
                wf2, carry)
    print(f"  -> folded wall speedup {t_a / t_b:.2f}x "
          f"(runs {kf2 * f / kn:.2f}x the flops)")

    # ---- 4. matmul formulation of the folded k'=2 conv -------------------
    C, Tn, kn, f = 24, 16384 * 17, 11, 16
    M = Tn // f
    xn = jnp.asarray(r.standard_normal((B, M, f * C)), jnp.bfloat16)
    wa = jnp.asarray(r.standard_normal((f * C, f * C)) * 0.05, jnp.bfloat16)
    wb = jnp.asarray(r.standard_normal((f * C, f * C)) * 0.05, jnp.bfloat16)

    def conv_as_two_matmuls(x, wa, wb, c):
        y = jnp.einsum("bmk,kn->bmn", x, wa,
                       preferred_element_type=jnp.float32)
        xs = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        y = y + jnp.einsum("bmk,kn->bmn", xs, wb,
                           preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    t_c = timed(f"folded k'=2 as two matmuls (C'={f * C})",
                conv_as_two_matmuls, xn, wa, wb, carry)
    flops = 2 * 2 * B * M * (f * C) ** 2
    print(f"  -> {flops / t_c / 1e12:.1f} TF/s")

    # raw matmul ceiling at this shape
    x2 = xn.reshape(B * M, f * C)

    def raw_matmul(x, wa, c):
        return jnp.dot(x, wa, preferred_element_type=jnp.float32).astype(x.dtype)

    t_d = timed("raw (B*M, 384)@(384,384) matmul", raw_matmul, x2, wa, carry)
    print(f"  -> {2 * B * M * (f * C) ** 2 / t_d / 1e12:.1f} TF/s")


if __name__ == "__main__":
    main()

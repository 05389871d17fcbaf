"""Probe: lowering strategies for BigVGAN's narrow-channel convs.

Round-3 stage profile (tools/profile_bigvgan_stages.py, B=4, mel 1088):
up4 (C=48) +94.5 ms, up5 (C=24) +151.4 ms — together ~48% of the vocoder
at <1 TF/s effective (the MXU runs N=24-lane matmuls per conv tap). The
time-folded matmul rewrite (ops/fold_conv.py) lost in-model to broken
fusions, so this probes XLA-only alternatives at the real shapes:

  a) plain     — nn.conv1d as shipped (NWC conv_general_dilated)
  b) im2col    — concat k dilated shifts into (B, T, k*C), one matmul
  c) grouped   — the 3 MRF resblocks' convs (k=3/7/11, same dilation)
     zero-padded to k=11 and run as ONE feature_group_count=3 conv on a
     (B, T, 3C) tensor (1.57x FLOPs, 3x lane occupancy)
  d) g-im2col  — grouped im2col: unfold (B, T, 3C) once, 3 matmuls

Each strategy is timed in an 8-iteration lax.scan chain (dispatch
amortized, readback-synced), min of 3.

Run from /root/repo: timeout 3600 python tools/probe_narrow_conv.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B = 4
SHAPES = [(24, 139264), (48, 69632), (96, 34816)]   # up5..up3 at mel 1088
KD = [(11, 5), (11, 1), (7, 3), (3, 1)]
REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print("warm", flush=True)
    r = np.random.default_rng(0)

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

    for C, T in SHAPES:
        x = jnp.asarray(r.standard_normal((B, T, C)) * 0.1, jnp.bfloat16)
        x3 = jnp.asarray(r.standard_normal((B, T, 3 * C)) * 0.1, jnp.bfloat16)
        print(f"--- C={C} T={T} ---", flush=True)
        for k, d in KD:
            pad = (k - 1) * d // 2
            w = jnp.asarray(r.standard_normal((k, C, C)) * 0.05, jnp.bfloat16)
            w3 = jnp.asarray(
                r.standard_normal((k, 3 * C, C)) * 0.05, jnp.bfloat16)

            def plain(x, w=w, k=k, d=d, pad=pad):
                def step(h, _):
                    y = lax.conv_general_dilated(
                        h, w, (1,), [(pad, pad)], rhs_dilation=(d,),
                        dimension_numbers=("NWC", "WIO", "NWC"),
                        preferred_element_type=jnp.float32)
                    return y.astype(h.dtype), None
                return lax.scan(step, x, None, length=REPS)[0][:, :1, :1]

            def im2col(x, w=w, k=k, d=d, pad=pad):
                wm = w.reshape(k * C, C)

                def step(h, _):
                    hp = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
                    cols = jnp.concatenate(
                        [lax.dynamic_slice_in_dim(hp, j * d, h.shape[1], 1)
                         for j in range(k)], axis=-1)
                    y = jnp.einsum("btk,kc->btc", cols, wm,
                                   preferred_element_type=jnp.float32)
                    return y.astype(h.dtype), None
                return lax.scan(step, x, None, length=REPS)[0][:, :1, :1]

            # grouped: 3 resblocks' convs (k=3/7/11 all padded to 11), one
            # feature_group_count=3 conv at the shared dilation d
            kmax = 11
            padg = (kmax - 1) * d // 2
            wg = jnp.asarray(
                r.standard_normal((kmax, C, 3 * C)) * 0.05, jnp.bfloat16)

            def grouped(x3, wg=wg, d=d, padg=padg):
                def step(h, _):
                    y = lax.conv_general_dilated(
                        h, wg, (1,), [(padg, padg)], rhs_dilation=(d,),
                        dimension_numbers=("NWC", "WIO", "NWC"),
                        feature_group_count=3,
                        preferred_element_type=jnp.float32)
                    return y.astype(h.dtype), None
                return lax.scan(step, x3, None, length=REPS)[0][:, :1, :1]

            def g_im2col(x3, wg=wg, d=d, padg=padg, kmax=kmax, C=C):
                wms = [wg[:, :, g * C:(g + 1) * C].reshape(kmax * C, C)
                       for g in range(3)]

                def step(h, _):
                    hp = jnp.pad(h, ((0, 0), (padg, padg), (0, 0)))
                    outs = []
                    for g in range(3):
                        hg = hp[:, :, g * C:(g + 1) * C]
                        cols = jnp.concatenate(
                            [lax.dynamic_slice_in_dim(hg, j * d,
                                                      h.shape[1], 1)
                             for j in range(kmax)], axis=-1)
                        y = jnp.einsum("btk,kc->btc", cols, wms[g],
                                       preferred_element_type=jnp.float32)
                        outs.append(y)
                    return jnp.concatenate(outs, -1).astype(h.dtype), None
                return lax.scan(step, x3, None, length=REPS)[0][:, :1, :1]

            gflop = 2 * B * T * k * C * C * 1e-9
            ta = timed(plain, x)
            tb = timed(im2col, x)
            tc = timed(grouped, x3)  # covers 3 convs: /3 for per-conv
            td = timed(g_im2col, x3)
            print(f"k={k:2d} d={d}: plain {ta:7.2f} ms ({gflop / ta:5.2f} TF/s)"
                  f"  im2col {tb:7.2f}"
                  f"  grouped/3 {tc / 3:7.2f}  g-im2col/3 {td / 3:7.2f}",
                  flush=True)


if __name__ == "__main__":
    main()

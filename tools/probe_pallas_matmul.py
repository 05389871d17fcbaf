"""Probe: Pallas vs XLA matmul throughput at attention-kernel shapes.

The relay-attached chip has a large, NOISY fixed per-call wall (~25-30 ms
regardless of payload in earlier versions of this probe), so absolute
one-call timings are useless for microbenchmarks. This version measures
the SLOPE: each shape runs its 128-step loop once and four times inside
one jit, and the per-step cost is (t4 - t1) / (3 * 128). Outputs are
reduced in place (sum over M to an (8, N) tile) so no (M, N) result hits
HBM.

Shapes (all bf16 in, f32 accumulate):

  A (1152,   64) @ (  64, 1152)   current attention scores (K=64)
  B (1152,  128) @ ( 128, 2304)   2-head block-diag packed scores
  C (1152, 1152) @ (1152,   64)   current PV (N=64)
  D (1152, 2304) @ (2304,  128)   2-head packed PV
  E (1152,  512) @ ( 512, 1536)   backbone-like (all dims >= 4 tiles)

Run from /root/repo: timeout 3600 python tools/probe_pallas_matmul.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

REPS = 128


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print("warm", flush=True)
    r = np.random.default_rng(0)

    SHAPES = {
        "A scores K=64  ": (1152, 64, 1152),
        "B packed scores": (1152, 128, 2304),
        "C pv N=64      ": (1152, 1152, 64),
        "D packed pv    ": (1152, 2304, 128),
        "E backbone-like": (1152, 512, 1536),
    }

    def timed(f, *args):
        f = jax.jit(f)
        np.asarray(f(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    for name, (M, K, N) in SHAPES.items():
        a = jnp.asarray(r.standard_normal((REPS, M, K)) * 0.1, jnp.bfloat16)
        b = jnp.asarray(r.standard_normal((REPS, K, N)) * 0.1, jnp.bfloat16)
        gflop_step = 2 * M * K * N * 1e-9

        def pallas_kernel(a_ref, b_ref, o_ref, *, M=M, N=N):
            res = jax.lax.dot_general(
                a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0] = jnp.sum(res.reshape(M // 8, 8, N), axis=0)

        def mk_pallas(rounds):
            def run(a, b):
                out = pl.pallas_call(
                    pallas_kernel,
                    grid=(rounds * REPS,),
                    in_specs=[
                        pl.BlockSpec((1, M, K), lambda i: (i % REPS, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, K, N), lambda i: (i % REPS, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, 8, N),
                                           lambda i: (i % REPS, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((REPS, 8, N),
                                                   jnp.float32),
                )(a, b)
                return out[:1, :1, :1]
            return run

        def mk_xla(rounds):
            def run(a, b):
                def step(carry, ab):
                    y = jax.lax.dot_general(
                        ab[0], ab[1], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return (carry + jnp.sum(y.reshape(M // 8, 8, N), axis=0),
                            None)
                carry = jnp.zeros((8, N), jnp.float32)
                for _ in range(rounds):
                    carry, _ = jax.lax.scan(step, carry, (a, b))
                return carry[:1, :1]
            return run

        tp1 = timed(mk_pallas(1), a, b)
        tp4 = timed(mk_pallas(4), a, b)
        tx1 = timed(mk_xla(1), a, b)
        tx4 = timed(mk_xla(4), a, b)
        sp = (tp4 - tp1) / (3 * REPS)
        sx = (tx4 - tx1) / (3 * REPS)
        print(f"{name}: pallas {sp * 1e6:7.1f} us/step "
              f"({gflop_step / max(sp, 1e-9) / 1e3:6.1f} TF/s) "
              f"[{tp1 * 1e3:.1f}/{tp4 * 1e3:.1f}]   "
              f"xla {sx * 1e6:7.1f} us/step "
              f"({gflop_step / max(sx, 1e-9) / 1e3:6.1f} TF/s) "
              f"[{tx1 * 1e3:.1f}/{tx4 * 1e3:.1f}]",
              flush=True)


if __name__ == "__main__":
    main()

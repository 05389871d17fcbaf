"""Backend/device diagnostics (the TPU analogue of reference `tools/gpu_check.py`)."""

from __future__ import annotations

import sys


def main():
    print("== indextts_tpu device check ==")
    try:
        import jax

        print(f"jax {jax.__version__}")
        devs = jax.devices()
        for d in devs:
            print(f"  device: {d.platform} {d.device_kind} id={d.id}")
        backend = jax.default_backend()
        print(f"default backend: {backend}")
        import jax.numpy as jnp

        y = jax.jit(lambda x: (x @ x).sum())(jnp.ones((256, 256), jnp.bfloat16))
        print(f"smoke matmul OK: {float(y):.1f}")
    except Exception as e:
        print(f"JAX unavailable or failing: {e!r}", file=sys.stderr)
        return 1
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy", "scipy",
                "transformers"):
        try:
            __import__(mod)
            print(f"ok: {mod}")
        except ImportError:
            print(f"missing: {mod}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""One-shot PyTorch -> native JAX checkpoint conversion CLI.

    python tools/convert_checkpoints.py --model-dir checkpoints \
        --out-dir checkpoints/jax

Reads the reference model dir layout (config.yaml, gpt.pth, s2mel.pth,
hf_cache/...) and writes npz param trees; serving then never imports torch.
"""

from __future__ import annotations

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="checkpoints")
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()
    out_dir = args.out_dir or f"{args.model_dir}/jax"

    from indextts_tpu.utils.checkpoint import convert_model_dir

    written = convert_model_dir(args.model_dir, out_dir)
    if not written:
        print("no checkpoints found to convert", file=sys.stderr)
        return 1
    for name, path in written.items():
        print(f"{name}: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

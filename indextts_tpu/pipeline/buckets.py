"""Length bucketing: the compile-management layer.

Everything under jit is static-shape; variable-length inputs (prompts, text
segments, generated code counts) are padded up to the nearest bucket so a
handful of compiles serve the whole workload. This is the TPU analogue of the
reference's CUDA-graph batch-size buckets (`accel_engine.py:221-310`) extended
to sequence lengths.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (last bucket if none fits — callers must cap)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def pad_to(x: np.ndarray, length: int, axis: int = -1, value=0) -> np.ndarray:
    axis = axis % x.ndim
    cur = x.shape[axis]
    if cur == length:
        return x
    if cur > length:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, length)
        return x[tuple(sl)]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, length - cur)
    return np.pad(x, pad, constant_values=value)

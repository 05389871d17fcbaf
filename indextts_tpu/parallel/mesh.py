"""Device mesh construction and sharding policy.

New capability vs the reference (which has no distributed execution on its hot
path, SURVEY.md §2.11): scale via `jax.sharding.Mesh` + GSPMD. Axes:

- ``dp``  — data/batch parallel: segments/batch rows across chips (the TPU
  analogue of the reference's single-device `bucket_segments`)
- ``tp``  — tensor parallel: attention heads + MLP hidden of the GPT and DiT
  sharded across chips; XLA inserts the all-reduces over ICI
- ``sp``  — sequence/context parallel for very long DiT sequences: the
  mel-time axis of the CFM/DiT activations is sharded over ``sp`` and GSPMD
  partitions the backbone spatially (attention score rows, FFN, WaveNet
  convs with halo exchange), inserting the k/v all-gather over ICI. Off
  (size 1 / absent) by default; `make_mesh(sp=...)` opts in.

Single chip degenerates to a 1x1 mesh with zero collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: Optional[int] = None,
              devices=None, sp: int = 1) -> Mesh:
    """Factor devices into a (dp, tp) mesh — or (dp, sp, tp) when ``sp`` > 1.
    tp defaults to the largest power-of-two divisor <= 8 that divides the
    device count (heads are typically divisible by 4/8; 20 heads -> tp in
    {1,2,4}). sp=1 keeps the historical two-axis mesh so existing (dp, tp)
    PartitionSpecs are unaffected."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if tp is None:
        tp = 1
        for cand in (8, 4, 2):
            if n % cand == 0 and (n // cand) % max(sp, 1) == 0:
                tp = cand
                break
    if n == 0:
        raise ValueError("make_mesh: no devices available (requested "
                         f"n_devices={n_devices})")
    if tp <= 0 or sp <= 0 or n % (tp * sp) != 0:
        raise ValueError(
            f"make_mesh: tp={tp} * sp={sp} does not divide the device "
            f"count {n}; pick factors of {n}")
    dp = n // (tp * sp)
    if sp > 1:
        arr = np.asarray(devices).reshape(dp, sp, tp)
        return Mesh(arr, axis_names=("dp", "sp", "tp"))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over dp."""
    return NamedSharding(mesh, P("dp"))


def seq_sharding(mesh: Mesh) -> Optional[NamedSharding]:
    """(B, T, C) sharding with the time axis over sp (and batch over dp).
    None when the mesh has no sp axis — callers skip sequence parallelism."""
    if "sp" not in mesh.axis_names:
        return None
    return NamedSharding(mesh, P("dp", "sp", None))


def _spec_for_path(path: str, leaf) -> P:
    """Tensor-parallel PartitionSpec for a GPT/DiT param by its tree path.

    Megatron-style: qkv/up projections column-parallel (shard output dim),
    out/down projections row-parallel (shard input dim). Stacked GPT layers
    have a leading L axis -> shift specs right by one.
    """
    ndim = getattr(leaf, "ndim", 0)

    def spec(*names):
        return P(*names)

    # stacked gpt layers: (L, in, out) kernels / (L, out) biases. int8
    # quantized trees store the kernel as "q" with a per-channel "scale"
    # shaped like the bias — shard them the same way.
    if ".h." in path or path.startswith("h."):
        if "c_attn" in path and ndim == 4:
            # tp-kernel storage (L, D, 3, D): last-axis shards are
            # head-aligned (q_t | k_t | v_t) — decode_step_tp.gpt_tp_layout
            return spec(None, None, None, "tp")
        if "c_attn" in path and path.endswith(("bias", "scale")) and ndim == 3:
            return spec(None, None, "tp")
        if "c_attn" in path or "c_fc" in path:
            if path.endswith(("kernel", "q", "q4")) and ndim == 3:
                return spec(None, None, "tp")
            if path.endswith(("bias", "scale")) and ndim == 2:
                return spec(None, "tp")
        if "c_proj" in path and path.endswith(("kernel", "q", "q4")) and ndim == 3:
            # int4 "q4" packs contraction rows in 640-original-row groups;
            # tp shards at multiples of 320 packed rows, so every shard
            # holds whole groups and unpacks independently.
            return spec(None, "tp", None)
        return spec()
    # DiT layers (scan-stacked: (L, in, out) kernels; unstacked 2D kept for
    # compatibility with ad-hoc trees)
    if "wqkv" in path or path.endswith("ff.w1.kernel") or path.endswith("ff.w3.kernel"):
        if path.endswith("kernel") and ndim == 3:
            return spec(None, None, "tp")
        if path.endswith("kernel") and ndim == 2:
            return spec(None, "tp")
    if "attn.wo" in path or path.endswith("ff.w2.kernel"):
        if path.endswith("kernel") and ndim == 3:
            return spec(None, "tp", None)
        if path.endswith("kernel") and ndim == 2:
            return spec("tp", None)
    return spec()


def gpt_param_shardings(mesh: Mesh, params):
    """NamedShardings for a UnifiedVoice/GPT param tree (tp over heads/mlp)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def name_of(kp):
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
        return ".".join(parts)

    shardings = [NamedSharding(mesh, _spec_for_path(name_of(kp), leaf))
                 for kp, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_tree(mesh: Mesh, params, shardings=None):
    """Place a param tree onto the mesh (replicated by default)."""
    if shardings is None:
        shardings = jax.tree_util.tree_map(lambda _: replicated(mesh), params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings)

"""Native checkpoint I/O for converted/trained params.

Two formats:
- Orbax (directory): the canonical format for TPU serving/training
  (replaces the reference's four torch loader families, SURVEY.md §5.4).
- npz (single file): light, dependency-free interchange.

``convert_model_dir`` performs the one-shot PyTorch -> JAX conversion of a
reference checkpoint directory into an Orbax store, so serving never touches
torch again.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_params_npz(path: str, params: Dict[str, Any]) -> None:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)

    def name_of(kp):
        parts = []
        for k in kp:
            if hasattr(k, "key"):        # DictKey
                parts.append(str(k.key))
            elif hasattr(k, "idx"):      # SequenceKey / FlattenedIndexKey
                parts.append(str(k.idx))
            elif hasattr(k, "name"):     # GetAttrKey (namedtuple opt states)
                parts.append(str(k.name))
            else:
                parts.append(str(k))
        return "/".join(parts)

    arrays = {name_of(kp): np.asarray(v) for kp, v in flat}
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez(path, **arrays)


def load_params_npz(path: str, like: Dict[str, Any]) -> Dict[str, Any]:
    """Load into the structure of ``like`` (tree-def donor)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)

    def name_of(kp):
        parts = []
        for k in kp:
            if hasattr(k, "key"):        # DictKey
                parts.append(str(k.key))
            elif hasattr(k, "idx"):      # SequenceKey / FlattenedIndexKey
                parts.append(str(k.idx))
            elif hasattr(k, "name"):     # GetAttrKey (namedtuple opt states)
                parts.append(str(k.name))
            else:
                parts.append(str(k))
        return "/".join(parts)

    leaves = [data[name_of(kp)] for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_params_orbax(path: str, params: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_params_orbax(path: str, like: Optional[Dict[str, Any]] = None):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            targets = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), like)
            return ckptr.restore(os.path.abspath(path), targets)
        return ckptr.restore(os.path.abspath(path))


def convert_model_dir(model_dir: str, out_dir: str, cfg=None) -> Dict[str, str]:
    """One-shot reference-checkpoint-dir -> native JAX checkpoint conversion."""
    from indextts_tpu.config import IndexTTS2Config, load_config
    from indextts_tpu.utils import convert

    cfg_path = os.path.join(model_dir, "config.yaml")
    if cfg is None:
        cfg = load_config(cfg_path) if os.path.exists(cfg_path) else IndexTTS2Config()
    os.makedirs(out_dir, exist_ok=True)
    written = {}

    def maybe(name, src, fn):
        p = os.path.join(model_dir, src)
        if os.path.exists(p):
            sd = convert.load_torch_state_dict(p)
            params = fn(sd)
            out = os.path.join(out_dir, f"{name}.npz")
            save_params_npz(out, params)
            written[name] = out

    maybe("gpt", cfg.gpt_checkpoint,
          lambda sd: convert.convert_unified_voice(sd, cfg.gpt))
    maybe("s2mel", cfg.s2mel_checkpoint,
          lambda sd: convert.convert_s2mel(sd, cfg.s2mel))
    maybe("semantic_codec", "hf_cache/semantic_codec_model.safetensors",
          lambda sd: convert.convert_repcodec(sd, cfg.semantic_codec))
    maybe("campplus", "hf_cache/campplus_cn_common.bin", convert.convert_campplus)
    maybe("bigvgan", "hf_cache/bigvgan/bigvgan_generator.pt",
          lambda sd: convert.convert_bigvgan(sd, cfg.bigvgan))
    maybe("w2vbert", "hf_cache/w2v-bert-2.0/model.safetensors",
          lambda sd: convert.convert_w2vbert(sd, cfg.w2v_bert))
    return written

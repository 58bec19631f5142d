"""Checkpointing (orbax) + pretrained-torch weight conversion.

Replaces the reference checkpoint layer (`/root/reference/code/mmcv/mmcv/
runner/checkpoint.py`, `hooks/checkpoint.py`): per-epoch orbax saves with
train-state + meta (epoch/step), ``--resume-from`` restore, and a
torch -> JAX converter for ImageNet-pretrained backbones (the reference
loads torchvision/open-mmlab ``state_dict`` files; we map them onto the
NHWC flax tree: conv OIHW->HWIO, BN running stats -> FrozenBatchNorm).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(ckpt_dir: str, state, step: int) -> str:
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, target):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{max(steps)}")


# ------------------------------------------------------------------ torch conv

def _t2j(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy())


def convert_torch_resnet(state_dict: Dict[str, Any], depth: int = 50
                         ) -> Tuple[Dict, Dict]:
    """torchvision ResNet ``state_dict`` -> (params, batch_stats) subtrees
    for :class:`lsnet_tpu.models.backbones.resnet.ResNet`.

    Layer naming: torch ``layerS.B.convN`` -> ours ``layer{S}_{B}.convN``;
    stem ``conv1/bn1`` keeps its name; downsample ``layerS.B.downsample.{0,1}``
    -> ``downsample_conv`` / ``downsample_bn``.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked") or key.startswith("fc."):
            continue
        parts = key.split(".")
        if parts[0] in ("conv1", "bn1"):
            mod, rest = parts[0], parts[1:]
        else:
            m = re.fullmatch(r"layer(\d+)", parts[0])
            if not m:
                continue
            mod = f"layer{m.group(1)}_{parts[1]}"
            rest = parts[2:]
            if rest[0] == "downsample":
                rest = (["downsample_conv"] if rest[1] == "0"
                        else ["downsample_bn"]) + rest[2:]
        sub = rest[:-1]
        leafname = rest[-1]
        arr = _t2j(val) if hasattr(val, "detach") else np.asarray(val)
        target = [mod] + sub
        if leafname == "weight" and arr.ndim == 4:      # conv OIHW -> HWIO
            put(params, target + ["kernel"], jnp.asarray(
                arr.transpose(2, 3, 1, 0)))
        elif leafname == "weight":                       # bn gamma
            put(params, target + ["scale"], jnp.asarray(arr))
        elif leafname == "bias":
            put(params, target + ["bias"], jnp.asarray(arr))
        elif leafname == "running_mean":
            put(stats, target + ["mean"], jnp.asarray(arr))
        elif leafname == "running_var":
            put(stats, target + ["var"], jnp.asarray(arr))
    return params, stats


def load_pretrained_backbone(variables: Dict, torch_path: str) -> Dict:
    """Merge a torch resnet checkpoint into flax ``variables`` (backbone
    subtree), verifying shapes. Returns new variables."""
    import copy

    import torch
    sd = torch.load(torch_path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    params, stats = convert_torch_resnet(sd)

    def merge(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in dst:
                    raise KeyError(f"missing module {path}/{k} in model")
                merge(dst[k], v, f"{path}/{k}")
            else:
                if k not in dst:
                    raise KeyError(f"missing leaf {path}/{k}")
                if dst[k].shape != v.shape:
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{dst[k].shape} vs {v.shape}")
                dst[k] = v.astype(dst[k].dtype)

    new_vars = {"params": copy.deepcopy(
        jax.tree.map(np.asarray, variables["params"])),
        "batch_stats": copy.deepcopy(
            jax.tree.map(np.asarray, variables.get("batch_stats", {})))}
    merge(new_vars["params"]["backbone"], params, "params/backbone")
    merge(new_vars["batch_stats"]["backbone"], stats, "stats/backbone")
    return jax.tree.map(jnp.asarray, new_vars)

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


def train_meta() -> Dict[str, Any]:
    """Deployment-relevant TRAIN-time configuration, recorded per save.

    A ``nearest_ste``-trained checkpoint deploys on the 1-read nearest
    sampling path (and a 5-tap-trained one on the 5-tap refine path) with
    no train/test skew — but only if the deploy side KNOWS how the
    checkpoint was trained.  This sidecar is that record; eval-time
    restore feeds it to :func:`lsnet_tpu.ops.flat_deform.arm_deploy_policy`.
    """
    from ..ops import flat_deform
    meta: Dict[str, Any] = {
        "dcn_sampling_train": flat_deform.current_sampling_spec()}
    taps = os.environ.get("LSNET_REFINE_TAPS")
    if taps:
        meta["refine_taps_train"] = taps
    return meta


def save_checkpoint(ckpt_dir: str, state, step: int,
                    meta: Optional[Dict[str, Any]] = None) -> str:
    import json

    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    # dotfile sibling sidecar (orbax owns the step dir itself, and a
    # visible "step_N.meta.json" would match the `step_*` globs that
    # tooling/users naturally use to pick the latest checkpoint)
    with open(_meta_path(path), "w") as f:
        json.dump(train_meta() if meta is None else meta, f)
    return path


def _meta_path(ckpt_path: str) -> str:
    d, base = os.path.split(os.path.abspath(ckpt_path))
    return os.path.join(d, f".{base}.meta.json")


def load_deploy_meta(path: str) -> Optional[Dict[str, Any]]:
    """Read a checkpoint's train-meta sidecar (None for pre-r5 saves)."""
    import json
    meta_path = _meta_path(path)
    if not os.path.isfile(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)


def restore_checkpoint(path: str, target):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def init_variables_shell(model, canvas, *, channels: int = 3):
    """Zero-valued variables with the training init's structure/dtypes.

    ``jax.eval_shape`` traces ``model.init`` without executing it — an
    eager init is hundreds of sequential device dispatches over the axon
    tunnel (minutes of wall before any real work; the bench.py regression
    of VERDICT r4).  Only valid when a checkpoint restore follows and
    overwrites every value."""
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *canvas, channels), jnp.float32)))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def restore_eval_state(path: str, variables):
    """Params/batch_stats-only restore for eval tools.

    The train-time ``opt_state`` structure depends on the exact optimizer
    wrapping (frozen-stage ``multi_transform`` labels, schedule closures),
    which eval tools cannot — and should not — reproduce.  Restoring into a
    freshly built bare optimizer fails with a tree-structure mismatch, so
    read the raw tree without a target and keep only what inference needs.
    Mirrors the reference's ``load_checkpoint(model, ...)`` which likewise
    ignores optimizer state (`mmcv/runner/checkpoint.py`).
    """
    import orbax.checkpoint as ocp

    from .step import TrainState

    from ..ops.flat_deform import arm_deploy_policy
    arm_deploy_policy(load_deploy_meta(path))

    raw = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    want = jax.tree.structure(variables["params"])
    got = jax.tree.structure(raw["params"])
    if want != got:
        raise ValueError(
            f"checkpoint params tree does not match the model built from "
            f"this config:\n  checkpoint: {got}\n  model: {want}")
    return TrainState(step=jnp.asarray(raw.get("step", 0), jnp.int32),
                      params=raw["params"],
                      batch_stats=raw.get("batch_stats") or {},
                      opt_state=())


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


# mmdet deep-stem Sequential indices -> our module names
# (`code/mmdet/models/backbones/resnet.py` `_make_stem_layer` deep_stem:
#  Sequential(conv, norm, relu, conv, norm, relu, conv, norm, relu))
_DEEP_STEM_MAP = {"0": "stem_conv1", "1": "stem_bn1",
                  "3": "stem_conv2", "4": "stem_bn2",
                  "6": "stem_conv3", "7": "stem_bn3"}


def convert_torch_backbone(state_dict: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """torch backbone ``state_dict`` -> (params, batch_stats) subtrees for
    :class:`lsnet_tpu.models.backbones.resnet.ResNet`.

    Covers the full key space the reference loads
    (`/root/reference/code/mmcv/mmcv/runner/checkpoint.py` +
    `code/mmdet/ops/dcn/deform_conv.py:410-435`):

    * torchvision ResNet/ResNeXt naming ``layerS.B.convN`` /
      ``downsample.{0,1}``
    * mmdet full-detector dicts: ``backbone.``-prefixed keys (neck/head
      keys are out of scope for a backbone load and skipped)
    * DCN blocks: ``convN.conv_offset.{weight,bias}`` plus the main
      ``convN.weight`` mapping to the DCN-pack ``weight`` param
    * Res2Net (v1d): ``convs.{i}`` / ``bns.{i}`` scale branches, deep stem
      ``stem.{0..7}``, avg-down ``downsample.{0,1,2}``

    Unrecognized *backbone* keys raise (a partial load must never pass
    silently).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    # normalize prefixes
    items: Dict[str, Any] = {}
    has_backbone_prefix = any(k.startswith("backbone.")
                              or k.startswith("module.backbone.")
                              for k in state_dict)
    for key, val in state_dict.items():
        k = key[len("module."):] if key.startswith("module.") else key
        if has_backbone_prefix:
            if not k.startswith("backbone."):
                continue                      # neck./bbox_head. etc.
            k = k[len("backbone."):]
        items[k] = val

    # which conv modules are DCN packs (they have a sibling conv_offset)
    dcn_convs = {k.rsplit(".conv_offset.", 1)[0]
                 for k in items if ".conv_offset." in k}

    unconsumed = []
    for key, val in items.items():
        if key.endswith("num_batches_tracked") or key.startswith("fc."):
            continue
        parts = key.split(".")
        arr = _t2j(val) if hasattr(val, "detach") else np.asarray(val)
        mod: Optional[str] = None
        rest = None
        if parts[0] in ("conv1", "bn1"):
            mod, rest = parts[0], parts[1:]
        elif parts[0] == "stem":
            mod = _DEEP_STEM_MAP.get(parts[1])
            rest = parts[2:]
        else:
            m = re.fullmatch(r"layer(\d+)", parts[0])
            if m:
                mod = f"layer{m.group(1)}_{parts[1]}"
                rest = parts[2:]
                if rest[0] == "downsample":
                    # Sequential may be (conv, bn) or (avgpool, conv, bn):
                    # identify by tensor rank, not index
                    rest = (["downsample_conv"] if arr.ndim == 4
                            else ["downsample_bn"]) + rest[2:]
                elif rest[0] in ("convs", "bns"):     # Res2Net scale branch
                    base = "conv2" if rest[0] == "convs" else "bn2"
                    rest = [f"{base}_{rest[1]}"] + rest[2:]
        if mod is None or rest is None or not rest:
            unconsumed.append(key)
            continue
        sub, leafname = rest[:-1], rest[-1]
        target = [mod] + sub
        src_mod = key.rsplit(".", 1)[0]
        is_offset = sub and sub[-1] == "conv_offset"
        # conv_offset is an nn.Conv in our DCN pack -> leaf 'kernel'; the
        # DCN main weight is a raw param named 'weight' (both HWIO)
        if leafname == "weight" and arr.ndim == 4:
            leaf = ("kernel" if (is_offset or src_mod not in dcn_convs)
                    else "weight")
            put(params, target + [leaf],
                jnp.asarray(arr.transpose(2, 3, 1, 0)))
        elif leafname == "weight" and arr.ndim == 1:     # bn gamma
            put(params, target + ["scale"], jnp.asarray(arr))
        elif leafname == "bias":
            put(params, target + ["bias"], jnp.asarray(arr))
        elif leafname == "running_mean":
            put(stats, target + ["mean"], jnp.asarray(arr))
        elif leafname == "running_var":
            put(stats, target + ["var"], jnp.asarray(arr))
        else:
            unconsumed.append(key)
    if unconsumed:
        raise ValueError(
            "torch checkpoint keys not recognized by the backbone "
            f"converter (partial load refused): {sorted(unconsumed)[:20]}")
    return params, stats


def convert_torch_resnet(state_dict: Dict[str, Any], depth: int = 50
                         ) -> Tuple[Dict, Dict]:
    """Backward-compatible alias of :func:`convert_torch_backbone`."""
    return convert_torch_backbone(state_dict)


def load_pretrained_backbone(variables: Dict, torch_path: str) -> Dict:
    """Merge a torch resnet checkpoint into flax ``variables`` (backbone
    subtree), verifying shapes. Returns new variables."""
    import copy

    import torch
    sd = torch.load(torch_path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    params, stats = convert_torch_backbone(sd)

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


def convert_torch_neck(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torch FPN ``state_dict`` (mmdet `necks/fpn.py` naming) -> params
    subtree for :class:`lsnet_tpu.models.necks.fpn.FPN`.

    lateral_convs.{i} -> lateral_{i}; fpn_convs.{j<n_lat} -> fpn_{j};
    fpn_convs.{j>=n_lat} -> extra_{j-n_lat} (the reference appends the
    extra convs to fpn_convs, `fpn.py:104-117`); ConvModule norm (gn/bn)
    -> our ConvModule 'norm' collection."""
    params: Dict[str, Any] = {}

    def put(path, leaf):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    items = {}
    for key, val in state_dict.items():
        k = key[len("module."):] if key.startswith("module.") else key
        if k.startswith("neck."):
            k = k[len("neck."):]
        elif any(s.startswith(("backbone.", "bbox_head.", "roi_head."))
                 for s in (k,)):
            continue
        items[k] = val
    n_lat = len({k.split(".")[1] for k in items
                 if k.startswith("lateral_convs.")})
    unconsumed = []
    for key, val in items.items():
        parts = key.split(".")
        arr = _t2j(val) if hasattr(val, "detach") else np.asarray(val)
        if parts[0] == "lateral_convs":
            mod = f"lateral_{parts[1]}"
        elif parts[0] == "fpn_convs":
            j = int(parts[1])
            mod = f"fpn_{j}" if j < n_lat else f"extra_{j - n_lat}"
        else:
            unconsumed.append(key)
            continue
        sub, leaf = parts[2], parts[3]
        if sub == "conv" and leaf == "weight":
            put([mod, "conv", "kernel"], jnp.asarray(arr.transpose(2, 3, 1, 0)))
        elif sub == "conv" and leaf == "bias":
            put([mod, "conv", "bias"], jnp.asarray(arr))
        elif sub in ("gn", "bn") and leaf == "weight":
            put([mod, "norm", "scale"], jnp.asarray(arr))
        elif sub in ("gn", "bn") and leaf == "bias":
            put([mod, "norm", "bias"], jnp.asarray(arr))
        elif leaf == "num_batches_tracked":
            continue
        else:
            unconsumed.append(key)
    if unconsumed:
        raise ValueError(f"neck keys not recognized: {sorted(unconsumed)[:10]}")
    return params


def convert_torch_lshead(state_dict: Dict[str, Any], task: str = "bbox"
                         ) -> Dict[str, Any]:
    """Reference LSHead ``state_dict`` (`lsnet_head.py:93-257` naming) ->
    params subtree for :class:`lsnet_tpu.models.heads.ls_head.LSHead`.

    Key map (norm-conv config):

    * ``{b}_convs.{i}.conv/gn``        -> ``{b}_convs_{i}.conv/norm``
    * ``{b}_GN``                       -> ``{b}_GN``
    * ``pts_{t}_init_conv/out``, ``pts_{t}_refine_out``,
      ``{t}_feat_conv``, ``pts_cls_out``  -> same names
    * ``{t}_af_dcn_conv.0``            -> ``{t}_af_dcn_conv`` (the
      reference wraps it in a Sequential with ReLU)
    * ``pts_{main}_refine_conv.weight`` + ``pts_cls_conv.weight`` -> the
      fused ``pts_{main}_cls_pair.weight_a/weight_b`` (this build runs the
      main-refine and cls pyramid gathers as ONE double-width gather)
    * other ``pts_*_refine_conv.weight`` (pose_bbox's bbox branch) ->
      ``pts_*_refine_conv.weight``
    """
    main = {"bbox": "bbox", "segm": "segm", "pose_bbox": "pose",
            "pose_kbox": "pose"}[task]
    params: Dict[str, Any] = {}

    def put(path, arr):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(arr)

    def conv_kernel(a):
        return np.asarray(a).transpose(2, 3, 1, 0)

    unconsumed = []
    for key, val in state_dict.items():
        k = key[len("module."):] if key.startswith("module.") else key
        if k.startswith("bbox_head."):
            k = k[len("bbox_head."):]
        arr = _t2j(val) if hasattr(val, "detach") else np.asarray(val)
        m = re.match(r"(cls|bbox|segm|pose)_convs\.(\d+)\.(conv|gn)\."
                     r"(weight|bias)$", k)
        if m:
            b, i, sub, leaf = m.groups()
            mod = f"{b}_convs_{i}"
            if sub == "conv":
                put([mod, "conv", "kernel" if leaf == "weight" else "bias"],
                    conv_kernel(arr) if leaf == "weight" else arr)
            else:
                put([mod, "norm", "scale" if leaf == "weight" else "bias"],
                    arr)
            continue
        m = re.match(r"(cls|bbox|segm|pose)_GN\.(weight|bias)$", k)
        if m:
            b, leaf = m.groups()
            put([f"{b}_GN", "scale" if leaf == "weight" else "bias"], arr)
            continue
        m = re.match(r"pts_(bbox|segm|pose)_refine_conv\.weight$", k)
        if m:
            t = m.group(1)
            if t == main:
                put([f"pts_{main}_cls_pair", "weight_a"], conv_kernel(arr))
            else:
                put([f"pts_{t}_refine_conv", "weight"], conv_kernel(arr))
            continue
        if k == "pts_cls_conv.weight":
            put([f"pts_{main}_cls_pair", "weight_b"], conv_kernel(arr))
            continue
        m = re.match(r"(cls|bbox|segm|pose)_af_dcn_conv\.0\.(weight|bias)$",
                     k)
        if m:
            b, leaf = m.groups()
            put([f"{b}_af_dcn_conv",
                 "kernel" if leaf == "weight" else "bias"],
                conv_kernel(arr) if leaf == "weight" else arr)
            continue
        m = re.match(r"(pts_(?:bbox|segm|pose)_(?:init_conv|init_out|"
                     r"refine_out)|pts_cls_out|"
                     r"(?:cls|bbox|segm|pose)_feat_conv)\.(weight|bias)$", k)
        if m:
            mod, leaf = m.group(1), m.group(2)
            put([mod, "kernel" if leaf == "weight" else "bias"],
                conv_kernel(arr) if leaf == "weight" else arr)
            continue
        if k == "dcn_base_offset" or k.endswith("num_batches_tracked"):
            continue
        unconsumed.append(k)
    if unconsumed:
        raise ValueError(
            f"LSHead keys not recognized: {sorted(unconsumed)[:10]}")
    return params

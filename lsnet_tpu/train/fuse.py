"""Fold FrozenBatchNorm into the preceding conv (inference-time fusion).

TPU-native analogue of the reference ``tools/fuse_conv_bn.py``
(`/root/reference/code/tools/fuse_conv_bn.py:10-45`): during inference a
(frozen) BN is an affine map with constant statistics, so it folds into the
conv. The reference mutates torch modules in place and swaps the BN for
``nn.Identity``; here the *module tree is static* (it is part of the jitted
program), so fusion is a pure transform on the variables pytree that keeps
the tree structure — and therefore the jitted apply signature — identical:

    kernel' = kernel * scale / sqrt(var + eps)          (per out-channel)
    bn'     = pure bias-add: mean=0, var=1, scale=sqrt(1+eps),
              bias = (conv_bias - mean) * factor + bn_bias

The fused BN reduces to ``x + bias`` (its multiplier is exactly 1 up to one
ULP of the rsqrt), which XLA folds into the conv epilogue; the mean/var
normalization arithmetic disappears from the hot path and published
checkpoints carry identity statistics.

Pairing rule (matches :mod:`lsnet_tpu.models` naming): a params subtree
with sibling keys ``convN``/``bnN``, ``downsample_conv``/``downsample_bn``
or ``conv``/``norm`` where the norm side has {scale, bias} params plus
{mean, var} batch_stats is a fusable ConvModule/ResNet block pair.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _conv_key_for(bn_key: str, siblings) -> str | None:
    m = re.fullmatch(r"bn(\d*)", bn_key)
    if m:
        cand = f"conv{m.group(1)}"
    elif bn_key == "norm":
        cand = "conv"
    elif bn_key.endswith("_bn"):
        cand = bn_key[:-3] + "_conv"
    else:
        return None
    return cand if cand in siblings else None


def _is_bn(params_sub, stats_sub) -> bool:
    return (isinstance(params_sub, dict)
            and set(params_sub) >= {"scale", "bias"}
            and isinstance(stats_sub, dict)
            and set(stats_sub) >= {"mean", "var"})


def _copy(tree):
    if isinstance(tree, dict):
        return {k: _copy(v) for k, v in tree.items()}
    return tree


def fuse_conv_bn(variables: Dict[str, Any], epsilon: float = 1e-5,
                 ) -> Tuple[Dict[str, Any], List[str]]:
    """Return (fused variables, list of fused 'path/bn' names).

    Non-destructive; the result has the SAME pytree structure, so it drops
    into any compiled/exported apply unchanged.
    """
    params = _copy(variables.get("params", {}))
    stats = _copy(variables.get("batch_stats", {}))
    fused: List[str] = []

    def rec(p: Dict[str, Any], s: Dict[str, Any], path: str):
        for key in list(p.keys()):
            sub_s = s.get(key, {}) if isinstance(s, dict) else {}
            if _is_bn(p.get(key), sub_s):
                conv_key = _conv_key_for(key, p)
                if conv_key is None or "kernel" not in p.get(conv_key, {}):
                    continue
                bn, st, conv = p[key], sub_s, dict(p[conv_key])
                mean = np.asarray(st["mean"], np.float64)
                factor = (np.asarray(bn["scale"], np.float64)
                          / np.sqrt(np.asarray(st["var"], np.float64)
                                    + epsilon))
                kdt = np.asarray(conv["kernel"]).dtype
                conv["kernel"] = jnp.asarray(
                    np.asarray(conv["kernel"], np.float64) * factor, kdt)
                conv_b = (np.asarray(conv["bias"], np.float64)
                          if "bias" in conv else 0.0)
                new_bias = ((conv_b - mean) * factor
                            + np.asarray(bn["bias"], np.float64))
                if "bias" in conv:
                    conv["bias"] = jnp.zeros_like(jnp.asarray(conv["bias"]))
                p[conv_key] = conv
                bdt = np.asarray(bn["scale"]).dtype
                c = new_bias.shape[0]
                # scale*rsqrt(var+eps) == sqrt(1+eps)*rsqrt(1+eps) == 1
                p[key] = {"scale": jnp.full((c,), np.sqrt(1.0 + epsilon),
                                            bdt),
                          "bias": jnp.asarray(new_bias, bdt)}
                s[key] = {"mean": jnp.zeros(
                              (c,), np.asarray(st["mean"]).dtype),
                          "var": jnp.ones((c,), np.asarray(st["var"]).dtype)}
                fused.append(f"{path}/{key}")
            elif isinstance(p.get(key), dict):
                rec(p[key], sub_s if isinstance(sub_s, dict) else {},
                    f"{path}/{key}")

    rec(params, stats, "")
    out = dict(variables)
    out["params"] = params
    if "batch_stats" in variables:
        out["batch_stats"] = stats
    return out, fused

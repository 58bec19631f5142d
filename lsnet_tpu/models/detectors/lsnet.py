"""LSDetector — single-stage detector assembly (flax).

Equivalent of `/root/reference/code/mmdet/models/detectors/lsnet.py:13` +
`single_stage.py:9`: backbone -> FPN -> LSHead.  The flax module is pure
compute (image batch -> multi-level head outputs); loss and decoding live in
:mod:`lsnet_tpu.core.loss` / :mod:`lsnet_tpu.core.decode` as pure functions,
which is the JAX-idiomatic split (the reference folds them into class
methods).
"""

from __future__ import annotations

from typing import Dict, List

import jax
from flax import linen as nn

Array = jax.Array


class LSDetector(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    head: nn.Module

    def __call__(self, images: Array) -> Dict[str, List[Array]]:
        from ...parallel.mesh import maybe_constrain

        # under a dp x sp mesh, the backbone/neck convs run spatially
        # sharded (GSPMD halo exchange); the head's flat multi-level gather
        # mixes H into the row index, so its maps are EXPLICITLY gathered
        # to model-replicated here — one resharding instead of GSPMD
        # involuntary full remats on every head reshape
        images = maybe_constrain(images, "data", "model")
        feats = self.backbone(images)
        feats = [maybe_constrain(f, "data", "model") for f in feats]
        feats = self.neck(feats)
        feats = [maybe_constrain(f, "data") for f in feats]
        return self.head(feats)

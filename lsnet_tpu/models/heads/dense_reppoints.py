"""DenseRepPoints v1/v2 — dense point-set instance segmentation heads.

TPU-native rebuild of
`/root/reference/code/mmdet/models/dense_heads/dense_reppoints_head.py`
(1091 LoC) and `dense_reppoints_v2_head.py` (1356 LoC): each cell predicts
``num_points`` (default 729) point offsets; classification pools features
at the 9 group-leader points; a per-point mask score comes from a
position-sensitive ``num_score_group``-channel score map; refinement
samples a per-point 2-channel flow field at each point's own location.

The reference implements every sampling step as per-instance
``F.grid_sample`` calls (`dense_reppoints_head.py:206-294`,
padding_mode='border', align_corners=True); here they are padded dense
gathers over the whole level map — one fused XLA gather per step, no
dynamic shapes (SURVEY §7 design stance).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

_prior_bias = float(-math.log((1 - 0.01) / 0.01))


def border_sample(feat: Array, xs: Array, ys: Array) -> Array:
    """Bilinear sample with border clamp (`F.grid_sample`
    padding_mode='border', align_corners=True semantics — the reference
    normalizes absolute pixel coords so align_corners maps them back
    exactly, `dense_reppoints_head.py:206-228`).

    feat (H, W, C); xs/ys (...,) absolute pixel coords -> (..., C)."""
    H, W = feat.shape[:2]
    x = jnp.clip(xs, 0.0, W - 1.0)
    y = jnp.clip(ys, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    flat = feat.reshape(H * W, -1)
    g = lambda yi, xi: flat[(yi * W + xi).reshape(-1)].reshape(
        *xs.shape, feat.shape[-1])
    return ((g(y0i, x0i) * (1 - fx) + g(y0i, x1i) * fx) * (1 - fy)
            + (g(y1i, x0i) * (1 - fx) + g(y1i, x1i) * fx) * fy)


def sample_offset_feature(feat: Array, flow: Array) -> Array:
    """Reference ``compute_offset_feature`` (:230-250): sample ``feat`` at
    (grid + flow) for every cell.

    feat (B, H, W, C); flow (B, H, W, P, 2) [x, y] offsets in pixels ->
    (B, H, W, P, C)."""
    B, H, W, C = feat.shape
    gx = jnp.arange(W, dtype=flow.dtype)[None, None, :, None]
    gy = jnp.arange(H, dtype=flow.dtype)[None, :, None, None]
    xs = gx + flow[..., 0]
    ys = gy + flow[..., 1]
    return jax.vmap(border_sample)(feat, xs, ys)


def sample_group_scores(score_map: Array, pts: Array, group_idx: Array
                        ) -> Array:
    """Position-sensitive score sampling (reference
    ``compute_offset_feature_5d``/``sample_offset_3d`` :252-294): for each
    point, bilinear-sample the score map CHANNEL selected by its group
    index (the reference's trilinear grid_sample lands exactly on integer
    group planes).

    score_map (B, H, W, G); pts (B, H, W, P, 2) absolute [x, y];
    group_idx (B, H, W, P) int -> (B, H, W, P)."""
    B, H, W, G = score_map.shape

    def one(sm, xy, gi):
        vals = border_sample(sm, xy[..., 0], xy[..., 1])      # (H, W, P, G)
        return jnp.take_along_axis(vals, gi[..., None], axis=-1)[..., 0]

    return jax.vmap(one)(score_map, pts, group_idx)


def grid_group_partition(pts: Array, num_score_group: int) -> Array:
    """Reference ``grid_position_sensitive_group_partition`` (:420-440):
    normalize each cell's point set into its own min/max box and bucket
    into a sqrt(G) x sqrt(G) grid.

    pts (B, H, W, P, 2) [x, y] -> (B, H, W, P) int32 group index."""
    k = int(math.isqrt(num_score_group))
    x = pts[..., 0]
    y = pts[..., 1]
    x1 = x.min(axis=-1, keepdims=True)
    x2 = x.max(axis=-1, keepdims=True)
    y1 = y.min(axis=-1, keepdims=True)
    y2 = y.max(axis=-1, keepdims=True)
    nx = (x - x1) / (x2 - x1 + 1e-6)
    ny = (y - y1) / (y2 - y1 + 1e-6)
    gx = jnp.clip((nx * k).astype(jnp.int32), 0, k - 1)
    gy = jnp.clip((ny * k).astype(jnp.int32), 0, k - 1)
    return gy * k + gx


def _conv3(out, name, bias_init=0.0):
    return nn.Conv(out, (3, 3), padding=[(1, 1), (1, 1)],
                   kernel_init=nn.initializers.normal(0.01),
                   bias_init=nn.initializers.constant(bias_init), name=name)


class _Tower(nn.Module):
    convs: int
    channels: int
    prefix: str
    use_gn: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.convs):
            x = _conv3(self.channels, f"{self.prefix}{i}")(x)
            if self.use_gn:
                x = nn.GroupNorm(num_groups=32,
                                 name=f"{self.prefix}{i}_gn")(x)
            x = nn.relu(x)
        return x


class DenseRepPointsHead(nn.Module):
    """DenseRepPoints v1 (`dense_reppoints_head.py:18-344`)."""
    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    stacked_mask_convs: int = 3
    num_points: int = 729
    num_group: int = 9
    num_score_group: int = 121
    gradient_mul: float = 0.1
    point_base_scale: int = 4
    fuse_mask_feat: bool = False

    def points_init(self, dtype) -> Array:
        """Grid prior: dcn_base/max * scale (ref :308-311), (P, 2) [y,x]
        interleaved per reference channel layout -> returned as (P, 2)
        [x, y] offsets in cell units."""
        k = int(math.isqrt(self.num_points))
        pad = (k - 1) // 2
        base = np.arange(-pad, pad + 1).astype(np.float64)
        yy = np.repeat(base, k)
        xx = np.tile(base, k)
        scale = self.point_base_scale / 2
        init = np.stack([xx, yy], 1) / max(pad, 1) * scale
        return jnp.asarray(init, dtype)

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        return self._run(feats)

    def _run(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        """Body shared with the v2 subclass (runs inside the caller's
        compact context — flax allows one @compact method per class)."""
        P_ = self.num_points
        cls_tower = _Tower(self.stacked_convs, self.feat_channels, "cls_conv")
        reg_tower = _Tower(self.stacked_convs, self.feat_channels, "reg_conv")
        mask_tower = _Tower(self.stacked_mask_convs, self.feat_channels,
                            "mask_conv")
        pts_init_conv = _conv3(self.point_feat_channels, "pts_init_conv")
        pts_init_out = nn.Conv(2 * P_, (1, 1),
                               kernel_init=nn.initializers.normal(0.01),
                               name="pts_init_out")
        pts_refine_conv = _conv3(self.point_feat_channels, "pts_refine_conv")
        pts_refine_out = nn.Conv(2 * P_, (1, 1),
                                 kernel_init=nn.initializers.normal(0.01),
                                 name="pts_refine_out")
        cls_conv = nn.Conv(self.point_feat_channels, (1, 1),
                           kernel_init=nn.initializers.normal(0.01),
                           name="cls_conv1x1")
        cls_out = nn.Conv(self.num_classes, (1, 1),
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.constant(_prior_bias),
                          name="cls_out")
        mask_init_conv = _conv3(self.point_feat_channels, "mask_init_conv")
        mask_init_out = nn.Conv(self.num_score_group, (1, 1),
                                kernel_init=nn.initializers.normal(0.01),
                                name="mask_init_out")

        outs = {"cls": [], "pts_init": [], "pts_refine": [],
                "pts_score": []}
        mask_feats = []
        pts_detached = []
        for x in feats:
            B, H, W, _ = x.shape
            cf = cls_tower(x)
            pf = reg_tower(x)
            mask_feats.append(mask_tower(x))

            init_prior = self.points_init(x.dtype).reshape(1, 1, 1, 2 * P_)
            pts_out_init = pts_init_out(
                nn.relu(pts_init_conv(pf))) + init_prior      # (B,H,W,2P)
            g = self.gradient_mul
            pts_detach = ((1 - g) * jax.lax.stop_gradient(pts_out_init)
                          + g * pts_out_init)
            pts_detached.append(pts_detach)

            # group-pooled classification: sample cls_feat at the first
            # point of each of the 9 groups (ref :326-333)
            flow = pts_detach.reshape(B, H, W, P_, 2)
            per_grp = P_ // self.num_group
            leader = flow[:, :, :, ::per_grp, :][:, :, :, :self.num_group]
            sampled = sample_offset_feature(cf, leader)       # (B,H,W,9,C)
            cat = sampled.reshape(B, H, W, -1)
            outs["cls"].append(cls_out(nn.relu(cls_conv(cat))))

            # refine: each point's OWN 2-channel flow sampled at its own
            # location (ref :335-342 views (B, 2n, H, W) as (B*n, 2, H, W)
            # and grid-samples per point) — here a vmap over the P axis
            refine_field = pts_refine_out(nn.relu(pts_refine_conv(pf)))
            rf = refine_field.reshape(B, H, W, P_, 2)
            gx = jnp.arange(W, dtype=x.dtype)[None, None, :, None]
            gy = jnp.arange(H, dtype=x.dtype)[None, :, None, None]
            xs = gx + flow[..., 0]
            ys = gy + flow[..., 1]

            def per_image(rf_i, xs_i, ys_i):
                # rf_i (H, W, P, 2); xs_i/ys_i (H, W, P)
                return jax.vmap(border_sample, in_axes=(2, 2, 2),
                                out_axes=2)(rf_i, xs_i, ys_i)

            sampled = jax.vmap(per_image)(rf, xs, ys)         # (B,H,W,P,2)
            pts_refine = (sampled + flow).reshape(B, H, W, 2 * P_)
            outs["pts_refine"].append(pts_refine)
            outs["pts_init"].append(pts_out_init)

        # mask head on (optionally fused) mask features (ref :346-392)
        if self.fuse_mask_feat:
            fuse = _conv3(self.feat_channels, "mask_fuse_conv")
            hi = mask_feats[0]
            H0, W0 = hi.shape[1:3]
            fused = []
            for lvl, mf in enumerate(mask_feats):
                up = mf if lvl == 0 else jax.image.resize(
                    mf, (mf.shape[0], H0, W0, mf.shape[-1]), "bilinear")
                fused.append(fuse(up + hi))
            mask_feats = fused
        for lvl, (mf, pts_detach) in enumerate(zip(mask_feats,
                                                   pts_detached)):
            B, H, W, _ = mf.shape
            Hp, Wp = feats[lvl].shape[1:3]
            score_map = mask_init_out(nn.relu(mask_init_conv(mf)))
            flow = pts_detach.reshape(B, Hp, Wp, P_, 2)
            gx = jnp.arange(Wp, dtype=mf.dtype)[None, None, :, None]
            gy = jnp.arange(Hp, dtype=mf.dtype)[None, :, None, None]
            abs_pts = jnp.stack([gx + flow[..., 0], gy + flow[..., 1]], -1)
            grp = grid_group_partition(abs_pts, self.num_score_group)
            outs["pts_score"].append(
                sample_group_scores(score_map, abs_pts, grp))
        return outs


class DenseRepPointsV2Head(DenseRepPointsHead):
    """DenseRepPoints v2 (`dense_reppoints_v2_head.py:18-445`): v1 plus a
    shared-feature semantic branch (mixed into cls/pts/mask features) and a
    contour score+offset branch concatenated into the tower outputs."""
    stacked_shared_convs: int = 0   # v2 computes sem from the raw level

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Dict[str, List[Array]]:
        sem_out = _conv3(self.num_classes, "sem_out",
                         bias_init=_prior_bias)
        sem_embed = _conv3(self.feat_channels, "sem_embedding")
        cont_score_out = _conv3(1, "cont_score_out",
                                bias_init=_prior_bias)
        cont_offset_out = _conv3(2, "cont_offset_out")
        sem_gn = nn.GroupNorm(num_groups=32, name="sem_gn")
        mixed = []
        sem_scores, cont_scores, cont_offsets = [], [], []
        for x in feats:
            sem_scores.append(sem_out(x))
            xm = x + sem_gn(sem_embed(x))
            cont_scores.append(cont_score_out(xm))
            cont_offsets.append(cont_offset_out(xm))
            mixed.append(xm)
        outs = self._run(mixed)
        outs["sem"] = sem_scores
        outs["hm_tl"] = cont_scores       # contour heatmap reuses the CPV
        outs["off_tl"] = cont_offsets     # aux-loss plumbing (core.cpv)
        return outs

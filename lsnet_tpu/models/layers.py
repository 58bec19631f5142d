"""Shared NN building blocks (flax.linen, NHWC, TPU-native).

Equivalents of the reference conv/norm "bricks"
(`/root/reference/code/mmcv/mmcv/cnn/bricks/conv_module.py`): ConvModule
(conv->norm->act), FrozenBatchNorm (the TPU-native realization of the
reference's ``norm_eval=True`` BN: running stats always used, affine params
trainable), and the deformable conv modules (DCNv2 pack, PyramidDeformConv)
built on :mod:`lsnet_tpu.ops.deform_conv`.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.deform_conv import modulated_deform_conv, pyramid_deform_conv
from ..ops.flat_deform import (SampleJob, dual_pyramid_dcn,
                               multi_branch_modulated_dcn,
                               multilevel_modulated_dcn,
                               multilevel_pyramid_dcn)

Array = jax.Array

kaiming_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def normal_init(std: float = 0.01):
    return nn.initializers.normal(stddev=std)


def _centered_uniform(scale: float):
    """U(-scale, scale) — torch conv ``reset_parameters`` style."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


def bias_init_with_prob(prior_prob: float) -> float:
    """Focal-loss classification bias init (reference mmcv
    `cnn/utils/weight_init.py`)."""
    return float(-math.log((1 - prior_prob) / prior_prob))


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always normalizes with stored running statistics.

    Matches the reference backbone setting ``norm_eval=True`` +
    ``requires_grad=True`` (`configs/lsnet/lsnet_bbox_r50_fpn_1x_coco.py:16-17`):
    statistics come from the (pretrained) running buffers, scale/bias remain
    trainable. On TPU this is also the throughput-optimal choice — no
    cross-device batch statistics.
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32)).value
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return (x * inv + (bias - mean * inv)).astype(x.dtype)


def make_norm(norm_cfg: Optional[dict], name: Optional[str] = None) -> Optional[nn.Module]:
    if norm_cfg is None:
        return None
    kind = norm_cfg["type"]
    if kind == "GN":
        # dtype inferred from inputs/params: keeps bf16 activations bf16
        # (stats are still computed in f32 internally by flax)
        return nn.GroupNorm(num_groups=norm_cfg.get("num_groups", 32),
                            epsilon=1e-5, name=name)
    if kind in ("BN", "SyncBN", "FrozenBN"):
        return FrozenBatchNorm(name=name)
    raise ValueError(f"unknown norm type {kind}")


class ConvModule(nn.Module):
    """conv -> norm -> activation."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: Any = None          # None => 'same-ish' explicit pad (k//2)
    dilation: int = 1
    groups: int = 1
    bias: Any = "auto"
    norm_cfg: Optional[dict] = None
    act: Optional[str] = "relu"
    kernel_init: Callable = kaiming_init

    @nn.compact
    def __call__(self, x: Array) -> Array:
        use_bias = (self.norm_cfg is None) if self.bias == "auto" else bool(self.bias)
        pad = self.kernel_size // 2 * self.dilation if self.padding is None else self.padding
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups, use_bias=use_bias,
                    kernel_init=self.kernel_init, name="conv")(x)
        norm = make_norm(self.norm_cfg, name="norm")
        if norm is not None:
            x = norm(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act is not None:
            raise ValueError(f"unknown act {self.act}")
        return x


class ModulatedDeformConvPack(nn.Module):
    """DCNv2 'pack': an internal zero-initialized conv predicts
    (offset, mask) from the input (`deform_conv.py:488-562` reference).

    Accepts a single (B,H,W,C) map or a list of maps (FPN levels); the
    multi-level call batches every level into one flat gather + one MXU
    matmul (:mod:`lsnet_tpu.ops.flat_deform`) — the TPU-fast path.
    """
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1              # grouped DCN (reference ResNeXt-DCN conv2)
    use_bias: bool = True
    site: str = "tower"          # hybrid sampling-policy tag (flat_deform)

    @nn.compact
    def __call__(self, x):
        multi = isinstance(x, (list, tuple))
        xs = list(x) if multi else [x]
        k = self.kernel_size
        K = k * k
        cin = xs[0].shape[-1] // self.groups
        conv_offset = nn.Conv(3 * K, (k, k), strides=(self.stride,) * 2,
                              padding=[(self.padding,) * 2] * 2,
                              kernel_dilation=(self.dilation,) * 2,
                              kernel_init=nn.initializers.zeros,
                              bias_init=nn.initializers.zeros,
                              name="conv_offset")
        offsets, masks = [], []
        for f in xs:
            raw = conv_offset(f)
            # torch chunks into (o1, o2, mask) then cat(o1, o2); o1/o2 are
            # halves of the interleaved [y0,x0,...] layout
            o1, o2, mask = jnp.split(raw, 3, axis=-1)
            offsets.append(jnp.concatenate([o1, o2], axis=-1))
            masks.append(jax.nn.sigmoid(mask))
        stdv = 1.0 / math.sqrt(cin * K)
        weight = self.param("weight", _centered_uniform(stdv),
                            (k, k, cin, self.out_channels), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_channels,), jnp.float32)
                if self.use_bias else None)
        outs = multilevel_modulated_dcn(
            xs, offsets, masks, weight.astype(xs[0].dtype),
            None if bias is None else bias.astype(xs[0].dtype),
            stride=self.stride, padding=self.padding,
            dilation=self.dilation, groups=self.groups, site=self.site)
        return outs if multi else outs[0]


class PyramidDeformConv(nn.Module):
    """Weight holder for the cross-level deformable conv
    (`deform_conv.py:565-629` reference).

    Two call forms:
      * ``pdc(x, offset, scale_h, scale_w)`` — single map (reference API);
      * ``pdc(feats_list, jobs_list)`` — a whole branch's cross-level
        gathers batched into one flat gather + one matmul.
    """
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    kernel_init: Callable = kaiming_init

    @nn.compact
    def __call__(self, x, offset, scale_h=None, scale_w=None):
        k = self.kernel_size
        if isinstance(x, (list, tuple)):
            cin = x[0].shape[-1]
            weight = self.param("weight", self.kernel_init,
                                (k, k, cin, self.out_channels), jnp.float32)
            return multilevel_pyramid_dcn(list(x), list(offset),
                                          weight.astype(x[0].dtype))
        cin = x.shape[-1]
        weight = self.param("weight", self.kernel_init,
                            (k, k, cin, self.out_channels), jnp.float32)
        return pyramid_deform_conv(x, offset, weight.astype(x.dtype),
                                   scale_h, scale_w, stride=self.stride,
                                   padding=self.padding)


class MultiBranchDCNTower(nn.Module):
    """N parallel DCNv2+GN+ReLU towers (e.g. cls/bbox/pose) run in lockstep:
    at each stacked block the branches' deformable gathers fuse into ONE
    wide-row gather (`ops/flat_deform.multi_branch_modulated_dcn`) — on TPU
    the gather is descriptor-rate bound, so N branches cost ~1.

    All branches consume the same input feature list and keep independent
    parameters, exactly like N separate `DCNConvModule` towers
    (`lsnet_head.py:115-155` reference semantics).
    """
    branch_names: Tuple[str, ...]
    out_channels: int
    stacked_convs: int = 3
    kernel_size: int = 3
    num_groups: int = 32

    @nn.compact
    def __call__(self, feats):
        k = self.kernel_size
        K = k * k
        pad = (k - 1) // 2
        branch_feats = {b: list(feats) for b in self.branch_names}
        for blk in range(self.stacked_convs):
            branches = []
            for b in self.branch_names:
                xs = branch_feats[b]
                cin = xs[0].shape[-1]
                conv_offset = nn.Conv(
                    3 * K, (k, k), padding=[(pad, pad)] * 2,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    name=f"{b}_convs_{blk}_conv_offset")
                offsets, masks = [], []
                for f in xs:
                    raw = conv_offset(f)
                    o1, o2, m = jnp.split(raw, 3, axis=-1)
                    offsets.append(jnp.concatenate([o1, o2], axis=-1))
                    masks.append(jax.nn.sigmoid(m))
                stdv = 1.0 / math.sqrt(cin * K)
                weight = self.param(f"{b}_convs_{blk}_weight",
                                    _centered_uniform(stdv),
                                    (k, k, cin, self.out_channels),
                                    jnp.float32)
                bias = self.param(f"{b}_convs_{blk}_bias",
                                  nn.initializers.zeros,
                                  (self.out_channels,), jnp.float32)
                branches.append(dict(feats=xs, offsets=offsets, masks=masks,
                                     weight=weight.astype(xs[0].dtype),
                                     bias=bias.astype(xs[0].dtype)))
            outs = multi_branch_modulated_dcn(branches, padding=pad)
            for bi, b in enumerate(self.branch_names):
                gn = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                                  name=f"{b}_convs_{blk}_bn")
                branch_feats[b] = [nn.relu(gn(o)) for o in outs[bi]]
        return branch_feats


class PairedPyramidDeformConv(nn.Module):
    """Two PyramidDeformConv branches sharing one offset field — e.g. the
    task-refine and classification branches (`lsnet_head.py:635-638`).
    One double-width gather (2.6x faster than two on v5e), two matmuls."""
    out_channels_a: int
    out_channels_b: int
    kernel_size: int = 3
    kernel_init: Callable = kaiming_init

    @nn.compact
    def __call__(self, feats_a, feats_b, jobs):
        k = self.kernel_size
        ca = feats_a[0].shape[-1]
        cb = feats_b[0].shape[-1]
        w_a = self.param("weight_a", self.kernel_init,
                         (k, k, ca, self.out_channels_a), jnp.float32)
        w_b = self.param("weight_b", self.kernel_init,
                         (k, k, cb, self.out_channels_b), jnp.float32)
        return dual_pyramid_dcn(list(feats_a), list(feats_b), jobs,
                                w_a.astype(feats_a[0].dtype),
                                w_b.astype(feats_b[0].dtype))


class DCNConvModule(nn.Module):
    """DCNv2 + GN + ReLU tower block (`lsnet_head.py:1830-1849`).

    List-in/list-out over FPN levels (shared weights, batched sampling)."""
    out_channels: int
    kernel_size: int = 3
    num_groups: int = 32
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        multi = isinstance(x, (list, tuple))
        outs = ModulatedDeformConvPack(self.out_channels, self.kernel_size,
                                       padding=self.padding, name="conv")(x)
        gn = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                          name="bn")
        if multi:
            return [nn.relu(gn(o)) for o in outs]
        return nn.relu(gn(outs))


class SAConv(nn.Module):
    """Switchable Atrous Convolution (DetectoRS, reference
    `code/mmdet/ops/saconv.py` + AWS weight standardization from
    `conv_ws.py:60-110`): pre/post global-context 1x1s, a 5x5-avg switch
    map, and two shared-weight convs at dilation d and 3d mixed by the
    switch. sigmoid(switch)? — no: the reference uses the raw conv output
    (zero-init, bias 1 -> starts as pure small-dilation path)."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1              # DetectoRS-ResNeXt (detectors_resnext.py)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        k = self.kernel_size
        weight = self.param("weight", kaiming_init,
                            (k, k, cin // self.groups, self.out_channels),
                            jnp.float32)
        # AWS: standardize over (k, k, cin) per output channel with learned
        # affine (gamma init 1, beta init 0)
        gamma = self.param("aws_gamma", nn.initializers.ones,
                           (1, 1, 1, self.out_channels), jnp.float32)
        beta = self.param("aws_beta", nn.initializers.zeros,
                          (1, 1, 1, self.out_channels), jnp.float32)
        mean = weight.mean(axis=(0, 1, 2), keepdims=True)
        std = weight.std(axis=(0, 1, 2), keepdims=True) + 1e-5
        w_std = gamma * (weight - mean) / std + beta
        weight_diff = self.param("weight_diff", nn.initializers.zeros,
                                 (k, k, cin // self.groups,
                                  self.out_channels), jnp.float32)

        # pre-context: global avg -> 1x1 (zero-init) added back
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        pre = nn.Conv(cin, (1, 1), kernel_init=nn.initializers.zeros,
                      name="pre_context")(gap)
        x = x + pre
        # switch on 5x5 local average (reflect pad)
        avg = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
        avg = nn.avg_pool(avg, (5, 5), strides=(1, 1))
        switch = nn.Conv(1, (1, 1), strides=(self.stride, self.stride),
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.ones,
                         name="switch")(avg)

        def conv_with(w, dil):
            pad = dil * (k // 2)
            return jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (self.stride, self.stride),
                [(pad, pad), (pad, pad)], rhs_dilation=(dil, dil),
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        out_s = conv_with(w_std, self.dilation)
        out_l = conv_with(w_std + weight_diff, 3 * self.dilation)
        out = switch * out_s + (1.0 - switch) * out_l
        post = nn.Conv(self.out_channels, (1, 1),
                       kernel_init=nn.initializers.zeros,
                       name="post_context")(
            jnp.mean(out, axis=(1, 2), keepdims=True))
        return out + post


class GroupedConv(nn.Module):
    """Grouped 2-D conv with a TPU-measured execution policy.

    XLA:TPU's native grouped convolution collapses at small per-group
    widths (v5e, B4: 256ch/64g @200x336 grouped 41.2 ms vs dense 5.2 ms;
    512ch 11.0 vs 3.6; crossover at ~16ch/group where grouped wins:
    1024ch 4.1 vs 5.0). The parameter stays in the compact grouped layout
    (torch-checkpoint compatible); when group width <= ``dense_threshold``
    the weight is expanded to a block-diagonal dense kernel at call time
    and run as a dense conv.
    """
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    dense_threshold: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        cin = x.shape[-1]
        G = self.groups
        cg = cin // G
        weight = self.param("kernel", kaiming_init,
                            (k, k, cg, self.out_channels), jnp.float32)
        pad = k // 2 * self.dilation
        if G > 1 and cg <= self.dense_threshold:
            outg = self.out_channels // G
            eye = jnp.eye(G, dtype=weight.dtype)
            # dense[h,w,(z,c),(g,j)] = w[h,w,c,g,j] * delta(g, z)
            wd = jnp.einsum("hwcgj,gz->hwzcgj",
                            weight.reshape(k, k, cg, G, outg), eye)
            w_use = wd.reshape(k, k, cin, self.out_channels)
            groups = 1
        else:
            w_use = weight
            groups = G
        return jax.lax.conv_general_dilated(
            x, w_use.astype(x.dtype), (self.stride, self.stride),
            [(pad, pad), (pad, pad)],
            rhs_dilation=(self.dilation, self.dilation),
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

"""Deformable convolution family — TPU-native (XLA gather + MXU matmul).

Reference semantics (re-derived, not translated, from
`/root/reference/code/mmdet/ops/dcn/src/cuda/deform_conv_cuda_kernel.cu`):

* ``deform_conv``  (DCNv1, kernel :163-243): for output pixel (h,w) and kernel
  tap (i,j), sample input at ``y = h*stride - pad + i*dil + off_y`` with
  zero-padded bilinear interpolation, then contract with the conv weight.
* ``modulated_deform_conv`` (DCNv2, kernel :848-908): same, with a per-tap
  sigmoid mask multiplying the sampled value.
* ``pyramid_deform_conv`` (kernel :246-302, LSNet custom): the output grid is
  the *offset's* grid; the base sampling position is scaled into the (possibly
  different-resolution) input map: ``y = (h*stride - pad + i*dil)*scale_h + off_y``.
  This lets one offset field gather features from a neighbouring FPN level.

Out-of-bounds handling matches the CUDA kernel exactly: each bilinear corner
outside the image contributes zero (zero padding), and samples with
``y <= -1`` or ``y >= H`` vanish entirely.

Layout is NHWC (TPU-native); weights are HWIO ``(kh, kw, Cin, Cout)``.
Offsets follow the reference channel layout ``[y0, x0, y1, x1, ...]`` per
deformable group (here: last axis instead of channel axis).

All three ops are fully differentiable through XLA (gather transposes to
scatter-add), so no custom VJP is required for correctness. A fused Pallas
kernel can replace ``_sample_patches`` behind the same signature.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _pair(v) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def bilinear_gather(feat: Array, ys: Array, xs: Array) -> Array:
    """Zero-padded bilinear sampling.

    Args:
      feat: (B, H, W, C) feature map.
      ys, xs: (B, P) fractional sample coordinates (pixel units).

    Returns:
      (B, P, C) sampled values; zero where the sample is fully outside.

    TPU note: the four corner reads are issued as ONE flat, unbatched
    row-gather (`feat2d[idx]`, collapsed slice dims) — the only gather
    shape XLA:TPU lowers to its fast embedding-lookup path; batched or
    multi-dim-slice gathers fall into a ~100x slower generic loop
    (measured on v5e).
    """
    B, H, W, C = feat.shape
    P = ys.shape[1]
    cdt = feat.dtype

    ys = ys.astype(jnp.float32)
    xs = xs.astype(jnp.float32)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    feat2d = feat.reshape(B * H * W, C)
    boffs = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]   # (B,1)

    idxs = []
    weights = []
    for dy in (0, 1):
        yi = y0i + dy
        wy = 1.0 - jnp.abs(wy1 - dy)
        yvalid = (yi >= 0) & (yi < H)
        for dx in (0, 1):
            xi = x0i + dx
            wx = 1.0 - jnp.abs(wx1 - dx)
            valid = yvalid & (xi >= 0) & (xi < W)
            flat = (jnp.clip(yi, 0, H - 1) * W
                    + jnp.clip(xi, 0, W - 1)) + boffs             # (B,P)
            idxs.append(flat.reshape(-1))
            weights.append((wy * wx * valid).reshape(-1))
    idx_all = jnp.concatenate(idxs)                               # (4BP,)
    w_all = jnp.concatenate(weights).astype(cdt)
    vals = feat2d[idx_all] * w_all[:, None]                       # (4BP, C)
    vals = vals.reshape(4, B, P, C)
    return vals[0] + vals[1] + vals[2] + vals[3]


def _tap_grid(kh: int, kw: int, dil_h: int, dil_w: int, dtype) -> Tuple[Array, Array]:
    """Per-tap (dy, dx) base displacements, flattened row-major like the ref."""
    dy = jnp.arange(kh, dtype=dtype) * dil_h
    dx = jnp.arange(kw, dtype=dtype) * dil_w
    dyy = jnp.repeat(dy, kw)          # [0,0,0,1,1,1,2,2,2] * dil
    dxx = jnp.tile(dx, kh)            # [0,1,2,0,1,2,0,1,2] * dil
    return dyy, dxx


def _sample_patches(x: Array, offset: Array, kernel_size: Tuple[int, int],
                    stride: Tuple[int, int], padding: Tuple[int, int],
                    dilation: Tuple[int, int],
                    scale: Optional[Tuple[float, float]] = None) -> Array:
    """Gather deformable patches.

    Args:
      x: (B, H, W, C) input feature map (the map being *sampled*).
      offset: (B, Ho, Wo, 2*K) offsets, layout [y0, x0, y1, x1, ...]. The
        output grid is the offset's grid.
      scale: optional (scale_h, scale_w) applied to the *base* position
        (pyramid variant); None => ordinary deform conv.

    Returns:
      (B, Ho, Wo, K, C) sampled patches.
    """
    B, H, W, C = x.shape
    _, Ho, Wo, _ = offset.shape
    kh, kw = kernel_size
    K = kh * kw
    sh, sw = stride
    ph, pw = padding
    # sampling coordinates always in f32: bf16 cannot represent sub-pixel
    # positions beyond ~128 px
    cdt = jnp.float32

    off = offset.reshape(B, Ho, Wo, K, 2)
    off_y = off[..., 0].astype(cdt)
    off_x = off[..., 1].astype(cdt)

    hs = (jnp.arange(Ho, dtype=cdt) * sh - ph)[None, :, None, None]   # (1,Ho,1,1)
    ws = (jnp.arange(Wo, dtype=cdt) * sw - pw)[None, None, :, None]   # (1,1,Wo,1)
    dyy, dxx = _tap_grid(kh, kw, dilation[0], dilation[1], cdt)
    base_y = hs + dyy[None, None, None, :]                            # (1,Ho,1,K)
    base_x = ws + dxx[None, None, None, :]                            # (1,1,Wo,K)

    if scale is not None:
        base_y = base_y * jnp.asarray(scale[0], cdt)
        base_x = base_x * jnp.asarray(scale[1], cdt)

    ys = (base_y + off_y).reshape(B, Ho * Wo * K)
    xs = (base_x + off_x).reshape(B, Ho * Wo * K)

    patches = bilinear_gather(x, ys, xs)                              # (B,P,C)
    return patches.reshape(B, Ho, Wo, K, C)


def _contract(patches: Array, weight: Array, groups: int) -> Array:
    """(B,Ho,Wo,K,Cin) x (kh,kw,Cin/g,Cout) -> (B,Ho,Wo,Cout) on the MXU."""
    kh, kw, cin_g, cout = weight.shape
    B, Ho, Wo, K, Cin = patches.shape
    w = weight.reshape(K, cin_g, cout)
    if groups == 1:
        return jax.lax.dot_general(
            patches.reshape(B, Ho * Wo, K * Cin),
            w.reshape(K * cin_g, cout),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(B, Ho, Wo, cout).astype(patches.dtype)
    # grouped: split channels
    pg = patches.reshape(B, Ho * Wo, K, groups, cin_g)
    wg = w.reshape(K, cin_g, groups, cout // groups)
    out = jnp.einsum("bpkgc,kcgo->bpgo", pg, wg,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, Ho, Wo, cout).astype(patches.dtype)


def deform_conv(x: Array, offset: Array, weight: Array, *,
                stride=1, padding=0, dilation=1, groups: int = 1) -> Array:
    """DCNv1. x (B,H,W,Cin), offset (B,Ho,Wo,2K), weight (kh,kw,Cin/g,Cout)."""
    ks = (weight.shape[0], weight.shape[1])
    patches = _sample_patches(x, offset, ks, _pair(stride), _pair(padding),
                              _pair(dilation))
    return _contract(patches, weight, groups)


def modulated_deform_conv(x: Array, offset: Array, mask: Array, weight: Array,
                          bias: Optional[Array] = None, *, stride=1, padding=0,
                          dilation=1, groups: int = 1) -> Array:
    """DCNv2. mask (B,Ho,Wo,K) already sigmoid-ed (matches reference wrapper)."""
    ks = (weight.shape[0], weight.shape[1])
    patches = _sample_patches(x, offset, ks, _pair(stride), _pair(padding),
                              _pair(dilation))
    patches = patches * mask[..., None].astype(patches.dtype)
    out = _contract(patches, weight, groups)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def pyramid_deform_conv(x: Array, offset: Array, weight: Array,
                        scale_h: float, scale_w: float, *, stride=1,
                        padding=0, dilation=1, groups: int = 1) -> Array:
    """LSNet cross-level deformable conv.

    The output grid is ``offset``'s grid; base positions are scaled by
    (scale_h, scale_w) into ``x``'s resolution before adding offsets
    (`deform_conv_cuda_kernel.cu:281-282`). The caller pre-scales the offset
    field itself (`lsnet_head.py:628-633`).
    """
    ks = (weight.shape[0], weight.shape[1])
    patches = _sample_patches(x, offset, ks, _pair(stride), _pair(padding),
                              _pair(dilation), scale=(scale_h, scale_w))
    return _contract(patches, weight, groups)

"""Flattened multi-level deformable sampling — the TPU hot path.

The naive formulation (one gather + matmul per FPN level per branch) costs
~36 separate gather pipelines per forward; profiling on v5e shows the time
going to per-op overheads, materialized reshapes and broadcast multiplies.
This module batches *every level of a branch* into:

  1. ONE flat row-gather from the concatenated multi-level feature buffer
     (B*sum(H_l*W_l), C) — the only gather shape XLA:TPU lowers to its fast
     embedding-lookup path;
  2. ONE weighted corner combine;
  3. ONE MXU matmul with the (shared) kernel weights.

Semantics are identical to :mod:`lsnet_tpu.ops.deform_conv` (zero-padded
bilinear, reference CUDA parity) — the unit tests cross-check them.
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# DCN sampling mode: "bilinear" (reference CUDA parity — 4 corner reads
# per tap, tent weights) or "nearest" (ONE rounded read per tap — 4x less
# gather traffic on the descriptor/byte-bound XLA:TPU gather unit that
# dominates the e2e profile, docs/PERF.md round 4). Nearest is an
# INFERENCE-ONLY approximation: rounding is piecewise-constant in the
# predicted offsets, so offset branches get zero gradient under it.
# Flag-gated default-off; measured AP deltas before any default flip.
#
# Round 5 — HYBRID site policy: the global nearest switch costs -0.8 AP
# (over the 0.3 budget), but the sampling sites pay very different AP
# prices for the same traffic saving. The spec therefore also accepts a
# per-site form: "backbone=nearest", "backbone=nearest,tower=nearest", ...
# Sites: "backbone" (ResNeXt/ResNet DCN stages), "tower" (head stacked DCN
# convs), "refine" (pyramid refine + paired refine/cls gathers).
# Unlisted sites keep the default (bilinear).


def _parse_sampling(spec: Optional[str]) -> Tuple[str, dict]:
    spec = (spec or "bilinear").strip()
    if "=" not in spec:
        return spec, {}
    policy = {}
    for part in spec.split(","):
        site, _, mode = part.partition("=")
        policy[site.strip()] = mode.strip() or "nearest"
    return "bilinear", policy


_d, _p = _parse_sampling(os.environ.get("LSNET_DCN_SAMPLING"))
SAMPLING = [_d]
SAMPLING_POLICY = dict(_p)
# explicit user choice (env or set_sampling) wins over INFERENCE_SAMPLING
_SAMPLING_EXPLICIT = [os.environ.get("LSNET_DCN_SAMPLING") is not None]


def set_sampling(spec: Optional[str]) -> None:
    """Set the sampling mode/policy from a spec string (see above)."""
    default, policy = _parse_sampling(spec)
    SAMPLING[0] = default
    SAMPLING_POLICY.clear()
    SAMPLING_POLICY.update(policy)
    _SAMPLING_EXPLICIT[0] = spec is not None


# Gather-SOURCE row quantization (VERDICT r4 #3c): store the flat feature
# buffer that the DCN gathers read as int8 (or fp8 e4m3) rows with a
# per-channel dequant scale FOLDED INTO the contraction weight — the
# gather unit then moves half the bf16 bytes per row and the dequant is
# a free cast fused into the gather consumer; accumulation stays f32
# (``preferred_element_type``). Same spec grammar as the sampling policy:
# "int8" / "fp8" global, or per-site "backbone=int8,tower=fp8". Linear
# per-channel scaling commutes with the bilinear corner weights and the
# DCNv2 modulation mask, so only the int8/fp8 rounding is approximation.
# Inference-only by default (rounding has zero gradient; training traces
# keep bf16 parity unless the env knob is set explicitly). Unlike
# nearest sampling this quantizes the sampled VALUES, not the trained
# sampling POSITIONS (reference semantics:
# `/root/reference/code/mmdet/ops/dcn/src/cuda/deform_conv_cuda_kernel.cu:249-302`),
# so it composes with any per-site sampling choice.


def _parse_quant(spec: Optional[str]) -> Tuple[str, dict]:
    spec = (spec or "").strip()
    if not spec:
        return "off", {}
    if "=" not in spec:
        return spec, {}
    policy = {}
    for part in spec.split(","):
        site, _, mode = part.partition("=")
        policy[site.strip()] = mode.strip() or "int8"
    return "off", policy


_qd, _qp = _parse_quant(os.environ.get("LSNET_GATHER_QUANT"))
QUANT = [_qd]
QUANT_POLICY = dict(_qp)
_QUANT_EXPLICIT = [os.environ.get("LSNET_GATHER_QUANT") is not None]


def set_quant(spec: Optional[str]) -> None:
    """Set the gather-source quantization mode/policy (see above)."""
    default, policy = _parse_quant(spec)
    QUANT[0] = default
    QUANT_POLICY.clear()
    QUANT_POLICY.update(policy)
    _QUANT_EXPLICIT[0] = spec is not None


import contextlib


@contextlib.contextmanager
def _site_sampling(site: Optional[str]):
    """Scope the effective SAMPLING/QUANT modes to a call site while
    tracing."""
    prev = SAMPLING[0]
    prev_q = QUANT[0]
    if site is not None:
        SAMPLING[0] = SAMPLING_POLICY.get(site, prev)
        QUANT[0] = QUANT_POLICY.get(site, prev_q)
    try:
        yield
    finally:
        SAMPLING[0] = prev
        QUANT[0] = prev_q


# Tap reduction for the REFINE site (VERDICT r4 #3b): the pyramid-refine
# gather re-samples 3 source levels per output with a 3x3 tap grid; a
# plus-shaped 5-tap subset (center + 4 edge-centers) carries most of the
# kernel's support at 5/9 of the gather traffic on the binding resource.
# Approximation — AP measured on the synthetic checkpoint before any
# default change. Env: LSNET_REFINE_TAPS=5 | "i,j,..." (row-major 3x3
# indices). Applies to site="refine" jobs with K==9 only.
_PLUS_TAPS = (1, 3, 4, 5, 7)

# trace-scoped override armed by inference_sampling() (None = env only)
_REFINE_TAPS_OVERRIDE: List[Optional[str]] = [None]


def _refine_taps() -> Optional[Tuple[int, ...]]:
    spec = os.environ.get("LSNET_REFINE_TAPS", "")
    if not spec:
        spec = _REFINE_TAPS_OVERRIDE[0] or ""
    if not spec or spec == "9":
        return None
    if spec == "5":
        return _PLUS_TAPS
    return tuple(int(t) for t in spec.split(","))


# ---------------------------------------------------------------- inference
# Default INFERENCE-TIME sampling policy. Training always traces with the
# reference-parity bilinear / 9-tap configuration (nearest rounding has
# zero offset gradient); inference forward builders (apis, eval loop,
# bench, TTA) wrap their trace in inference_sampling(), which applies
# this policy UNLESS the user explicitly chose one via LSNET_DCN_SAMPLING
# / LSNET_REFINE_TAPS / cfg test_cfg.dcn_sampling (explicit always wins).
# Flip decision (round 5, measured on the R50-DCN 36e frontier
# checkpoint, docs/accuracy/r5/ev_*.json — full record in docs/PERF.md):
#   backbone=nearest  -0.32 AP (68.36 -> 68.04; AP50 +0.02, AP75 +0.85)
#   tower=nearest     -5.6 AP   -> disqualified
#   refine taps 5     -5.8 AP   -> disqualified (INFERENCE_REFINE_TAPS
#                                  stays None)
# backbone=nearest is the only frontier point at the -0.3 budget (within
# COCO eval quantization) and ships as the inference default:
# 7.23 -> 10.67 img/s/chip e2e @B4 (+48%). Revert per run with
# LSNET_DCN_SAMPLING=bilinear or cfg test_cfg.dcn_sampling="bilinear".
INFERENCE_SAMPLING: List[Optional[str]] = ["backbone=nearest"]
INFERENCE_REFINE_TAPS: List[Optional[str]] = [None]
# Inference-default gather-source quantization spec (None = off until a
# measured AP/throughput decision flips it — same protocol as the
# sampling default above).
INFERENCE_QUANT: List[Optional[str]] = [None]


_SITES = ("backbone", "tower", "refine")


def current_sampling_spec() -> str:
    """Serialize the ACTIVE sampling mode/policy back to a spec string.

    Used by the checkpoint layer to record the train-time sampling
    configuration in the per-checkpoint meta sidecar."""
    if not SAMPLING_POLICY:
        return SAMPLING[0]
    return ",".join(f"{s}={m}" for s, m in sorted(SAMPLING_POLICY.items()))


def deploy_sampling_spec(train_spec: Optional[str]) -> Optional[str]:
    """Deploy-time sampling policy implied by a checkpoint's TRAIN spec.

    ``nearest_ste`` trains offsets that live on the rounded lattice
    (forward = 1-read nearest, backward = bilinear tent gradients), so
    such a checkpoint deploys at ``nearest`` with no train/test skew —
    the measured 17-18 img/s all-nearest inference path.  Sites trained
    bilinear keep the shipped measured default for bilinear checkpoints
    (``INFERENCE_SAMPLING``, backbone=nearest at -0.32 AP).  Returns a
    spec string for the inference default, or ``None`` when nothing
    should change (shipped default already covers it)."""
    t_default, t_policy = _parse_sampling(train_spec)
    b_default, b_policy = _parse_sampling(INFERENCE_SAMPLING[0])
    mapped = {}
    for site in _SITES:
        mode = t_policy.get(site, t_default)
        if mode == "nearest_ste":
            mapped[site] = "nearest"
        elif mode != "bilinear":
            mapped[site] = mode          # trained non-bilinear: deploy as trained
        else:
            base = b_policy.get(site, b_default)
            if base != "bilinear":
                mapped[site] = base      # shipped default for bilinear sites
    if not mapped:
        return None
    if len(mapped) == len(_SITES) and len(set(mapped.values())) == 1:
        return next(iter(mapped.values()))
    return ",".join(f"{s}={m}" for s, m in sorted(mapped.items()))


def arm_deploy_policy(meta: Optional[dict]) -> None:
    """Arm the inference-default policy from a checkpoint's train meta.

    Called on eval-time restore (``train/checkpoint.restore_eval_state``).
    Only adjusts the DEFAULT (``INFERENCE_SAMPLING`` /
    ``INFERENCE_REFINE_TAPS``) — an explicit user choice via
    LSNET_DCN_SAMPLING / LSNET_REFINE_TAPS / cfg still wins inside
    :func:`inference_sampling`."""
    if not meta:
        return
    spec = deploy_sampling_spec(meta.get("dcn_sampling_train"))
    if spec is not None:
        INFERENCE_SAMPLING[0] = spec
    taps = meta.get("refine_taps_train")
    if taps:
        # taps must match train time (post-hoc taps5 measured -5.8 AP)
        INFERENCE_REFINE_TAPS[0] = str(taps)


@contextlib.contextmanager
def inference_sampling():
    """Scope the inference-default sampling policy to a forward trace.

    Used INSIDE the traced function so it takes effect exactly while
    tracing and is a no-op on later executions of the compiled program."""
    spec = INFERENCE_SAMPLING[0]
    taps = INFERENCE_REFINE_TAPS[0]
    qspec = INFERENCE_QUANT[0]
    prev = (SAMPLING[0], dict(SAMPLING_POLICY), _REFINE_TAPS_OVERRIDE[0],
            QUANT[0], dict(QUANT_POLICY))
    if spec is not None and not _SAMPLING_EXPLICIT[0]:
        d, p = _parse_sampling(spec)
        SAMPLING[0] = d
        SAMPLING_POLICY.clear()
        SAMPLING_POLICY.update(p)
    if taps is not None and not os.environ.get("LSNET_REFINE_TAPS"):
        _REFINE_TAPS_OVERRIDE[0] = taps
    if qspec is not None and not _QUANT_EXPLICIT[0]:
        qd, qp = _parse_quant(qspec)
        QUANT[0] = qd
        QUANT_POLICY.clear()
        QUANT_POLICY.update(qp)
    try:
        yield
    finally:
        SAMPLING[0], pol, _REFINE_TAPS_OVERRIDE[0] = prev[0], prev[1], prev[2]
        SAMPLING_POLICY.clear()
        SAMPLING_POLICY.update(pol)
        QUANT[0] = prev[3]
        QUANT_POLICY.clear()
        QUANT_POLICY.update(prev[4])


def _apply_refine_taps(jobs, weights, K: int):
    """Slice jobs+weights to the LSNET_REFINE_TAPS subset (refine site).

    Returns (jobs', weights', K'). Offsets/masks are sliced per tap; the
    conv weight reshapes to a (1, T, C, cout) 'kernel' whose flat-K views
    downstream match the reduced tap count. No-op unless the env knob is
    set and the kernel is the 3x3 it was calibrated for."""
    sel = _refine_taps()
    if sel is None or K != 9:
        return jobs, weights, K
    kh = kw = int(np.sqrt(K))
    sel_ix = np.asarray(sel, np.int32)
    T = len(sel)
    new_jobs = []
    for j in jobs:
        B, Ho, Wo, _ = j.offset.shape
        off = j.offset.reshape(B, Ho, Wo, K, 2)[:, :, :, sel_ix, :]
        m = None if j.mask is None else j.mask[..., sel_ix]
        new_jobs.append(j._replace(offset=off.reshape(B, Ho, Wo, 2 * T),
                                   mask=m, taps=(kh, kw, tuple(sel))))
    new_weights = []
    for w in weights:
        cin, cout = w.shape[2], w.shape[3]
        new_weights.append(
            w.reshape(K, cin, cout)[sel_ix].reshape(1, T, cin, cout))
    return new_jobs, new_weights, T


class _QuantRows:
    """Duck-typed stand-in for a flat (N, C) gather-source buffer.

    Holds the quantized rows; ``buf[idx]`` gathers the narrow rows and
    casts back to the compute dtype (the cast fuses into the gather
    consumer). The per-channel dequant scale is NOT applied here — it is
    folded into the contraction weight upstream (:func:`_quant_fold`), so
    downstream corner-weight/mask multiplies act on scaled values, which
    is exact (per-channel scaling is linear)."""

    def __init__(self, q: Array, dtype):
        self.q = q
        self.dtype = dtype

    @property
    def shape(self):
        return self.q.shape

    def __getitem__(self, idx):
        return self.q[idx].astype(self.dtype)


def _quantize_rows(flat: Array, mode: str) -> Tuple[Array, Array]:
    """(N, C) -> (quantized rows, per-channel dequant scale (C,) f32).

    ``int8``: symmetric per-channel, max |x| -> 127 (7.99 effective bits).
    ``fp8``: e4m3, per-channel scale to the 448 saturation point (wider
    dynamic range per element, 3 mantissa bits)."""
    f = flat.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f), axis=0)
    if mode == "fp8":
        s = jnp.maximum(amax / 448.0, 1e-12)
        q = (f / s).astype(jnp.float8_e4m3fn)
    else:
        s = jnp.maximum(amax / 127.0, 1e-12)
        q = jnp.clip(jnp.round(f / s), -127, 127).astype(jnp.int8)
    # zero-through: rounding carries no useful gradient (inference-time
    # approximation, like nearest sampling) and differentiating an int
    # cast is an error — cut the tape here explicitly
    return jax.lax.stop_gradient(q), jax.lax.stop_gradient(s)


def _fold_scale(weight: Array, groups: int, s: Array) -> Array:
    """Fold a per-input-channel dequant scale into a conv weight.

    weight: (kh, kw, C/G, cout) with group-major cout (the layout
    :func:`_blockdiag_weight` assumes: flat input channel g*Cg + c pairs
    weight[..., c, g*outG + j])."""
    kh, kw, cg, cout = weight.shape
    w = weight.astype(jnp.float32)
    if groups == 1:
        w = w * s[None, None, :, None]
    else:
        outg = cout // groups
        w = (w.reshape(kh, kw, cg, groups, outg)
             * s.reshape(groups, cg).T[None, None, :, :, None]
             ).reshape(kh, kw, cg, cout)
    return w.astype(weight.dtype)


def _quant_fold(flat: Array, folds, mode: str):
    """Quantize gather-source rows and fold the dequant scale into each
    consumer weight. folds: [(c0, weight, groups), ...] with c0 the
    consumer's channel offset in ``flat``. Returns (_QuantRows, [weight'])."""
    q, s = _quantize_rows(flat, mode)
    out_w = []
    for c0, w, g in folds:
        cin = w.shape[2] * g
        out_w.append(_fold_scale(w, g, s[c0:c0 + cin]))
    return _QuantRows(q, flat.dtype), out_w


class FlatLevels(NamedTuple):
    """Concatenated multi-level feature buffer + static level metadata."""
    flat: Array                      # (B * sum(HW_l), C)
    B: int
    shapes: Tuple[Tuple[int, int], ...]
    offsets: Tuple[int, ...]         # start row of each level (per image)
    total: int                       # sum(HW_l)


def pack_levels(feats: Sequence[Array]) -> FlatLevels:
    """[(B,H,W,C)...] -> row-major concat (B*N, C) with per-level offsets.

    Layout: image-major — rows [b*N + off_l + y*W_l + x]."""
    B = feats[0].shape[0]
    C = feats[0].shape[-1]
    shapes = tuple((f.shape[1], f.shape[2]) for f in feats)
    sizes = [h * w for h, w in shapes]
    offs = tuple(int(x) for x in np.cumsum([0] + sizes[:-1]))
    total = int(sum(sizes))
    flat = jnp.concatenate(
        [f.reshape(B, -1, C) for f in feats], axis=1).reshape(B * total, C)
    return FlatLevels(flat, B, shapes, offs, total)


def _corner_data(ys: Array, xs: Array, H: int, W: int, base_row: Array
                 ) -> Tuple[List[Array], List[Array]]:
    """4-corner flat indices + tent weights for samples in one level.

    ys/xs: (B, P) f32; base_row: (B, 1) int32 row offset of this level per
    image. Returns lists of 4 ((B,P) idx, (B,P) w) — or lists of 1 under
    nearest sampling, or 9 under nearest_ste (see ``SAMPLING``)."""

    def nearest_part():
        yi = jnp.round(ys).astype(jnp.int32)
        xi = jnp.round(xs).astype(jnp.int32)
        v = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idx = (jnp.clip(yi, 0, H - 1) * W
               + jnp.clip(xi, 0, W - 1)) + base_row
        return idx, v.astype(jnp.float32)

    def bilinear_part():
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        idxs, ws = [], []
        for dy in (0, 1):
            yi = y0i + dy
            wy = 1.0 - jnp.abs(ys - y0 - dy)
            yv = (yi >= 0) & (yi < H)
            for dx in (0, 1):
                xi = x0i + dx
                wx = 1.0 - jnp.abs(xs - x0 - dx)
                v = yv & (xi >= 0) & (xi < W)
                idx = (jnp.clip(yi, 0, H - 1) * W
                       + jnp.clip(xi, 0, W - 1)) + base_row
                idxs.append(idx)
                ws.append(wy * wx * v)
        return idxs, ws

    if SAMPLING[0] == "nearest":
        idx, w = nearest_part()
        return [idx], [w]
    if SAMPLING[0] == "nearest_ste":
        # Straight-through nearest (nearest-AWARE TRAINING): forward value
        # is the 1-read rounded sample; gradients are the bilinear path's
        # (tent weights carry offset gradients; the +bilinear/-sg(bilinear)
        # pair cancels in value but leaves d(bilinear) on the tape). Train
        # with this, deploy with "nearest" — the offsets learn to live on
        # the rounded lattice, recovering the AP the post-hoc nearest
        # switch loses at tower/refine sites. 9 reads/tap (train-only;
        # inference uses the 1-read "nearest" mode).
        idx_n, w_n = nearest_part()
        idxs_b, ws_b = bilinear_part()
        neg = [-jax.lax.stop_gradient(w) for w in ws_b]
        return [idx_n] + idxs_b + idxs_b, [w_n] + ws_b + neg
    return bilinear_part()


# Transient-memory budget for the gathered-patch tensor, in ELEMENTS
# (rows * K * C). Above this the gather+matmul pipeline runs in pixel
# chunks via lax.map — peak HBM becomes one chunk instead of the full
# (rows, C) patch tensor (the r1 inference-OOM at batch 8). Default is
# sized so the proven batch-4 @800x1344 tower gathers (206M elems) stay
# single-pass and batch-8 splits in two.
_CHUNK_BUDGET_ELEMS = [256 * 1024 * 1024]


def set_chunk_budget(elems: Optional[int]) -> None:
    """Set the patch-transient budget (elements); None disables chunking."""
    _CHUNK_BUDGET_ELEMS[0] = int(elems) if elems else (1 << 62)


def _blockdiag_weight(weight: Array, K: int, groups: int) -> Array:
    """Grouped weight (kh, kw, C/G, cout) -> dense block-diagonal
    (K * C, cout) so grouped deform-conv contracts as ONE dense MXU matmul.

    Measured on v5e: the 'natural' grouped einsum (G batched tiny matmuls,
    e.g. G=64 x (36 x 16) for X-101-64x4d stage3) lowers catastrophically
    (2.2 s/fwd for the X-101 backbone); the dense block-diagonal form wastes
    G x FLOPs on zeros but rides the same fast path as the ungrouped engine.
    """
    G = groups
    Cg = weight.shape[2]
    cout = weight.shape[-1]
    outG = cout // G
    w = weight.reshape(K, Cg, G, outG)
    eye = jnp.eye(G, dtype=weight.dtype)
    # row index (k, g, c), col index (h, j); nonzero only when g == h
    wd = jnp.einsum("kcgj,gh->kgchj", w, eye)
    return wd.reshape(K * Cg * G, G * outG)


def _contract_rows(vals2d: Array, weight: Array, K: int, groups: int
                   ) -> Array:
    """(px, K*C) patch rows -> (px, cout) via one contraction.

    groups > 1 routes to the Pallas sub-blocked grouped kernel
    (:mod:`lsnet_tpu.ops.pallas_grouped`, 8x fewer FLOPs at X101 stage3
    than the dense block-diagonal form) when the shape qualifies; dense
    block-diag is the fallback (and the parity oracle in tests)."""
    cdt = vals2d.dtype
    cout = weight.shape[-1]
    if groups > 1:
        from .pallas_grouped import (ENABLED, grouped_deform_contract,
                                     supported)
        Cg = weight.shape[2]
        if ENABLED[0] and supported(K, Cg * groups, groups, cout):
            w3 = weight.reshape(K, Cg, cout).astype(cdt)
            return grouped_deform_contract(vals2d, w3, K, groups)
    C = vals2d.shape[-1] // K
    wmat = (weight.reshape(K * C, cout) if groups == 1
            else _blockdiag_weight(weight, K, groups)).astype(cdt)
    return jax.lax.dot_general(
        vals2d, wmat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt)


class SampleJob(NamedTuple):
    """One deformable sampling job: offset field -> samples in one level."""
    src_level: int
    offset: Array                    # (B, Ho, Wo, 2K) [y,x] interleaved
    mask: Optional[Array]            # (B, Ho, Wo, K) or None
    scale: Tuple[float, float]       # base-coordinate scale (pyramid)
    stride: Tuple[int, int]
    padding: Tuple[int, int]
    dilation: Tuple[int, int]
    # optional tap subset: (kh, kw, row-major indices kept). When set the
    # offset/mask fields are already sliced to len(indices) taps and the
    # base tap displacements come from the FULL (kh, kw) grid.
    taps: Optional[Tuple[int, int, Tuple[int, ...]]] = None


def _job_coords(job: SampleJob, K: int, tap_major: bool = False
                ) -> Tuple[Array, Array]:
    """Sample coordinates (B, Ho*Wo*K) in the source level's pixel units.

    ``tap_major`` orders samples (k, y, x) instead of (y, x, k): the
    gathered rows then reshape to (K, px, C) as a bitcast and contract as
    a K-batched matmul — measured 1.16x over the (px, K*C) interleave at
    X101 stage3 (docs/PERF.md round 4)."""
    B, Ho, Wo, _ = job.offset.shape
    if job.taps is not None:
        kh, kw, sel = job.taps
    else:
        kh = kw = int(np.sqrt(K))
        sel = None
    f32 = jnp.float32
    off = job.offset.reshape(B, Ho, Wo, K, 2).astype(f32)
    hs = (jnp.arange(Ho, dtype=f32) * job.stride[0]
          - job.padding[0])[None, :, None, None]
    ws = (jnp.arange(Wo, dtype=f32) * job.stride[1]
          - job.padding[1])[None, None, :, None]
    dyy = jnp.repeat(jnp.arange(kh, dtype=f32) * job.dilation[0], kw)
    dxx = jnp.tile(jnp.arange(kw, dtype=f32) * job.dilation[1], kh)
    if sel is not None:
        sel_ix = np.asarray(sel, np.int32)
        dyy = dyy[sel_ix]
        dxx = dxx[sel_ix]
    base_y = (hs + dyy[None, None, None, :]) * job.scale[0]
    base_x = (ws + dxx[None, None, None, :]) * job.scale[1]
    ys = base_y + off[..., 0]
    xs = base_x + off[..., 1]
    if tap_major:
        ys = ys.transpose(0, 3, 1, 2)
        xs = xs.transpose(0, 3, 1, 2)
    return ys.reshape(B, -1), xs.reshape(B, -1)


# Tap-major quad path (round 4): samples ordered (k, px) so the gathered
# rows reshape to (K, px, C) as a bitcast and contract as a K-batched
# matmul + sum — measured 1.16x over the (px, K*C) interleave at X101
# stage3/4 widths (docs/PERF.md round 4). Applies to the quad (non-paired)
# path; the paired path keeps its px-major layout (its win is the halved
# backward scatter count, and pairing measured slower in tap form).
TAP_MAJOR = [True]


def _gather_indices_tap(levels: FlatLevels, jobs: Sequence[SampleJob],
                        K: int):
    """Tap-major flat corner indices + weights.

    Returns (idx_cat (4, K, totpx) int32, w_cat (4, K, totpx) f32,
    job_sizes) with totpx = sum_j B*HW_j; pixel order (job, b, y, x)."""
    B = levels.B
    img_base = (jnp.arange(B, dtype=jnp.int32) * levels.total)[:, None]
    all_idx: List[Array] = []
    all_w: List[Array] = []
    job_sizes: List[int] = []
    for job in jobs:
        H, W = levels.shapes[job.src_level]
        ys, xs = _job_coords(job, K, tap_major=True)      # (B, K*HW)
        base_row = img_base + levels.offsets[job.src_level]
        idxs, ws = _corner_data(ys, xs, H, W, base_row)
        if job.mask is not None:
            m = job.mask.transpose(0, 3, 1, 2).reshape(B, -1)
            ws = [w * m.astype(jnp.float32) for w in ws]
        hw = ys.shape[1] // K
        nc = len(idxs)
        job_sizes.append(ys.shape[1])                     # samples (HW*K)
        i4 = jnp.stack(idxs).reshape(nc, B, K, hw).transpose(0, 2, 1, 3)
        w4 = jnp.stack(ws).reshape(nc, B, K, hw).transpose(0, 2, 1, 3)
        all_idx.append(i4.reshape(nc, K, -1))
        all_w.append(w4.reshape(nc, K, -1))
    idx_cat = jnp.concatenate(all_idx, axis=2)
    w_cat = jnp.concatenate(all_w, axis=2)
    return idx_cat, w_cat, job_sizes


def _tap_weight(weight: Array, K: int, groups: int, dtype) -> Array:
    """(kh, kw, C/G, cout) -> (K, C, cout) (block-diagonal when grouped)."""
    C = weight.shape[2] * groups
    cout = weight.shape[-1]
    if groups == 1:
        return weight.reshape(K, C, cout).astype(dtype)
    return _blockdiag_weight(weight, K, groups).reshape(K, C, cout
                                                        ).astype(dtype)


def _tap_gather_contract(flat: Array, idx_cat: Array, w_cat: Array,
                         wk: Array) -> Array:
    """4-corner gather-accumulate + K-batched matmul + sum over K.

    idx/w (nc, K, px); wk (K, C, cout) -> (px, cout)."""
    cdt = flat.dtype
    nc = idx_cat.shape[0]
    i = idx_cat.reshape(nc, -1)
    w = w_cat.reshape(nc, -1)
    vals = flat[i[0]] * w[0][:, None].astype(cdt)
    for c in range(1, nc):
        vals = vals + flat[i[c]] * w[c][:, None].astype(cdt)
    K, px = idx_cat.shape[1], idx_cat.shape[2]
    v = vals.reshape(K, px, -1)
    out = jax.lax.dot_general(v, wk, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    return out.sum(axis=0).astype(cdt)


def _chunked_tap_matmul(flat: Array, idx_cat: Array, w_cat: Array,
                        wk: Array, nchunks: int) -> Array:
    """Pixel-chunked tap-major gather+contract (lax.map) — bounds the
    patch transient exactly like :func:`_chunked_gather_matmul`."""
    nc, K, total_px = idx_cat.shape
    px_c = -(-total_px // nchunks)
    pad = px_c * nchunks - total_px
    if pad:
        idx_cat = jnp.pad(idx_cat, ((0, 0), (0, 0), (0, pad)))
        w_cat = jnp.pad(w_cat, ((0, 0), (0, 0), (0, pad)))
    idx_ch = (idx_cat.reshape(nc, K, nchunks, px_c).transpose(2, 0, 1, 3)
              .reshape(nchunks, nc, K * px_c))
    w_ch = (w_cat.reshape(nc, K, nchunks, px_c).transpose(2, 0, 1, 3)
            .reshape(nchunks, nc, K * px_c))

    # remat per chunk: lax.map's backward otherwise STACKS each chunk's
    # saved patch/gradient tensors into full-size (nchunks, ...) residual
    # buffers, defeating the chunking (measured: 9+ GB of HLO temps at B4
    # train, work/train_b4.log round 4)
    @jax.checkpoint
    def one(args):
        ic, wc = args
        return _tap_gather_contract(flat, ic.reshape(nc, K, px_c),
                                    wc.reshape(nc, K, px_c), wk)

    out = jax.lax.map(one, (idx_ch, w_ch))
    return out.reshape(-1, out.shape[-1])[:total_px]


# Row-pair gather: the two x-corners (x0, x0+1) of a bilinear sample are
# CONTIGUOUS in the row-major flat buffer, so they can be fetched as ONE
# 2C-wide row from a pair-expanded view — half the gather descriptors at
# twice the row width. Measured on v5e: +9% on 512B-1KB rows (R50 widths,
# 256-ch head towers) but -8% at 2-4KB rows (X101 stage3/4), where the
# quad gather is already descriptor-amortized and the pair-view copy costs
# a pass. Enabled only up to PAIRED_MAX_C channels.
PAIRED_X = [True]
PAIRED_MAX_C = [512]

# Quad-corner view: ALL FOUR bilinear corners of a sample as ONE 4C-wide
# row from a corner-expanded per-level buffer (channel-concat of the
# identity and the +x/+y/+xy shifts) — one gather descriptor per
# (tap, sample) instead of the pair path's two, at twice the pair row
# width. The XLA:TPU gather unit is descriptor-rate bound at these widths
# (r4 rate matrix, docs/PERF.md), so fewer, wider rows win.
#
# Round-4b combine: the first quad A/B lost because the combine SLICED the
# 4C row four ways (one slice per corner), de-fusing the gather from the
# matmul. The current combine never slices within a range: the gathered
# (K, px, 4C) rows reshape (free, row-major) to (K, px, 4, C), multiply by
# the per-sample corner weights (broadcast — fuses into the gather
# consumer), reshape back, and contract against the conv weight STACKED
# 4x along the contraction axis (K, 4C, cout) — the matmul itself sums
# the corners. 4x the contraction FLOPs, but the DCN contractions are
# ~0.1 ms/layer next to ~6.5 ms of gather (docs/PERF.md round 4).
# The backward becomes ONE scatter of 4C rows (plus dense fold) instead
# of two 2C scatters — the train-step scatter wall at half the
# descriptor count. Gated; A/B-measured before default-on.
QUAD_X = [os.environ.get("LSNET_DCN_QUAD", "0") == "1"]
QUAD_MAX_C = [int(os.environ.get("LSNET_DCN_QUAD_MAXC", "512"))]


def _use_quad(C: int) -> bool:
    return (QUAD_X[0] and C <= QUAD_MAX_C[0]
            and SAMPLING[0] == "bilinear")


def _quad_view_levels(levels: FlatLevels,
                      ranges: Optional[Sequence[Tuple[int, int]]] = None
                      ) -> FlatLevels:
    """Corner-expanded copy of the level buffer.

    Per level (B, H, W, C) -> (B, H+1, W+1, 4C) where cell (y, x) of the
    expanded grid (y, x in [-1..H-1] x [-1..W-1], stored at +1) holds
    [src[y, x], src[y, x+1], src[y+1, x], src[y+1, x+1]] with zero padding
    outside — the four bilinear corners of any sample whose floor corner
    is (y, x). One extra 4x copy of the branch features; small next to the
    gathered-patch traffic it accelerates.

    ``ranges``: channel ranges [(c0, c1), ...] laid out RANGE-MAJOR in the
    expanded row ([range0: 4 corners x Cr0, range1: ...]) so each
    consumer's contraction slice is contiguous (dual/multi-branch paths).
    """
    B, C = levels.B, levels.flat.shape[-1]
    if ranges is None:
        ranges = [(0, C)]
    f3 = levels.flat.reshape(B, levels.total, C)
    qfeats = []
    for (H, W), off in zip(levels.shapes, levels.offsets):
        lvl = f3[:, off:off + H * W].reshape(B, H, W, C)
        p = jnp.pad(lvl, ((0, 0), (1, 1), (1, 1), (0, 0)))
        parts = []
        for c0, c1 in ranges:
            parts += [p[:, :-1, :-1, c0:c1], p[:, :-1, 1:, c0:c1],
                      p[:, 1:, :-1, c0:c1], p[:, 1:, 1:, c0:c1]]
        qfeats.append(jnp.concatenate(parts, axis=-1))
    return pack_levels(qfeats)


def _corner_quad(ys: Array, xs: Array, H: int, W: int, base_row: Array):
    """Quad-row index + 4 corner weights for samples in one level.

    idx addresses the (H+1, W+1) corner-expanded grid at the sample's
    floor corner (clipped; any clipped corner carries zero weight)."""
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    wx0 = (1.0 - (xs - x0)) * ((x0i >= 0) & (x0i < W))
    wx1 = (1.0 - jnp.abs(xs - x0 - 1.0)) * ((x0i + 1 >= 0) & (x0i + 1 < W))
    wy0 = (1.0 - (ys - y0)) * ((y0i >= 0) & (y0i < H))
    wy1 = (1.0 - jnp.abs(ys - y0 - 1.0)) * ((y0i + 1 >= 0) & (y0i + 1 < H))
    idx = ((jnp.clip(y0i, -1, H - 1) + 1) * (W + 1)
           + (jnp.clip(x0i, -1, W - 1) + 1) + base_row)
    w4 = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    return idx, w4


def _gather_indices_quad_tap(levels: FlatLevels, qlevels: FlatLevels,
                             jobs: Sequence["SampleJob"], K: int):
    """Tap-major quad indices: (idx (K, totpx) int32, w (K, totpx, 4) f32,
    job_sizes).

    ``levels`` supplies the ORIGINAL (H, W) for coordinates/weights;
    ``qlevels`` supplies the expanded buffer's offsets/strides. Pixel order
    within the px axis is (job, b, y, x) — same as the base tap path."""
    B = levels.B
    img_base = (jnp.arange(B, dtype=jnp.int32) * qlevels.total)[:, None]
    all_idx: List[Array] = []
    all_w: List[Array] = []
    job_sizes: List[int] = []
    for job in jobs:
        H, W = levels.shapes[job.src_level]
        ys, xs = _job_coords(job, K, tap_major=True)      # (B, K*HW)
        base_row = img_base + qlevels.offsets[job.src_level]
        idx, w4 = _corner_quad(ys, xs, H, W, base_row)    # (B,P), (B,P,4)
        if job.mask is not None:
            m = job.mask.transpose(0, 3, 1, 2).reshape(B, -1)
            w4 = w4 * m.astype(jnp.float32)[..., None]
        hw = ys.shape[1] // K
        job_sizes.append(ys.shape[1])
        i = idx.reshape(B, K, hw).transpose(1, 0, 2)
        w = w4.reshape(B, K, hw, 4).transpose(1, 0, 2, 3)
        all_idx.append(i.reshape(K, -1))
        all_w.append(w.reshape(K, -1, 4))
    idx_cat = jnp.concatenate(all_idx, axis=1)
    w_cat = jnp.concatenate(all_w, axis=1)
    return idx_cat, w_cat, job_sizes


def _quad_tap_weight(weight: Array, K: int, groups: int, dtype) -> Array:
    """(kh, kw, C/G, cout) -> (K, 4C, cout): the conv weight stacked 4x
    along the contraction axis so the matmul itself sums the 4 corners of
    the quad row (no slicing in the combine)."""
    wk = _tap_weight(weight, K, groups, dtype)            # (K, C, cout)
    return jnp.concatenate([wk] * 4, axis=1)


def _tap_quad_contract(qflat: Array, idx_cat: Array, w_cat: Array,
                       contracts_q) -> List[Array]:
    """ONE quad gather + fused corner-weight scale + contraction.

    idx (K, px); w (K, px, 4); contracts_q: list of (qoff, Cr, wmat, fold)
    with qoff the range's channel offset in the quad row. fold=False:
    wmat (K, 4*Cr, cout) from :func:`_quad_tap_weight` — the stacked-W dot
    sums the corners inside the matmul (groups == 1; 4x the contraction
    FLOPs, noise next to the gather). fold=True: wmat (K, Cr, cout)
    (block-diagonal when grouped) and the corners are reduced before the
    dot — grouped weights would otherwise pay 4x an already G x-padded
    block-diagonal matmul. Returns per-contract (px, cout). The only
    slices are per-RANGE (contiguous, one per consumer — same pattern as
    the base multi-branch path); within a range the corner fold is
    reshape (free) -> broadcast-multiply -> dot/reduce."""
    cdt = qflat.dtype
    K, px = idx_cat.shape
    if len(contracts_q) == 1 and not contracts_q[0][3]:
        # Single full-width stacked-W range: routable through the
        # scalar-prefetch DMA-gather kernel (LSNET_PALLAS_DMA_GATHER=1,
        # default off — see ops/pallas_dma_gather.py for the toolchain
        # status) which keeps the gathered patch out of HBM entirely.
        qoff, Cr, wmat, _ = contracts_q[0]
        from . import pallas_dma_gather as _pdg
        if (_pdg.ENABLED[0] and qoff == 0
                and 4 * Cr == qflat.shape[-1]
                and _pdg.supported(4 * Cr, wmat.shape[-1], cdt)):
            o = _pdg.dma_quad_contract(qflat, idx_cat, w_cat, wmat)
            return [o.astype(cdt)]
    g = qflat[idx_cat.reshape(-1)].reshape(K, px, -1)     # (K, px, 4C_tot)
    outs = []
    for qoff, Cr, wmat, fold in contracts_q:
        v = g[..., qoff:qoff + 4 * Cr]   # full-width slice is a no-op
        v = v.reshape(K, px, 4, Cr) * w_cat[..., None].astype(cdt)
        v = v.sum(axis=2) if fold else v.reshape(K, px, 4 * Cr)
        o = jax.lax.dot_general(
            v, wmat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append(o.sum(axis=0).astype(cdt))
    return outs


def _chunked_tap_quad_matmul(qflat: Array, idx_cat: Array, w_cat: Array,
                             contracts_q, nchunks: int) -> List[Array]:
    """Pixel-chunked variant of :func:`_tap_quad_contract` (see
    :func:`_chunked_gather_matmul` for the memory rationale)."""
    K, total_px = idx_cat.shape
    px_c = -(-total_px // nchunks)
    pad = px_c * nchunks - total_px
    if pad:
        idx_cat = jnp.pad(idx_cat, ((0, 0), (0, pad)))
        w_cat = jnp.pad(w_cat, ((0, 0), (0, pad), (0, 0)))
    idx_ch = (idx_cat.reshape(K, nchunks, px_c).transpose(1, 0, 2)
              .reshape(nchunks, K * px_c))
    w_ch = (w_cat.reshape(K, nchunks, px_c, 4).transpose(1, 0, 2, 3)
            .reshape(nchunks, K * px_c * 4))

    # remat per chunk (see _chunked_tap_matmul)
    @jax.checkpoint
    def one(args):
        ic, wc = args
        return tuple(_tap_quad_contract(
            qflat, ic.reshape(K, px_c), wc.reshape(K, px_c, 4),
            contracts_q))

    outs = jax.lax.map(one, (idx_ch, w_ch))
    return [o.reshape(-1, o.shape[-1])[:total_px] for o in outs]


def _run_quad(lv: FlatLevels, jb: Sequence["SampleJob"], K: int,
              ranges, weights, groups_list) -> Tuple[List[Array], List[int]]:
    """Full quad pipeline: expanded buffer -> tap-major quad gather ->
    per-range stacked-W contraction. Returns (per-range (px, cout), sizes)."""
    C = lv.flat.shape[-1]
    qlv = _quad_view_levels(lv, ranges)
    idx_cat, w_cat, job_sizes = _gather_indices_quad_tap(lv, qlv, jb, K)
    contracts_q = []
    qoff = 0
    for (c0, c1), w, g in zip(ranges, weights, groups_list):
        Cr = c1 - c0
        if g == 1:
            contracts_q.append((qoff, Cr,
                                _quad_tap_weight(w, K, 1, lv.flat.dtype),
                                False))
        else:
            contracts_q.append((qoff, Cr,
                                _tap_weight(w, K, g, lv.flat.dtype), True))
        qoff += 4 * Cr
    rows = lv.B * sum(j.offset.shape[1] * j.offset.shape[2] * K for j in jb)
    if rows * 4 * C > _CHUNK_BUDGET_ELEMS[0]:
        nchunks = -(-rows * 4 * C // _CHUNK_BUDGET_ELEMS[0])
        return (_chunked_tap_quad_matmul(qlv.flat, idx_cat, w_cat,
                                         contracts_q, int(nchunks)),
                job_sizes)
    return _tap_quad_contract(qlv.flat, idx_cat, w_cat,
                              contracts_q), job_sizes


def _use_paired(C: int) -> bool:
    return (PAIRED_X[0] and C <= PAIRED_MAX_C[0]
            and SAMPLING[0] == "bilinear")


def _corner_pairs(ys: Array, xs: Array, H: int, W: int, base_row: Array):
    """Pair-row indices + per-half weights for samples in one level.

    Returns 2 (idx (B,P), w (B,P,2)) tuples — one per y-corner. idx points
    at the (x0) element; the pair view supplies (x0, x0+1). x0 is used
    UNCLAMPED in the index so the +1 neighbour stays positionally correct;
    out-of-range halves carry zero weight (the final clip only guards the
    buffer bounds)."""
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    wx0 = (1.0 - (xs - x0)) * ((x0i >= 0) & (x0i < W))
    x1i = x0i + 1
    wx1 = (1.0 - jnp.abs(xs - x0 - 1.0)) * ((x1i >= 0) & (x1i < W))
    out = []
    for dy in (0, 1):
        yi = y0i + dy
        yv = (yi >= 0) & (yi < H)
        wy = (1.0 - jnp.abs(ys - y0 - dy)) * yv
        idx = jnp.clip(yi, 0, H - 1) * W + x0i + base_row
        out.append((idx, jnp.stack([wy * wx0, wy * wx1], axis=-1)))
    return out


def _pair_view(flat: Array) -> Array:
    """(N, C) -> (N+1, 2C) where row r = [flat[r-1], flat[r]] with zero
    rows beyond both ends; indexed at ``idx + 1`` so the off-by-one left
    sample at idx = -1 still pairs the correct right element (x = 0).
    One extra copy of the feature buffer — small next to the
    gathered-patch transient it accelerates."""
    if isinstance(flat, _QuantRows):
        return _QuantRows(_pair_view(flat.q), flat.dtype)
    C = flat.shape[1]
    z = jnp.zeros((1, C), flat.dtype)
    padded = jnp.concatenate([z, flat, z], axis=0)        # (N+2, C)
    return jnp.concatenate([padded[:-1], padded[1:]], axis=1)


def _gather_indices_paired(levels: FlatLevels, jobs: Sequence[SampleJob],
                           K: int):
    """Paired variant of :func:`_gather_indices`.

    Returns (idx_cat (2, rows) int32, w_cat (2, rows, 2) f32, job_sizes)."""
    B = levels.B
    img_base = (jnp.arange(B, dtype=jnp.int32) * levels.total)[:, None]
    all_idx: List[Array] = []
    all_w: List[Array] = []
    job_sizes: List[int] = []
    for job in jobs:
        H, W = levels.shapes[job.src_level]
        ys, xs = _job_coords(job, K)
        base_row = img_base + levels.offsets[job.src_level]
        pairs = _corner_pairs(ys, xs, H, W, base_row)
        if job.mask is not None:
            m = job.mask.reshape(B, -1).astype(jnp.float32)
            pairs = [(i, w * m[..., None]) for i, w in pairs]
        job_sizes.append(ys.shape[1])
        all_idx.append(jnp.stack([p[0] for p in pairs]))      # (2, B, P)
        all_w.append(jnp.stack([p[1] for p in pairs]))        # (2, B, P, 2)
    idx_cat = jnp.concatenate([i.reshape(2, -1) for i in all_idx], axis=1)
    w_cat = jnp.concatenate([w.reshape(2, -1, 2) for w in all_w], axis=1)
    # +1 for the zero row prepended by _pair_view; clip guards the bounds
    # (any clipped row carries zero weight)
    n_rows = levels.flat.shape[0]
    idx_cat = jnp.clip(idx_cat + 1, 0, n_rows)
    return idx_cat, w_cat, job_sizes


def _paired_combine(pairs_buf: Array, idx_cat: Array, w_cat: Array,
                    C: int, split_at: Optional[int] = None):
    """2 pair-gathers + weighted fold -> (rows, C) sample values (or two
    channel-half tensors with ``split_at``)."""
    cdt = pairs_buf.dtype

    def half(g, w):                                   # g (rows, 2C)
        gl = g[:, :C]
        gr = g[:, C:]
        return gl * w[:, 0, None].astype(cdt) + gr * w[:, 1, None].astype(cdt)

    if split_at is None:
        vals = half(pairs_buf[idx_cat[0]], w_cat[0])
        return vals + half(pairs_buf[idx_cat[1]], w_cat[1])
    outs = []
    g0 = pairs_buf[idx_cat[0]]
    g1 = pairs_buf[idx_cat[1]]
    for lo, hi in ((0, split_at), (split_at, C)):
        def halfs(g, w):
            gl = g[:, lo:hi]
            gr = g[:, C + lo:C + hi]
            return (gl * w[:, 0, None].astype(cdt)
                    + gr * w[:, 1, None].astype(cdt))
        outs.append(halfs(g0, w_cat[0]) + halfs(g1, w_cat[1]))
    return tuple(outs)


def _gather_indices(levels: FlatLevels, jobs: Sequence[SampleJob], K: int):
    """Flat corner indices + tent weights for all jobs.

    Returns (idx_cat (4, rows) int32, w_cat (4, rows) f32, job_sizes)."""
    B = levels.B
    img_base = (jnp.arange(B, dtype=jnp.int32) * levels.total)[:, None]
    all_idx: List[Array] = []
    all_w: List[Array] = []
    job_sizes: List[int] = []
    for job in jobs:
        H, W = levels.shapes[job.src_level]
        ys, xs = _job_coords(job, K)                      # (B, P)
        base_row = img_base + levels.offsets[job.src_level]
        idxs, ws = _corner_data(ys, xs, H, W, base_row)
        if job.mask is not None:
            m = job.mask.reshape(B, -1).astype(jnp.float32)
            ws = [w * m for w in ws]
        job_sizes.append(ys.shape[1])
        all_idx.append(jnp.stack(idxs))
        all_w.append(jnp.stack(ws))
    nc = all_idx[0].shape[0]
    idx_cat = jnp.concatenate([i.reshape(nc, -1) for i in all_idx], axis=1)
    w_cat = jnp.concatenate([w.reshape(nc, -1) for w in all_w], axis=1)
    return idx_cat, w_cat, job_sizes


def _chunked_paired_matmul(pairs_buf: Array, idx_cat: Array, w_cat: Array,
                           C: int, contracts, K: int,
                           nchunks: int) -> List[Array]:
    """Pixel-chunked variant of the paired gather (see
    :func:`_chunked_gather_matmul` for the memory rationale)."""
    rows = idx_cat.shape[1]
    total_px = rows // K
    px_c = -(-total_px // nchunks)
    pad = px_c * nchunks - total_px
    idx_px = idx_cat.reshape(2, total_px, K)
    w_px = w_cat.reshape(2, total_px, K, 2)
    if pad:
        idx_px = jnp.pad(idx_px, ((0, 0), (0, pad), (0, 0)))
        w_px = jnp.pad(w_px, ((0, 0), (0, pad), (0, 0), (0, 0)))
    # flatten per-chunk index/weight blocks to (2, px_c*K[*2]): a trailing
    # dim of K=9 pads 14x under the TPU (8,128) tile layout (262 MB per
    # 18 MB logical buffer, work/train_b4.log round 4)
    idx_ch = (idx_px.reshape(2, nchunks, px_c, K).transpose(1, 0, 2, 3)
              .reshape(nchunks, 2, px_c * K))
    w_ch = (w_px.reshape(2, nchunks, px_c, K, 2).transpose(1, 0, 2, 3, 4)
            .reshape(nchunks, 2, px_c * K * 2))
    cdt = pairs_buf.dtype

    # remat per chunk (see _chunked_tap_matmul)
    @jax.checkpoint
    def one(args):
        ic, wc = args
        g = _paired_combine(pairs_buf, ic.reshape(2, -1),
                            wc.reshape(2, -1, 2), C)
        outs = []
        for (c0, c1, weight, groups) in contracts:
            v = g[:, c0:c1]
            Cc = c1 - c0
            outs.append(_contract_rows(v.reshape(px_c, K * Cc), weight, K,
                                       groups))
        return tuple(outs)

    outs = jax.lax.map(one, (idx_ch, w_ch))
    return [o.reshape(-1, o.shape[-1])[:total_px] for o in outs]


def _chunked_gather_matmul(flat: Array, idx_cat: Array, w_cat: Array,
                           contracts, K: int, nchunks: int) -> List[Array]:
    """Gather + corner-combine + matmul in pixel chunks (lax.map).

    Peak patch transient = one chunk instead of the full (rows, C) tensor —
    this is what lets batch-8 inference / large-canvas training fit HBM.

    contracts: list of (ch_start, ch_end, weight (k,k,Cin_g,cout), groups);
    each contract consumes a channel slice of the gathered rows.
    Returns per-contract (total_px, cout) arrays.
    """
    cdt = flat.dtype
    nc, rows = idx_cat.shape
    total_px = rows // K
    px_c = -(-total_px // nchunks)
    pad = px_c * nchunks - total_px
    idx_px = idx_cat.reshape(nc, total_px, K)
    w_px = w_cat.reshape(nc, total_px, K)
    if pad:
        idx_px = jnp.pad(idx_px, ((0, 0), (0, pad), (0, 0)))
        w_px = jnp.pad(w_px, ((0, 0), (0, pad), (0, 0)))
    # flattened chunk blocks + per-chunk remat: see _chunked_paired_matmul
    idx_ch = (idx_px.reshape(nc, nchunks, px_c, K).transpose(1, 0, 2, 3)
              .reshape(nchunks, nc, px_c * K))
    w_ch = (w_px.reshape(nc, nchunks, px_c, K).transpose(1, 0, 2, 3)
            .reshape(nchunks, nc, px_c * K))

    @jax.checkpoint
    def one(args):
        ic, wc = args                                    # (nc, px_c*K)
        g = flat[ic[0].reshape(-1)] * wc[0].reshape(-1)[:, None].astype(cdt)
        for corner in range(1, nc):
            g = g + (flat[ic[corner].reshape(-1)]
                     * wc[corner].reshape(-1)[:, None].astype(cdt))
        outs = []
        for (c0, c1, weight, groups) in contracts:
            v = g[:, c0:c1]                              # (px_c*K, C)
            C = c1 - c0
            outs.append(_contract_rows(v.reshape(px_c, K * C), weight, K,
                                       groups))
        return tuple(outs)

    outs = jax.lax.map(one, (idx_ch, w_ch))
    return [o.reshape(-1, o.shape[-1])[:total_px] for o in outs]


def _split_jobs(out: Array, jobs: Sequence[SampleJob],
                job_sizes: List[int], K: int, B: int) -> List[Array]:
    """(total_px, Cout) -> per-job (B, Ho, Wo, Cout)."""
    outs: List[Array] = []
    row = 0
    cout = out.shape[-1]
    for job, P in zip(jobs, job_sizes):
        _, Ho, Wo, _ = job.offset.shape
        n_px = B * P // K
        outs.append(out[row:row + n_px].reshape(B, Ho, Wo, cout))
        row += n_px
    return outs


def _gather_weighted(levels: FlatLevels, jobs: Sequence[SampleJob], K: int,
                     split_at: Optional[int] = None):
    """One flat row-gather + tent-weighted corner combine for all jobs.

    Returns (vals (B*ΣP, C), per-job sample counts P); with ``split_at``,
    vals is a tuple of the two channel halves (separate contiguous
    buffers accumulated in the same fusion)."""
    B = levels.B
    C = levels.flat.shape[-1]
    cdt = levels.flat.dtype
    img_base = (jnp.arange(B, dtype=jnp.int32) * levels.total)[:, None]

    all_idx: List[Array] = []
    all_w: List[Array] = []
    job_sizes: List[int] = []
    for job in jobs:
        H, W = levels.shapes[job.src_level]
        ys, xs = _job_coords(job, K)                      # (B, P)
        base_row = img_base + levels.offsets[job.src_level]
        idxs, ws = _corner_data(ys, xs, H, W, base_row)
        if job.mask is not None:
            m = job.mask.reshape(B, -1).astype(jnp.float32)
            ws = [w * m for w in ws]
        job_sizes.append(ys.shape[1])
        # corner-major within job: (nc, B, P)
        all_idx.append(jnp.stack(idxs))
        all_w.append(jnp.stack(ws))

    nc = all_idx[0].shape[0]
    idx_cat = jnp.concatenate([i.reshape(nc, -1) for i in all_idx],
                              axis=1)                     # (nc, B*ΣP)
    w_cat = jnp.concatenate([w.reshape(nc, -1) for w in all_w], axis=1)
    # corner-by-corner accumulation: peak transient is 2x(rows, C) instead
    # of (4*rows, C) — 4x less HBM and one fewer full write+read pass
    if split_at is None:
        vals = levels.flat[idx_cat[0]] * w_cat[0, :, None].astype(cdt)
        for corner in range(1, nc):
            vals = vals + (levels.flat[idx_cat[corner]]
                           * w_cat[corner, :, None].astype(cdt))
        return vals, job_sizes
    g0 = levels.flat[idx_cat[0]]
    w0 = w_cat[0, :, None].astype(cdt)
    vals_a = g0[:, :split_at] * w0
    vals_b = g0[:, split_at:] * w0
    for corner in range(1, nc):
        g = levels.flat[idx_cat[corner]]
        w = w_cat[corner, :, None].astype(cdt)
        vals_a = vals_a + g[:, :split_at] * w
        vals_b = vals_b + g[:, split_at:] * w
    return (vals_a, vals_b), job_sizes


def _contract_and_split(vals: Array, jobs: Sequence[SampleJob],
                        job_sizes: List[int], weight: Array, K: int, B: int,
                        groups: int = 1) -> List[Array]:
    """(rows, C) patches -> per-job (B, Ho, Wo, Cout) via one MXU matmul.

    ``groups`` > 1: grouped convolution (reference ResNeXt-DCN conv2,
    `code/mmdet/models/backbones/resnext.py` builds the DCN with
    groups=64) — weight is (kh, kw, C/groups, Cout) with group-major Cout;
    contraction becomes a G-batched matmul."""
    C = vals.shape[-1]
    cout = weight.shape[-1]
    total_px = vals.shape[0] // K
    out = _contract_rows(vals.reshape(total_px, K * C), weight, K,
                         groups)                          # (total_px, Cout)
    outs: List[Array] = []
    row = 0
    for job, P in zip(jobs, job_sizes):
        _, Ho, Wo, _ = job.offset.shape
        n_px = B * P // K
        outs.append(out[row:row + n_px].reshape(B, Ho, Wo, cout))
        row += n_px
    return outs


def batched_deform_matmul(levels: FlatLevels, jobs: Sequence[SampleJob],
                          weight: Array, K: int,
                          groups: int = 1,
                          site: Optional[str] = None) -> List[Array]:
    """Run all jobs through one gather + one matmul.

    weight: (kh, kw, C, Cout) shared conv kernel.
    Returns per-job (B, Ho, Wo, Cout) outputs.

    ``site`` tags the call for the hybrid sampling policy ("backbone" /
    "tower" / "refine", see ``SAMPLING_POLICY``); refine-site calls also
    honor the LSNET_REFINE_TAPS reduction.

    The whole pipeline is rematerialized under autodiff: the (rows, C)
    gathered-patch tensor (hundreds of MB per call) is recomputed in the
    backward pass instead of being stored — without this, training a full
    LSNet at 800x1344 overflows HBM by ~9 GB.
    """
    if site == "refine" and groups == 1:
        jobs, (weight,), K = _apply_refine_taps(jobs, [weight], K)

    def run(flat, jobs_off, weight):
        lv = levels._replace(flat=flat)
        jb = [j._replace(offset=o, mask=m)
              for j, (o, m) in zip(jobs, jobs_off)]
        C = flat.shape[-1]
        rows = levels.B * sum(
            j.offset.shape[1] * j.offset.shape[2] * K for j in jobs)
        over = rows * C > _CHUNK_BUDGET_ELEMS[0]
        if QUANT[0] != "off" and not _use_quad(C):
            flat, (weight,) = _quant_fold(flat, [(0, weight, groups)],
                                          QUANT[0])
            lv = lv._replace(flat=flat)
        if _use_quad(C):
            from .pallas_grouped import ENABLED, supported
            if not (groups > 1 and ENABLED[0]
                    and supported(K, C, groups, weight.shape[-1])):
                outs, job_sizes = _run_quad(lv, jb, K, [(0, C)], [weight],
                                            [groups])
                return _split_jobs(outs[0], jb, job_sizes, K, lv.B)
        if TAP_MAJOR[0] and not _use_paired(C):
            from .pallas_grouped import ENABLED, supported
            if not (groups > 1 and ENABLED[0]
                    and supported(K, C, groups, weight.shape[-1])):
                idx_cat, w_cat, job_sizes = _gather_indices_tap(lv, jb, K)
                wk = _tap_weight(weight, K, groups, flat.dtype)
                if over:
                    nchunks = -(-rows * C // _CHUNK_BUDGET_ELEMS[0])
                    out = _chunked_tap_matmul(flat, idx_cat, w_cat, wk,
                                              int(nchunks))
                else:
                    out = _tap_gather_contract(flat, idx_cat, w_cat, wk)
                return _split_jobs(out, jb, job_sizes, K, lv.B)
        if _use_paired(C):
            pairs = _pair_view(flat)
            idx_cat, w_cat, job_sizes = _gather_indices_paired(lv, jb, K)
            if over:
                nchunks = -(-rows * C // _CHUNK_BUDGET_ELEMS[0])
                out = _chunked_paired_matmul(
                    pairs, idx_cat, w_cat, C, [(0, C, weight, groups)], K,
                    int(nchunks))[0]
            else:
                vals = _paired_combine(pairs, idx_cat, w_cat, C)
                return _contract_and_split(vals, jb, job_sizes, weight, K,
                                           lv.B, groups)
            return _split_jobs(out, jb, job_sizes, K, lv.B)
        if over:
            idx_cat, w_cat, job_sizes = _gather_indices(lv, jb, K)
            nchunks = -(-rows * C // _CHUNK_BUDGET_ELEMS[0])
            out = _chunked_gather_matmul(
                flat, idx_cat, w_cat, [(0, C, weight, groups)], K,
                int(nchunks))[0]
            return _split_jobs(out, jb, job_sizes, K, lv.B)
        vals, job_sizes = _gather_weighted(lv, jb, K)
        return _contract_and_split(vals, jb, job_sizes, weight, K, lv.B,
                                   groups)

    jobs_off = [(j.offset, j.mask) for j in jobs]
    with _site_sampling(site):
        return jax.checkpoint(run)(levels.flat, jobs_off, weight)


def dual_pyramid_dcn(feats_a: Sequence[Array], feats_b: Sequence[Array],
                     jobs: Sequence[SampleJob], weight_a: Array,
                     weight_b: Array, site: Optional[str] = "refine"
                     ) -> Tuple[List[Array], List[Array]]:
    """Two branches sampled at IDENTICAL positions (e.g. the refine and cls
    branches share one offset field, `lsnet_head.py:635-638`): concatenate
    channels, gather ONCE with double-width rows (2.6x faster per byte on
    v5e — descriptor-rate bound), then two channel-sliced matmuls.
    Rematerialized under autodiff (see :func:`batched_deform_matmul`)."""
    Ca = feats_a[0].shape[-1]
    K = weight_a.shape[0] * weight_a.shape[1]
    if site == "refine":
        jobs, (weight_a, weight_b), K = _apply_refine_taps(
            jobs, [weight_a, weight_b], K)

    def run(feats_a, feats_b, jobs_off, weight_a, weight_b):
        cat = [jnp.concatenate([a, b], axis=-1)
               for a, b in zip(feats_a, feats_b)]
        levels = pack_levels(cat)
        jb = [j._replace(offset=o, mask=m)
              for j, (o, m) in zip(jobs, jobs_off)]
        C = levels.flat.shape[-1]
        rows = levels.B * sum(
            j.offset.shape[1] * j.offset.shape[2] * K for j in jb)
        over = rows * C > _CHUNK_BUDGET_ELEMS[0]
        if QUANT[0] != "off" and not _use_quad(C):
            fq, (weight_a, weight_b) = _quant_fold(
                levels.flat, [(0, weight_a, 1), (Ca, weight_b, 1)],
                QUANT[0])
            levels = levels._replace(flat=fq)
        if _use_quad(C):
            outs, job_sizes = _run_quad(levels, jb, K, [(0, Ca), (Ca, C)],
                                        [weight_a, weight_b], [1, 1])
            return (_split_jobs(outs[0], jb, job_sizes, K, levels.B),
                    _split_jobs(outs[1], jb, job_sizes, K, levels.B))
        if _use_paired(C):
            pairs = _pair_view(levels.flat)
            idx_cat, w_cat, job_sizes = _gather_indices_paired(levels, jb, K)
            contracts = [(0, Ca, weight_a, 1), (Ca, C, weight_b, 1)]
            if over:
                nchunks = -(-rows * C // _CHUNK_BUDGET_ELEMS[0])
                out_a, out_b = _chunked_paired_matmul(
                    pairs, idx_cat, w_cat, C, contracts, K, int(nchunks))
            else:
                vals_a, vals_b = _paired_combine(pairs, idx_cat, w_cat, C,
                                                 split_at=Ca)
                outs_a = _contract_and_split(vals_a, jb, job_sizes,
                                             weight_a, K, levels.B)
                outs_b = _contract_and_split(vals_b, jb, job_sizes,
                                             weight_b, K, levels.B)
                return outs_a, outs_b
            return (_split_jobs(out_a, jb, job_sizes, K, levels.B),
                    _split_jobs(out_b, jb, job_sizes, K, levels.B))
        if over:
            idx_cat, w_cat, job_sizes = _gather_indices(levels, jb, K)
            nchunks = -(-rows * C // _CHUNK_BUDGET_ELEMS[0])
            out_a, out_b = _chunked_gather_matmul(
                levels.flat, idx_cat, w_cat,
                [(0, Ca, weight_a, 1), (Ca, C, weight_b, 1)], K,
                int(nchunks))
            return (_split_jobs(out_a, jb, job_sizes, K, levels.B),
                    _split_jobs(out_b, jb, job_sizes, K, levels.B))
        # accumulate the two channel halves as SEPARATE outputs of the same
        # corner-accumulate fusion: avoids a post-hoc channel-split copy and
        # keeps each half contiguous so the pre-matmul reshape is a bitcast
        (vals_a, vals_b), job_sizes = _gather_weighted(
            levels, jb, K, split_at=Ca)
        outs_a = _contract_and_split(vals_a, jb, job_sizes, weight_a,
                                     K, levels.B)
        outs_b = _contract_and_split(vals_b, jb, job_sizes, weight_b,
                                     K, levels.B)
        return outs_a, outs_b

    jobs_off = [(j.offset, j.mask) for j in jobs]
    with _site_sampling(site):
        return jax.checkpoint(run)(list(feats_a), list(feats_b), jobs_off,
                                   weight_a, weight_b)


def multi_branch_modulated_dcn(branches, *, stride: int = 1,
                               padding: int = 1, dilation: int = 1,
                               site: Optional[str] = "tower"):
    """N independent DCNv2 branches (own features/offsets/masks/weights)
    fused into ONE gather.

    The gather is descriptor-rate bound on TPU, so fetching
    channel-concatenated rows for all branches at once costs the same time
    as one branch — each branch then contracts its own channel slice.

    branches: list of dicts with keys feats (list per level), offsets,
    masks, weight (kh,kw,C,Cout), bias (or None).
    Returns per-branch lists of per-level outputs.
    """
    n_br = len(branches)
    Cs = [br["feats"][0].shape[-1] for br in branches]
    starts = list(np.cumsum([0] + Cs[:-1]))
    K = branches[0]["weight"].shape[0] * branches[0]["weight"].shape[1]
    n_lvl = len(branches[0]["feats"])

    def run(feats_all, offsets_all, masks_all, weights, biases):
        jobs_of = lambda bi: [
            SampleJob(i, offsets_all[bi][i], masks_all[bi][i], (1.0, 1.0),
                      (stride, stride), (padding, padding),
                      (dilation, dilation)) for i in range(n_lvl)]
        if _use_quad(max(Cs)):
            # Quad rows are WIDE (4C) — the gather is bandwidth-bound, not
            # descriptor-bound, so the channel-concat trick below (every
            # sample fetches all branches' channels though each branch
            # samples its OWN positions) would waste n_br x bytes. Run
            # per-branch quad gathers instead; only the dual path (shared
            # positions -> genuinely shared descriptors) keeps concat.
            outs = []
            for bi in range(n_br):
                lv = pack_levels(feats_all[bi])
                jb = jobs_of(bi)
                o, sz = _run_quad(lv, jb, K, [(0, Cs[bi])], [weights[bi]],
                                  [1])
                olist = _split_jobs(o[0], jb, sz, K, lv.B)
                if biases[bi] is not None:
                    olist = [x + biases[bi].astype(x.dtype) for x in olist]
                outs.append(olist)
            return outs
        feats_cat = [jnp.concatenate([f[i] for f in feats_all], -1)
                     for i in range(n_lvl)]
        levels = pack_levels(feats_cat)
        if QUANT[0] != "off":
            fq, weights = _quant_fold(
                levels.flat,
                [(starts[bi], weights[bi], 1) for bi in range(n_br)],
                QUANT[0])
            levels = levels._replace(flat=fq)
        jobs = [j for bi in range(n_br) for j in jobs_of(bi)]
        B = levels.B
        vals, job_sizes = _gather_weighted(levels, jobs, K)
        outs = []
        row = 0
        for bi in range(n_br):
            jb = jobs[bi * n_lvl:(bi + 1) * n_lvl]
            sz = job_sizes[bi * n_lvl:(bi + 1) * n_lvl]
            n_rows = sum(B * p for p in sz)
            sl = vals[row:row + n_rows, starts[bi]:starts[bi] + Cs[bi]]
            o = _contract_and_split(sl, jb, sz, weights[bi], K, B)
            if biases[bi] is not None:
                o = [x + biases[bi].astype(x.dtype) for x in o]
            outs.append(o)
            row += n_rows
        return outs

    feats_all = [list(br["feats"]) for br in branches]
    offsets_all = [br["offsets"] for br in branches]
    masks_all = [br["masks"] for br in branches]
    weights = [br["weight"] for br in branches]
    biases = [br.get("bias") for br in branches]
    with _site_sampling(site):
        return jax.checkpoint(run)(feats_all, offsets_all, masks_all,
                                   weights, biases)


def multilevel_modulated_dcn(feats: Sequence[Array],
                             offsets: Sequence[Array],
                             masks: Sequence[Array], weight: Array,
                             bias: Optional[Array] = None, *,
                             stride: int = 1, padding: int = 1,
                             dilation: int = 1, groups: int = 1,
                             site: Optional[str] = "tower") -> List[Array]:
    """DCNv2 applied to every FPN level with shared weights — one gather,
    one matmul (used by the head towers and the backbone DCN stages)."""
    K = weight.shape[0] * weight.shape[1]
    levels = pack_levels(feats)
    jobs = [SampleJob(i, offsets[i], masks[i], (1.0, 1.0),
                      (stride, stride), (padding, padding),
                      (dilation, dilation))
            for i in range(len(feats))]
    outs = batched_deform_matmul(levels, jobs, weight, K, groups, site=site)
    if bias is not None:
        outs = [o + bias.astype(o.dtype) for o in outs]
    return outs


def multilevel_pyramid_dcn(feats: Sequence[Array],
                           jobs: Sequence[SampleJob], weight: Array,
                           site: Optional[str] = "refine") -> List[Array]:
    """PyramidDeformConv for a whole branch (all output levels x all source
    levels) — one gather, one matmul."""
    K = weight.shape[0] * weight.shape[1]
    levels = pack_levels(feats)
    return batched_deform_matmul(levels, jobs, weight, K, site=site)

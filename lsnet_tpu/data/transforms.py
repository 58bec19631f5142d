"""Deterministic geometric augmentation for images + landmark fields.

Host-side numpy twin of the reference pipeline transforms
(`/root/reference/code/mmdet/datasets/pipelines/transforms.py`): keep-ratio
Resize (:185-241), horizontal RandomFlip with landmark-aware index remaps
(extremes :354-388 — t/b mirror x and keep y, l<->r swap; keypoints
:390-403 — x mirror + left/right joint swap; polygons — mirror + reverse to
stay clockwise), Normalize, Pad-to-divisor.

Everything takes and returns a plain ``sample`` dict; the random decisions
are passed in (drawn by the loader) so transforms stay pure and testable.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

# COCO person keypoint left/right pairs (reference `transforms.py:322`)
KEYPOINT_FLIP_IDX = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12],
                     [13, 14], [15, 16]]


def rescale_size(h: int, w: int, scale: Tuple[int, int]) -> Tuple[int, int]:
    """Keep-ratio target size for (max_long, max_short) scale (mmcv
    ``rescale_size`` semantics)."""
    max_long, max_short = max(scale), min(scale)
    f = min(max_long / max(h, w), max_short / min(h, w))
    return int(h * f + 0.5), int(w * f + 0.5)


def _as_scale_list(img_scale) -> list:
    """Normalize an img_scale spec (one (l,s) tuple or a list of them) to a
    list of tuples."""
    if isinstance(img_scale, (list, tuple)) and len(img_scale) and \
            isinstance(img_scale[0], (list, tuple, np.ndarray)):
        return [tuple(int(v) for v in s) for s in img_scale]
    return [tuple(int(v) for v in img_scale)]


def sample_scale(img_scale, multiscale_mode: str = "range",
                 ratio_range: Optional[Tuple[float, float]] = None,
                 rng: Optional[np.random.RandomState] = None
                 ) -> Tuple[int, int]:
    """Draw one concrete scale for a training sample.

    Reference semantics (`/root/reference/code/mmdet/datasets/pipelines/
    transforms.py:79-176`):

    * ``ratio_range`` given (single base scale): uniform ratio in range,
      scale = (int(l*r), int(s*r))  — ``random_sample_ratio``.
    * two scales + ``multiscale_mode='range'``: long edge ~ U[min_l, max_l],
      short edge ~ U[min_s, max_s] independently — ``random_sample``.
    * list + ``multiscale_mode='value'``: pick one — ``random_select``.
    * single scale: returned as-is.
    """
    rng = rng if rng is not None else np.random
    scales = _as_scale_list(img_scale)
    if ratio_range is not None:
        if len(scales) != 1:
            raise ValueError("ratio_range requires a single base img_scale")
        lo, hi = ratio_range
        r = rng.random_sample() * (hi - lo) + lo
        return (int(scales[0][0] * r), int(scales[0][1] * r))
    if len(scales) == 1:
        return scales[0]
    if multiscale_mode == "range":
        if len(scales) != 2:
            raise ValueError("'range' mode needs exactly 2 img_scales")
        longs = [max(s) for s in scales]
        shorts = [min(s) for s in scales]
        long_edge = int(rng.randint(min(longs), max(longs) + 1))
        short_edge = int(rng.randint(min(shorts), max(shorts) + 1))
        return (long_edge, short_edge)
    if multiscale_mode == "value":
        return scales[int(rng.randint(len(scales)))]
    raise ValueError(f"unknown multiscale_mode {multiscale_mode!r}")


def scale_bounds(img_scale,
                 ratio_range: Optional[Tuple[float, float]] = None
                 ) -> Tuple[int, int]:
    """(max_long, max_short) over every scale the spec can produce."""
    scales = _as_scale_list(img_scale)
    max_long = max(max(s) for s in scales)
    max_short = max(min(s) for s in scales)
    if ratio_range is not None:
        max_long = int(max_long * ratio_range[1])
        max_short = int(max_short * ratio_range[1])
    return max_long, max_short


def canvas_for_scale(img_scale, *, portrait: bool = False, divisor: int = 32,
                     ratio_range: Optional[Tuple[float, float]] = None
                     ) -> Tuple[int, int]:
    """Static canvas (H, W) covering every keep-ratio resize under the spec.

    Landscape inputs (w >= h) resize to h <= max_short, w <= max_long;
    portrait is the transpose. Two canvases (one per orientation) replace the
    reference's aspect-ratio GroupSampler
    (`code/mmdet/datasets/samplers/group_sampler.py`)."""
    max_long, max_short = scale_bounds(img_scale, ratio_range)
    hw = (max_long, max_short) if portrait else (max_short, max_long)
    return pad_divisor_shape(*hw, divisor)


def resize_image(img: np.ndarray, new_hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize (pure numpy; cv2-free). img (H, W, C) uint8/float."""
    H, W = img.shape[:2]
    nh, nw = new_hw
    if (nh, nw) == (H, W):
        return img.astype(np.float32)
    # align with cv2.resize: pixel-center sampling
    ys = (np.arange(nh) + 0.5) * H / nh - 0.5
    xs = (np.arange(nw) + 0.5) * W / nw - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, W - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    im = img.astype(np.float32)
    out = (im[y0][:, x0] * (1 - wy) * (1 - wx) + im[y0][:, x1] * (1 - wy) * wx
           + im[y1][:, x0] * wy * (1 - wx) + im[y1][:, x1] * wy * wx)
    return out


def resize_sample(sample: Dict, scale: Tuple[int, int]) -> Dict:
    """Keep-ratio resize of image + all landmark fields."""
    img = sample["image"]
    H, W = img.shape[:2]
    nh, nw = rescale_size(H, W, scale)
    w_scale, h_scale = nw / W, nh / H
    out = dict(sample)
    out["image"] = resize_image(img, (nh, nw))
    out["img_shape"] = (nh, nw)
    sf = np.array([w_scale, h_scale, w_scale, h_scale], np.float32)
    out["scale_factor"] = sf
    if "gt_bboxes" in sample and len(sample["gt_bboxes"]):
        bb = sample["gt_bboxes"] * sf
        bb[:, 0::2] = np.clip(bb[:, 0::2], 0, nw)
        bb[:, 1::2] = np.clip(bb[:, 1::2], 0, nh)
        out["gt_bboxes"] = bb
    if "gt_extremes" in sample and len(sample["gt_extremes"]):
        ex = sample["gt_extremes"] * np.tile(sf[:2], 5)
        ex[:, 0::2] = np.clip(ex[:, 0::2], 0, nw)
        ex[:, 1::2] = np.clip(ex[:, 1::2], 0, nh)
        out["gt_extremes"] = ex
    if "gt_keypoints_vs" in sample and len(sample["gt_keypoints_vs"]):
        kp = sample["gt_keypoints_vs"].copy()
        kp[:, 0::3] = np.clip(kp[:, 0::3] * sf[0], 0, nw)
        kp[:, 1::3] = np.clip(kp[:, 1::3] * sf[1], 0, nh)
        out["gt_keypoints_vs"] = kp
    if "gt_polygons" in sample and len(sample["gt_polygons"]):
        pg = sample["gt_polygons"].copy()
        pg[:, 0::2] = pg[:, 0::2] * sf[0]
        pg[:, 1::2] = pg[:, 1::2] * sf[1]
        out["gt_polygons"] = pg
    return out


def hflip_sample(sample: Dict) -> Dict:
    """Horizontal flip of image + all landmark fields."""
    img = sample["image"]
    w = sample["img_shape"][1] if "img_shape" in sample else img.shape[1]
    out = dict(sample)
    out["image"] = img[:, ::-1].copy()
    out["flip"] = True
    if "gt_bboxes" in sample and len(sample["gt_bboxes"]):
        bb = sample["gt_bboxes"].copy()
        bb[:, 0::4] = w - sample["gt_bboxes"][:, 2::4]
        bb[:, 2::4] = w - sample["gt_bboxes"][:, 0::4]
        out["gt_bboxes"] = bb
    if "gt_extremes" in sample and len(sample["gt_extremes"]):
        e = sample["gt_extremes"]
        f = e.copy()
        # layout: [tx,ty, lx,ly, bx,by, rx,ry, cx,cy] (ref :354-388)
        f[:, 0] = w - e[:, 0]          # top mirrors x
        f[:, 2] = w - e[:, 6]          # left <- right
        f[:, 3] = e[:, 7]
        f[:, 4] = w - e[:, 4]          # bottom mirrors x
        f[:, 6] = w - e[:, 2]          # right <- left
        f[:, 7] = e[:, 3]
        f[:, 8] = w - e[:, 8]          # center mirrors x
        out["gt_extremes"] = f
    if "gt_keypoints_vs" in sample and len(sample["gt_keypoints_vs"]):
        kp = sample["gt_keypoints_vs"].copy()
        kp[:, 0::3] = w - kp[:, 0::3]
        kp3 = kp.reshape(kp.shape[0], -1, 3)
        for a, b in KEYPOINT_FLIP_IDX:
            kp3[:, [a, b]] = kp3[:, [b, a]]
        out["gt_keypoints_vs"] = kp3.reshape(kp.shape[0], -1)
    if "gt_polygons" in sample and len(sample["gt_polygons"]):
        pg = sample["gt_polygons"].copy()
        pg[:, 0::2] = w - pg[:, 0::2]
        # mirroring reverses orientation; reverse point order to stay
        # clockwise (ref PolygonMasks.flip keep_poly_clockwise)
        p2 = pg.reshape(pg.shape[0], -1, 2)[:, ::-1, :]
        out["gt_polygons"] = p2.reshape(pg.shape[0], -1)
    return out


def normalize_image(img: np.ndarray,
                    mean=(123.675, 116.28, 103.53),
                    std=(58.395, 57.12, 57.375)) -> np.ndarray:
    """Reference img_norm_cfg (RGB order)."""
    return ((img - np.asarray(mean, np.float32))
            / np.asarray(std, np.float32)).astype(np.float32)


def pad_to_shape(img: np.ndarray, canvas_hw: Tuple[int, int]) -> np.ndarray:
    H, W = img.shape[:2]
    ch, cw = canvas_hw
    out = np.zeros((ch, cw) + img.shape[2:], img.dtype)
    out[:H, :W] = img
    return out


def pad_divisor_shape(h: int, w: int, divisor: int = 32) -> Tuple[int, int]:
    return (-(-h // divisor) * divisor, -(-w // divisor) * divisor)

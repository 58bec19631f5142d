"""High-level python API — the reference ``mmdet.apis`` surface.

Equivalents of `/root/reference/code/mmdet/apis/`:
* :func:`init_detector`    (`inference.py:15`) — config + checkpoint -> ready
  model bundle with a jitted forward;
* :func:`inference_detector` (`inference.py:76`) — one image in, packed
  detections out (resize/normalize/pad + forward + decode + rescale);
* :func:`show_result`      — task-aware visualization;
* :func:`train_detector` / :func:`single_host_test` re-exported from
  :mod:`lsnet_tpu.train.loop`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .core.decode import Detections, lsnet_decode
from .core.cpv import lscpv_decode
from .data.transforms import (canvas_for_scale, normalize_image,
                              pad_divisor_shape, pad_to_shape, rescale_size,
                              resize_image)
from .models import build_detector
from .train.loop import evaluate_detector, test_cfg_from, train_detector  # noqa: F401
from .utils.config import Config


@dataclass
class DetectorBundle:
    model: Any
    variables: Dict
    cfg: Config
    canvas: Tuple[int, int]
    fwd: Any
    decode: Any
    _fwd_cache: Dict = None  # per-canvas jitted forward+decode

    def fwd_for(self, canvas_hw: Tuple[int, int]):
        """Jitted forward+decode for one static canvas (compiled once per
        shape, cached).  Enables the reference's MS-test/TTA at arbitrary
        scales — each TTA scale routes to its own shape bucket
        (VERDICT r1 item 3; reference exemplar up to (3000,1800),
        `code/configs/lsnet/lsnet_segm_x101_fpn_dconv_c3-c5_mstrain_30e_coco.py:24-48`)."""
        canvas_hw = tuple(int(v) for v in canvas_hw)
        if self._fwd_cache is None:
            self._fwd_cache = {}
        if canvas_hw not in self._fwd_cache:
            tcfg = test_cfg_from(self.cfg, canvas_hw)
            model, decode_fn = self.model, self.decode

            @jax.jit
            def fwd(variables, images, img_shapes, scale_factors):
                from .ops.flat_deform import inference_sampling
                with inference_sampling():
                    outs = model.apply(variables, images)
                return decode_fn(outs, img_shapes, scale_factors, tcfg)

            self._fwd_cache[canvas_hw] = fwd
        return self._fwd_cache[canvas_hw]


def bucket_canvas(scale: Tuple[int, int], h: int, w: int,
                  divisor: int = 32) -> Tuple[int, int]:
    """Static canvas bucket for one (long, short) test scale and an input
    orientation: (short, long) for landscape inputs, transposed for
    portrait — two compiled shapes per TTA scale at most."""
    return canvas_for_scale(tuple(scale), portrait=h > w, divisor=divisor)


def init_detector(config: Union[str, Config],
                  checkpoint: Optional[str] = None,
                  canvas: Optional[Tuple[int, int]] = None,
                  fuse_conv_bn: bool = False) -> DetectorBundle:
    from . import enable_compile_cache
    enable_compile_cache()
    cfg = Config.fromfile(config) if isinstance(config, str) else config
    # inference-only DCN sampling override (cfg wins over the
    # LSNET_DCN_SAMPLING env default) — see ops/flat_deform.SAMPLING
    mode = cfg.get("test_cfg", {}).get("dcn_sampling")
    if mode:
        from .ops import flat_deform
        flat_deform.set_sampling(str(mode))  # global or per-site spec
    # inference-only gather-source quantization override (cfg wins over
    # the LSNET_GATHER_QUANT env default) — see ops/flat_deform.QUANT
    qmode = cfg.get("test_cfg", {}).get("dcn_gather_quant")
    if qmode:
        from .ops import flat_deform
        flat_deform.set_quant(str(qmode))  # "int8"/"fp8" or per-site spec
    canvas = tuple(canvas or cfg.get("canvas_shape", (800, 1344)))
    model, _ = build_detector(cfg.model.to_dict())
    if checkpoint:
        # params-only restore onto an abstract-init shell (no eager init,
        # no optimizer target — eval never needs opt_state and the train-
        # time multi_transform structure can't be rebuilt from here)
        from .train.checkpoint import (init_variables_shell,
                                       restore_eval_state)
        state = restore_eval_state(checkpoint,
                                   init_variables_shell(model, canvas))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
    else:
        dummy = jnp.zeros((1, *canvas, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), dummy)
    if fuse_conv_bn:
        # fold FrozenBN into conv kernels (reference benchmark.py
        # --fuse-conv-bn); pytree structure is preserved, see train/fuse.py
        from .train.fuse import fuse_conv_bn as _fuse
        variables, _ = _fuse(variables)
    if cfg.model.type in ("FasterRCNN", "TwoStageDetector", "MaskRCNN",
                          "CascadeRCNN", "MaskScoringRCNN", "GridRCNN",
                          "HybridTaskCascade", "HTC", "PointRend"):
        from .core.two_stage import (cascade_rcnn_decode, grid_rcnn_decode,
                                     htc_decode, mask_rcnn_decode,
                                     mask_scoring_rcnn_decode,
                                     point_rend_decode, two_stage_decode)
        from .train.loop import two_stage_cfg_from
        ts_decode = {"MaskRCNN": mask_rcnn_decode,
                     "CascadeRCNN": cascade_rcnn_decode,
                     "MaskScoringRCNN": mask_scoring_rcnn_decode,
                     "GridRCNN": grid_rcnn_decode,
                     "HybridTaskCascade": htc_decode,
                     "HTC": htc_decode,
                     "PointRend": point_rend_decode}.get(
                         cfg.model.type, two_stage_decode)

        bundle = DetectorBundle(model, variables, cfg, canvas, None, None)

        def fwd_for(canvas_hw):
            canvas_hw = tuple(int(v) for v in canvas_hw)
            if bundle._fwd_cache is None:
                bundle._fwd_cache = {}
            if canvas_hw not in bundle._fwd_cache:
                tscfg = two_stage_cfg_from(cfg, canvas_hw)
                tcfg = test_cfg_from(cfg, canvas_hw)
                def _ts_fwd(v, im, sh, sf, tscfg=tscfg, tcfg=tcfg):
                    from .ops.flat_deform import inference_sampling
                    with inference_sampling():
                        return ts_decode(model, v, im, sh, sf, tscfg, tcfg)

                bundle._fwd_cache[canvas_hw] = jax.jit(_ts_fwd)
            return bundle._fwd_cache[canvas_hw]

        bundle.fwd_for = fwd_for
        bundle.fwd = fwd_for(canvas)
        return bundle
    head_type = cfg.model.bbox_head.type
    from .train.loop import (DENSE_HEAD_KINDS, dense_cfg_from,
                             reppoints_cfg_from)
    if head_type in DENSE_HEAD_KINDS:
        from .core.dense_decode import dense_decode

        def decode_fn(outs, shapes, sfs, tcfg):
            dcfg = dense_cfg_from(cfg, tcfg.image_shape)
            return dense_decode(outs, shapes, sfs, tcfg, dcfg)
    elif head_type == "RepPointsHead":
        from .core.reppoints import reppoints_decode

        def decode_fn(outs, shapes, sfs, tcfg):
            rcfg = reppoints_cfg_from(cfg, tcfg.image_shape)
            return reppoints_decode(outs, shapes, sfs, tcfg, rcfg)
    elif head_type == "RepPointsV2Head":
        from .core.reppoints import reppoints_v2_decode

        def decode_fn(outs, shapes, sfs, tcfg):
            rcfg = reppoints_cfg_from(cfg, tcfg.image_shape)
            return reppoints_v2_decode(outs, shapes, sfs, tcfg, rcfg)
    elif cfg.model.type == "LSCPVDetector":
        decode_fn = lscpv_decode
    else:
        decode_fn = lsnet_decode
    bundle = DetectorBundle(model, variables, cfg, canvas, None, decode_fn)
    bundle.fwd = bundle.fwd_for(canvas)
    return bundle


def inference_detector(bundle: DetectorBundle,
                       img: Union[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Run one image through the test pipeline + model + decode."""
    if isinstance(img, str):
        from PIL import Image
        with Image.open(img) as im:
            img = np.asarray(im.convert("RGB"))
    H, W = img.shape[:2]
    scale = tuple(bundle.cfg.data.test.get("img_scale", (1333, 800))
                  ) if "data" in bundle.cfg else (1333, 800)
    nh, nw = rescale_size(H, W, scale)
    resized = resize_image(img, (nh, nw))
    sf = np.array([nw / W, nh / H, nw / W, nh / H], np.float32)
    norm = normalize_image(resized)
    canvas = bucket_canvas(scale, H, W)
    canvas_img = pad_to_shape(norm, canvas)
    det = bundle.fwd_for(canvas)(bundle.variables,
                                 jnp.asarray(canvas_img[None]),
                                 jnp.asarray([[nh, nw]], jnp.int32),
                                 jnp.asarray(sf[None]))
    masks = None
    if not isinstance(det, Detections) and isinstance(det, tuple):
        det, masks = det                 # Mask R-CNN: (Detections, masks)
    det = jax.tree.map(np.asarray, det)
    valid = det.valid[0]
    out = {
        "bboxes": det.bboxes[0][valid],
        "scores": det.scores[0][valid],
        "labels": det.labels[0][valid],
        "landmarks": det.landmarks[0][valid],
    }
    if masks is not None:
        out["masks"] = np.asarray(masks)[0][valid]
    return out


def aug_test_simple(bundle: DetectorBundle, img: Union[str, np.ndarray],
                    scales: Optional[list] = None, flip: bool = True
                    ) -> Dict[str, np.ndarray]:
    """Simple TTA (reference ``aug_test_simple``, `detectors/lsnet.py:
    102-135`, bbox task): per-aug candidates WITHOUT NMS, mapped back,
    concatenated, then ONE class-wise NMS."""
    from .core.decode import lsnet_decode_candidates, nms_candidates
    from .evalkit.tta import bbox_flip, extreme_flip

    if isinstance(img, str):
        from PIL import Image
        with Image.open(img) as im:
            img = np.asarray(im.convert("RGB"))
    scales = scales or [(1333, 800)]
    model = bundle.model
    fwd_cache: Dict[Tuple[int, int], Any] = {}

    def fwd_cand_for(canvas):
        if canvas not in fwd_cache:
            cfg = test_cfg_from(bundle.cfg, canvas)

            @jax.jit
            def fwd_cand(variables, images, shapes, sfs):
                from .ops.flat_deform import inference_sampling
                with inference_sampling():
                    outs = model.apply(variables, images)
                return lsnet_decode_candidates(outs, shapes, sfs, cfg,
                                               rescale=False)

            fwd_cache[canvas] = fwd_cand
        return fwd_cache[canvas]

    H, W = img.shape[:2]
    cfg = test_cfg_from(bundle.cfg, bundle.canvas)  # NMS params only
    all_b, all_l, all_s = [], [], []
    for scale in scales:
        nh, nw = rescale_size(H, W, tuple(scale))
        resized = resize_image(img, (nh, nw))
        sf = np.array([nw / W, nh / H, nw / W, nh / H], np.float32)
        for do_flip in ([False, True] if flip else [False]):
            im_aug = resized[:, ::-1].copy() if do_flip else resized
            norm = normalize_image(im_aug)
            canvas = bucket_canvas(scale, H, W)
            canvas_img = pad_to_shape(norm, canvas)
            b, l, s = fwd_cand_for(canvas)(
                bundle.variables, jnp.asarray(canvas_img[None]),
                jnp.asarray([[nh, nw]], jnp.int32),
                jnp.asarray(np.ones((1, 4), np.float32)))
            b = np.asarray(b[0], np.float64)
            l = np.asarray(l[0], np.float64)
            s = np.asarray(s[0])
            if do_flip:
                b = bbox_flip(b, (nh, nw))
                l = extreme_flip(l, (nh, nw))
            b /= sf
            l /= np.tile(sf[:2], l.shape[1] // 2)
            all_b.append(b)
            all_l.append(l)
            all_s.append(s)
    bboxes = jnp.asarray(np.concatenate(all_b), jnp.float32)
    lms = jnp.asarray(np.concatenate(all_l), jnp.float32)
    scores = jnp.asarray(np.concatenate(all_s), jnp.float32)
    det = jax.jit(lambda b, l, s: nms_candidates(b, l, s, cfg))(bboxes, lms,
                                                                scores)
    det = jax.tree.map(np.asarray, det)
    v = det.valid
    return {"bboxes": det.bboxes[v], "scores": det.scores[v],
            "labels": det.labels[v], "landmarks": det.landmarks[v]}


def aug_test(bundle: DetectorBundle, img: Union[str, np.ndarray],
             scales: Optional[list] = None, flip: bool = True,
             scale_ranges: Optional[list] = None) -> Dict[str, np.ndarray]:
    """Multi-scale + flip TTA with soft voting (reference
    ``aug_test_vote``, `detectors/lsnet.py:301-396`).

    Each (scale, flip) augmentation runs the jitted forward+decode; the
    per-aug detections merge host-side via IoU-weighted voting.
    """
    from .evalkit.tta import aug_test_vote

    if isinstance(img, str):
        from PIL import Image
        with Image.open(img) as im:
            img = np.asarray(im.convert("RGB"))
    scales = scales or [(1333, 800)]
    # reference default vote scale ranges (one per scale)
    if scale_ranges is None:
        scale_ranges = [(0, 10000)] * len(scales)
    task = bundle.cfg.model.bbox_head.get("task", "bbox")
    H, W = img.shape[:2]
    aug_results, metas = [], []
    for scale in scales:
        nh, nw = rescale_size(H, W, tuple(scale))
        resized = resize_image(img, (nh, nw))
        sf = np.array([nw / W, nh / H, nw / W, nh / H], np.float32)
        for do_flip in ([False, True] if flip else [False]):
            im_aug = resized[:, ::-1].copy() if do_flip else resized
            norm = normalize_image(im_aug)
            canvas = bucket_canvas(tuple(scale), H, W)
            canvas_img = pad_to_shape(norm, canvas)
            det = bundle.fwd_for(canvas)(
                bundle.variables, jnp.asarray(canvas_img[None]),
                jnp.asarray([[nh, nw]], jnp.int32),
                jnp.asarray(np.ones((1, 4), np.float32)))
            det = jax.tree.map(np.asarray, det)
            v = det.valid[0]
            aug_results.append(dict(bboxes=det.bboxes[0][v],
                                    scores=det.scores[0][v],
                                    labels=det.labels[0][v],
                                    vectors=det.landmarks[0][v]))
            metas.append(dict(img_shape=(nh, nw), scale_factor=sf,
                              flip=do_flip))
    merged = aug_test_vote(aug_results, metas, scale_ranges, task=task,
                           num_classes=bundle.cfg.model.bbox_head.num_classes)
    return merged


def show_result(img: np.ndarray, result: Dict[str, np.ndarray], task: str,
                score_thr: float = 0.3,
                out_file: Optional[str] = None) -> np.ndarray:
    from .utils.visualize import (imshow_extremes, imshow_polygons,
                                  imshow_pose)
    if task == "bbox":
        return imshow_extremes(img, result["bboxes"], result["landmarks"],
                               result["labels"], result["scores"],
                               score_thr, out_file=out_file)
    if task == "segm":
        return imshow_polygons(img, result["bboxes"], result["landmarks"],
                               result["labels"], result["scores"],
                               score_thr, out_file=out_file)
    return imshow_pose(img, result["bboxes"], result["landmarks"],
                       result["scores"], score_thr, out_file=out_file)


async def async_inference_detector(bundle: DetectorBundle,
                                   img) -> Dict[str, np.ndarray]:
    """Asynchronous single-image inference (reference
    `mmdet/apis/inference.py:101-118` + `utils/contextmanagers.py`).

    JAX dispatch is already asynchronous; this coroutine preprocesses,
    dispatches, then awaits device completion OFF the event loop so many
    inferences can pipeline (`tests/test_async.py` pattern).
    """
    from .utils.contextmanagers import await_ready

    if isinstance(img, str):
        from PIL import Image
        with Image.open(img) as im:
            img = np.asarray(im.convert("RGB"))
    H, W = img.shape[:2]
    scale = tuple(bundle.cfg.data.test.get("img_scale", (1333, 800))
                  ) if "data" in bundle.cfg else (1333, 800)
    nh, nw = rescale_size(H, W, scale)
    resized = resize_image(img, (nh, nw))
    sf = np.array([nw / W, nh / H, nw / W, nh / H], np.float32)
    norm = normalize_image(resized)
    canvas = bucket_canvas(scale, H, W)
    canvas_img = pad_to_shape(norm, canvas)
    det = bundle.fwd_for(canvas)(bundle.variables,
                                 jnp.asarray(canvas_img[None]),
                                 jnp.asarray([[nh, nw]], jnp.int32),
                                 jnp.asarray(sf[None]))
    masks = None
    if not isinstance(det, Detections) and isinstance(det, tuple):
        det, masks = det
    det = await await_ready(det)
    det = jax.tree.map(np.asarray, det)
    valid = det.valid[0]
    out = {
        "bboxes": det.bboxes[0][valid],
        "scores": det.scores[0][valid],
        "labels": det.labels[0][valid],
        "landmarks": det.landmarks[0][valid],
    }
    if masks is not None:
        out["masks"] = np.asarray(masks)[0][valid]
    return out

"""Model registry + builders.

Mirrors the reference registry-driven assembly
(`/root/reference/code/mmdet/models/builder.py`): config dicts with a
``type`` key construct flax modules.  Registries: BACKBONES, NECKS, HEADS,
DETECTORS.
"""

from __future__ import annotations

from typing import Any, Dict

from ..utils.registry import Registry

BACKBONES = Registry("backbone")
NECKS = Registry("neck")
HEADS = Registry("head")
DETECTORS = Registry("detector")

from .backbones.resnet import ResNet  # noqa: E402
from .necks.fpn import FPN  # noqa: E402
from .heads.ls_head import LSHead  # noqa: E402
from .heads.lscpv_head import LSCPVHead  # noqa: E402
from .heads.dense import (ATSSHead, FCOSHead, FoveaHead, FSAFHead,  # noqa: E402
                          GFLHead, RetinaHead, RetinaSepBNHead, SSDHead)
from .heads.reppoints import RepPointsHead, RepPointsV2Head  # noqa: E402
from .detectors.lsnet import LSDetector  # noqa: E402

# string-typed assembly (the builders below add the config-key translation
# each flax module needs; custom components register here and are picked up
# by the same builders)
BACKBONES.register_module(module=ResNet)
NECKS.register_module(module=FPN)
HEADS.register_module(module=LSHead)
HEADS.register_module(module=LSCPVHead)
HEADS.register_module(module=RetinaHead)
HEADS.register_module(module=FCOSHead)
HEADS.register_module(module=ATSSHead)
HEADS.register_module(module=GFLHead)
HEADS.register_module(module=RepPointsHead)
HEADS.register_module(module=RepPointsV2Head)
HEADS.register_module(module=SSDHead)
HEADS.register_module(module=FoveaHead)
HEADS.register_module(module=FSAFHead)
HEADS.register_module(module=RetinaSepBNHead)
DETECTORS.register_module(module=LSDetector)


def _registry_build(registry: Registry, kind: str, cfg: Dict[str, Any]):
    cls = registry.get(kind)
    if cls is None:
        raise KeyError(f"unknown {registry.name} {kind}")
    return cls(**cfg)


def build_backbone(cfg: Dict[str, Any]):
    cfg = dict(cfg)
    kind = cfg.pop("type")
    cfg.pop("pretrained", None)
    cfg.pop("norm_cfg", None)        # BN is always FrozenBatchNorm on TPU
    cfg.pop("norm_eval", None)       # implied by FrozenBatchNorm
    cfg.pop("style", None)           # only 'pytorch' style is implemented
    cfg.pop("zero_init_residual", None)
    dcn = cfg.pop("dcn", None)
    if dcn is not None and "stage_with_dcn" not in cfg:
        cfg["stage_with_dcn"] = (False, True, True, True)
    sac = cfg.pop("sac", None)
    if sac is not None and "stage_with_sac" not in cfg:
        cfg["stage_with_sac"] = (False, True, True, True)
    if cfg.pop("with_cp", False):      # torch checkpointing -> jax remat
        cfg["remat"] = True
    if kind == "ResNet":
        return ResNet(block_type="resnet", **cfg)
    if kind in ("DetectoRS_ResNet", "DetectoRSResNet"):
        # DetectoRS backbone = ResNet + SAC stages (RFP recursion lives in
        # the RFP neck, see necks/extra.py)
        cfg.pop("conv_cfg", None)
        cfg.pop("output_img", None)
        cfg.pop("rfp_inplanes", None)
        return ResNet(block_type="resnet", **cfg)
    if kind == "SSDVGG":
        from .backbones.extra import SSDVGG
        for k in ("num_stages", "stage_with_dcn", "stage_with_sac",
                  "strides", "dilations", "remat", "out_indices",
                  "frozen_stages", "with_last_pool", "ceil_mode",
                  "out_feature_indices", "l2_norm_scale"):
            cfg.pop(k, None)
        return SSDVGG(**cfg)
    if kind == "ResNeXt":
        return ResNet(block_type="resnext", **cfg)
    if kind in ("DetectoRS_ResNeXt", "DetectoRSResNeXt"):
        # groups variant of the DetectoRS backbone
        # (reference backbones/detectors_resnext.py)
        cfg.pop("conv_cfg", None)
        cfg.pop("output_img", None)
        cfg.pop("rfp_inplanes", None)
        return ResNet(block_type="resnext", **cfg)
    if kind == "Res2Net":
        cfg.setdefault("base_width", 26)
        cfg.setdefault("deep_stem", True)   # res2net101_v1d pretrain layout
        return ResNet(block_type="res2net", **cfg)
    if kind == "RegNet":
        from .backbones.extra import RegNet
        for k in ("num_stages", "stage_with_dcn", "strides", "dilations",
                  "remat"):
            cfg.pop(k, None)
        return RegNet(**cfg)
    if kind == "HourglassNet":
        from .backbones.extra import HourglassNet
        for k in ("num_stages", "stage_with_dcn", "strides", "dilations",
                  "out_indices", "remat"):
            cfg.pop(k, None)
        return HourglassNet(**cfg)
    if kind == "HRNet":
        from .backbones.hrnet import HRNet
        for k in ("num_stages", "stage_with_dcn", "strides", "dilations",
                  "out_indices", "remat", "groups", "base_width", "scales"):
            cfg.pop(k, None)
        return HRNet(**cfg)
    if kind == "MobileNetV2":
        from .backbones.mobilenet import MobileNetV2
        cfg.pop("num_stages", None)
        cfg.pop("stage_with_dcn", None)
        cfg.pop("strides", None)
        cfg.pop("dilations", None)
        cfg.pop("remat", None)
        return MobileNetV2(**cfg)
    return _registry_build(BACKBONES, kind, cfg)


def build_neck(cfg):
    if cfg is None:
        from flax import linen as _nn

        class IdentityNeck(_nn.Module):
            @_nn.compact
            def __call__(self, feats):
                return list(feats)

        return IdentityNeck()
    cfg = dict(cfg)
    kind = cfg.pop("type")
    cfg.pop("in_channels", None)     # inferred from inputs in flax
    if kind == "FPN":
        return FPN(**cfg)
    if kind == "PAFPN":
        from .necks.extra import PAFPN
        return PAFPN(**cfg)
    if kind == "BFP":
        from .necks.extra import BFP
        return BFP(**cfg)
    if kind == "NASFPN":
        from .necks.extra import NASFPN
        cfg.pop("add_extra_convs", None)
        return NASFPN(**cfg)
    if kind in ("NASFCOS_FPN", "NASFCOSFPN"):
        from .necks.extra import NASFCOSFPN
        cfg.pop("add_extra_convs", None)
        cfg.pop("conv_cfg", None)
        return NASFCOSFPN(**cfg)
    if kind == "HRFPN":
        from .necks.extra import HRFPN
        return HRFPN(**cfg)
    if kind in ("FPN_CARAFE", "FPNCarafe"):
        from .necks.extra import FPNCarafe
        cfg.pop("upsample_cfg", None)
        cfg.pop("order", None)
        return FPNCarafe(**cfg)
    if kind == "RFP":
        from .necks.extra import RFP
        cfg.pop("rfp_backbone", None)
        cfg.pop("aspp_out_channels", None)
        cfg.pop("aspp_dilations", None)
        cfg.pop("add_extra_convs", None)
        return RFP(**cfg)
    return _registry_build(NECKS, kind, cfg)


def build_head(cfg: Dict[str, Any]):
    cfg = dict(cfg)
    kind = cfg.pop("type")
    # loss configs are consumed by core.loss, not the module
    loss_cfgs = {k: cfg.pop(k) for k in list(cfg)
                 if k.startswith("loss_")}
    norm_cfg = cfg.pop("norm_cfg", None)
    if norm_cfg is not None:
        cfg["norm_groups"] = norm_cfg.get("num_groups", 32)
    if kind == "LSHead":
        return LSHead(**cfg), loss_cfgs
    if kind == "LSCPVHead":
        cfg.pop("use_grid_points", None)
        cfg.pop("center_init", None)
        if "num_points" in cfg:
            cfg["num_kernel_points"] = cfg.pop("num_points")
        return LSCPVHead(**cfg), loss_cfgs
    if kind in ("DenseRepPointsHead", "DenseRepPointsV2Head"):
        from .heads.dense_reppoints import (DenseRepPointsHead,
                                            DenseRepPointsV2Head)
        for k in ("train_cfg", "test_cfg", "transform_method",
                  "sample_padding_mode", "use_grid_points", "center_init",
                  "point_strides", "point_base_scale"):
            cfg.pop(k, None)
        cls_h = (DenseRepPointsHead if kind == "DenseRepPointsHead"
                 else DenseRepPointsV2Head)
        return cls_h(**cfg), loss_cfgs
    if kind in ("RepPointsHead", "RepPointsV2Head"):
        for k in ("use_grid_points", "center_init", "train_cfg",
                  "test_cfg"):
            cfg.pop(k, None)
        if "point_strides" in cfg:
            cfg["point_strides"] = tuple(cfg["point_strides"])
        cls_h = RepPointsHead if kind == "RepPointsHead" else RepPointsV2Head
        return cls_h(**cfg), loss_cfgs
    if kind == "FreeAnchorRetinaHead":
        # RetinaHead module with GN towers; the FreeAnchor bag loss lives
        # in core.dense_loss.free_anchor_loss
        for k in ("anchor_generator", "bbox_coder", "train_cfg", "test_cfg",
                  "pre_anchor_topk", "bbox_thr", "gamma", "alpha"):
            cfg.pop(k, None)
        return RetinaHead(**cfg), loss_cfgs
    if kind == "GARetinaHead":
        for k in ("approx_anchor_generator", "square_anchor_generator",
                  "anchor_coder", "bbox_coder", "loc_filter_thr",
                  "train_cfg", "test_cfg", "deform_groups"):
            cfg.pop(k, None)
        from .heads.dense import GARetinaHead
        return GARetinaHead(**cfg), loss_cfgs
    if kind == "PISARetinaHead":
        # same module as RetinaHead; the PISA reweighting is loss-side
        for k in ("anchor_generator", "bbox_coder", "train_cfg",
                  "test_cfg"):
            cfg.pop(k, None)
        return RetinaHead(**cfg), loss_cfgs
    if kind == "PISASSDHead":
        # same module as SSDHead; ISR-P/CARL live in the loss
        # (core.dense_loss.pisa_ssd_loss)
        anchor_gen = cfg.pop("anchor_generator", None)
        for k in ("bbox_coder", "train_cfg", "test_cfg",
                  "background_label", "reg_decoded_bbox"):
            cfg.pop(k, None)
        cfg["in_channels"] = tuple(cfg.get(
            "in_channels", (512, 1024, 512, 256, 256, 256)))
        if anchor_gen is not None:
            cfg["num_base_anchors"] = tuple(
                2 + 2 * len(r) for r in anchor_gen.get(
                    "ratios", [[2], [2, 3], [2, 3], [2, 3], [2], [2]]))
        return SSDHead(**cfg), loss_cfgs
    if kind == "GARPNHead":
        for k in ("approx_anchor_generator", "square_anchor_generator",
                  "anchor_coder", "bbox_coder", "loc_filter_thr",
                  "train_cfg", "test_cfg", "deform_groups", "num_classes"):
            cfg.pop(k, None)
        from .heads.dense import GARPNHead
        return GARPNHead(**cfg), loss_cfgs
    if kind in ("RetinaHead", "RetinaSepBNHead", "FCOSHead", "ATSSHead",
                "GFLHead", "SSDHead", "FoveaHead", "FSAFHead"):
        # assigner/coder/anchor settings live in the loss config, not the
        # flax module (mmdet folds them into the head; we keep the split)
        anchor_gen = None
        for k in ("anchor_generator", "bbox_coder", "train_cfg", "test_cfg",
                  "strides", "regress_ranges", "norm_groups",
                  "centerness_on_reg", "center_sampling", "norm_on_bbox",
                  "centerness_branch", "base_edge_list", "scale_ranges",
                  "sigma", "background_label", "reg_decoded_bbox"):
            v = cfg.pop(k, None)
            if k == "anchor_generator":
                anchor_gen = v
            if k == "anchor_generator" and v is not None and \
                    kind == "RetinaHead":
                cfg["num_base_anchors"] = (len(v.get("ratios", [0.5, 1, 2]))
                                           * v.get("scales_per_octave", 3))
            if k in ("strides", "centerness_on_reg") and v is not None and \
                    kind == "FCOSHead":
                cfg[k] = tuple(v) if k == "strides" else v
        if kind == "RetinaSepBNHead":
            cfg.pop("num_ins", None)
            if anchor_gen is not None:
                cfg["num_base_anchors"] = (
                    len(anchor_gen.get("ratios", [0.5, 1, 2]))
                    * anchor_gen.get("scales_per_octave", 3))
        if kind == "SSDHead":
            cfg["in_channels"] = tuple(cfg.get(
                "in_channels", (512, 1024, 512, 256, 256, 256)))
            if anchor_gen is not None:
                # A_l = ratio-1 at both scales + the extra ratio pairs
                cfg["num_base_anchors"] = tuple(
                    2 + 2 * len(r) for r in anchor_gen.get(
                        "ratios", [[2], [2, 3], [2, 3], [2, 3], [2], [2]]))
        head_cls = {"RetinaHead": RetinaHead, "FCOSHead": FCOSHead,
                    "ATSSHead": ATSSHead, "GFLHead": GFLHead,
                    "SSDHead": SSDHead, "FoveaHead": FoveaHead,
                    "FSAFHead": FSAFHead,
                    "RetinaSepBNHead": RetinaSepBNHead}[kind]
        return head_cls(**cfg), loss_cfgs
    return _registry_build(HEADS, kind, cfg), loss_cfgs


def build_detector(cfg: Dict[str, Any]):
    """Build the detector module from a full ``model`` config dict.

    Returns (module, head_loss_cfgs)."""
    cfg = dict(cfg)
    kind = cfg.pop("type")
    cfg.pop("pretrained", None)
    backbone = build_backbone(cfg.pop("backbone"))
    neck_cfg = cfg.pop("neck")
    neck_channels = (neck_cfg or {}).get("out_channels", 256)
    neck = build_neck(neck_cfg)
    if kind in ("FasterRCNN", "TwoStageDetector", "MaskRCNN",
                "CascadeRCNN", "FastRCNN", "MaskScoringRCNN", "GridRCNN",
                "HybridTaskCascade", "HTC", "PointRend"):
        from .heads.two_stage import (CascadeRCNNDetector, FastRCNNDetector,
                                      FCNMaskHead, FusedSemanticHead,
                                      GridHead, GridRCNNDetector,
                                      HTCDetector, HTCMaskHead, MaskIoUHead,
                                      MaskPointHead, MaskRCNNDetector,
                                      MaskScoringRCNNDetector,
                                      PointRendDetector, RPNHead,
                                      Shared2FCBBoxHead, TwoStageDetector)
        rpn_cfg = dict(cfg.pop("rpn_head", {}))
        rpn_cfg.pop("type", None)
        anchor_gen = rpn_cfg.pop("anchor_generator", {})
        for k in list(rpn_cfg):
            if k.startswith("loss_") or k in ("bbox_coder", "train_cfg",
                                              "test_cfg"):
                rpn_cfg.pop(k)
        n_base = (len(anchor_gen.get("ratios", [0.5, 1.0, 2.0]))
                  * len(anchor_gen.get("scales", [8])))
        roi_cfg = dict(cfg.pop("roi_head", {}))
        roi_type = roi_cfg.get("type", "StandardRoIHead")
        bh = roi_cfg.get("bbox_head", {})
        if isinstance(bh, (list, tuple)):  # cascade: per-stage head list
            bh = bh[0] if bh else {}
        bh = dict(bh)
        num_classes = bh.get("num_classes", 80)
        rpn = RPNHead(num_base_anchors=n_base, **{
            k: v for k, v in rpn_cfg.items()
            if k in ("in_channels", "feat_channels")})
        if roi_type == "DoubleHeadRoIHead":
            from .heads.two_stage import (DoubleConvFCBBoxHead,
                                          DoubleHeadRCNNDetector)
            det = DoubleHeadRCNNDetector(
                backbone=backbone, neck=neck, rpn_head=rpn,
                bbox_head=DoubleConvFCBBoxHead(
                    num_classes=num_classes,
                    num_convs=bh.get("num_convs", 4),
                    num_fcs=bh.get("num_fcs", 2),
                    conv_channels=bh.get("conv_out_channels", 1024),
                    fc_channels=bh.get("fc_out_channels", 1024),
                    reg_class_agnostic=bh.get("reg_class_agnostic", False)),
                reg_roi_scale_factor=roi_cfg.get(
                    "reg_roi_scale_factor", 1.3))
            return det, {"num_classes": num_classes}
        bbox_head = Shared2FCBBoxHead(
            num_classes=num_classes,
            fc_channels=bh.get("fc_out_channels", 1024),
            reg_class_agnostic=bh.get("reg_class_agnostic", False))
        if kind in ("HybridTaskCascade", "HTC"):
            mh = dict(roi_cfg.get("mask_head", {}))
            mk_b = lambda: Shared2FCBBoxHead(            # noqa: E731
                num_classes=num_classes,
                fc_channels=bh.get("fc_out_channels", 1024),
                reg_class_agnostic=True)
            mk_m = lambda: HTCMaskHead(                  # noqa: E731
                num_classes=num_classes,
                conv_channels=mh.get("conv_out_channels", 256),
                num_convs=mh.get("num_convs", 4))
            det = HTCDetector(
                backbone=backbone, neck=neck, rpn_head=rpn,
                bbox_head=mk_b(), bbox_head2=mk_b(), bbox_head3=mk_b(),
                mask_head1=mk_m(), mask_head2=mk_m(), mask_head3=mk_m(),
                semantic_head=FusedSemanticHead(
                    num_classes=num_classes,
                    conv_channels=neck_channels))
        elif kind == "CascadeRCNN":
            mk = lambda: Shared2FCBBoxHead(             # noqa: E731
                num_classes=num_classes,
                fc_channels=bh.get("fc_out_channels", 1024),
                reg_class_agnostic=True)
            det = CascadeRCNNDetector(
                backbone=backbone, neck=neck, rpn_head=rpn,
                bbox_head=mk(), bbox_head2=mk(), bbox_head3=mk())
        elif kind == "PointRend":
            mh = dict(roi_cfg.get("mask_head", {}))
            det = PointRendDetector(
                backbone=backbone, neck=neck, rpn_head=rpn,
                bbox_head=bbox_head,
                mask_head=FCNMaskHead(
                    num_classes=num_classes,
                    conv_channels=mh.get("conv_out_channels", 256),
                    num_convs=mh.get("num_convs", 4)),
                point_head=MaskPointHead(num_classes=num_classes))
        elif kind in ("MaskRCNN", "MaskScoringRCNN"):
            mh = dict(roi_cfg.get("mask_head", {}))
            mask_head = FCNMaskHead(
                num_classes=num_classes,
                conv_channels=mh.get("conv_out_channels", 256),
                num_convs=mh.get("num_convs", 4))
            if kind == "MaskScoringRCNN":
                det = MaskScoringRCNNDetector(
                    backbone=backbone, neck=neck, rpn_head=rpn,
                    bbox_head=bbox_head, mask_head=mask_head,
                    maskiou_head=MaskIoUHead(num_classes=num_classes))
            else:
                det = MaskRCNNDetector(backbone=backbone, neck=neck,
                                       rpn_head=rpn, bbox_head=bbox_head,
                                       mask_head=mask_head)
        elif kind == "FastRCNN":
            det = FastRCNNDetector(backbone=backbone, neck=neck,
                                   bbox_head=bbox_head)
        elif kind == "GridRCNN":
            gh = dict(roi_cfg.get("grid_head", {}))
            det = GridRCNNDetector(
                backbone=backbone, neck=neck, rpn_head=rpn,
                bbox_head=bbox_head,
                grid_head=GridHead(
                    grid_points=gh.get("grid_points", 9),
                    num_convs=gh.get("num_convs", 8),
                    point_feat_channels=gh.get("point_feat_channels", 64)))
        else:
            det = TwoStageDetector(backbone=backbone, neck=neck,
                                   rpn_head=rpn, bbox_head=bbox_head)
        return det, {"num_classes": num_classes}
    if kind == "RPN":
        # standalone RPN trainer (reference `detectors/rpn.py`); the head
        # config lives under ``rpn_head``
        head, loss_cfgs = build_head(cfg.pop("rpn_head"))
        return LSDetector(backbone=backbone, neck=neck, head=head), loss_cfgs
    head, loss_cfgs = build_head(cfg.pop("bbox_head"))
    if kind in ("LSDetector", "LSCPVDetector", "RetinaNet", "FCOS",
                "ATSS", "GFL", "RepPointsDetector", "SingleStageDetector",
                "SSD", "FOVEA", "FoveaBox", "FSAF", "FreeAnchor",
                "NASFCOS", "RepPointsV2Detector", "DenseRepPointsDetector",
                "DenseRepPointsV2Detector"):
        # all single-stage: backbone -> neck -> head assembly
        return LSDetector(backbone=backbone, neck=neck, head=head), loss_cfgs
    det_cls = DETECTORS.get(kind)
    if det_cls is None:
        raise KeyError(f"unknown detector {kind}")
    return det_cls(backbone=backbone, neck=neck, head=head), loss_cfgs

"""TPU-native op library (XLA formulations; see docs/PERF.md for the
measured design rules)."""

from .corner_pool import bottom_pool, corner_pool, left_pool, right_pool, top_pool  # noqa: F401
from .deform_conv import (bilinear_gather, deform_conv,  # noqa: F401
                          modulated_deform_conv, pyramid_deform_conv)
from .flat_deform import (SampleJob, dual_pyramid_dcn,  # noqa: F401
                          multi_branch_modulated_dcn,
                          multilevel_modulated_dcn, multilevel_pyramid_dcn,
                          pack_levels)
from .focal_loss import (gaussian_focal_loss, sep_focal_loss,  # noqa: F401
                         sigmoid_focal_loss)
from .misc import carafe, chamfer_distance, masked_conv2d, nms_match  # noqa: F401
from .nms import batched_nms, box_iou, nms, soft_nms  # noqa: F401
from .roi import deform_roi_pool, roi_align, roi_pool  # noqa: F401
from .optflow import (dequantize_flow, flow_warp, flowread,  # noqa: F401
                      flowwrite, quantize_flow)

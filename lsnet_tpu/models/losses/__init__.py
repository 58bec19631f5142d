from .common import (ae_loss, binary_cross_entropy_loss, chamfer_loss,  # noqa: F401
                     ciou_loss, cross_entropy_loss, diou_loss, ghm_c_loss,
                     giou_loss, iou_loss, l1_loss, smooth_l1_loss)
from .cross_iou import cross_iou_loss  # noqa: F401

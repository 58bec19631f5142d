"""Detection core: grid points, assignment, targets, losses, decoding."""

from .assign import AssignResult, atss_assign, centroid_assign  # noqa: F401
from .decode import (Detections, TestConfig, lsnet_decode,  # noqa: F401
                     lsnet_decode_candidates, nms_candidates)
from .loss import LossConfig, lsnet_loss  # noqa: F401
from .cpv import CPVLossConfig, lscpv_decode, lscpv_loss  # noqa: F401

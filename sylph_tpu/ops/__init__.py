"""Device-side ops: the TPU-native replacements for every native (C++/CUDA)
kernel the reference consumes from its dependencies (SURVEY.md §2.3)."""

from .assigner import (FCOSTargets, assign_fcos_targets,
                       assign_fcos_targets_batch, compute_ctrness_targets)
from .decode import DecodeCfg, decode_proposals
from .fcos_losses import (FCOSLossCfg, fcos_episodic_losses,
                          fcos_pretrain_losses)
from .locations import LocationGrid, build_location_grid, flatten_level_maps
from .losses import (bce_with_logits, compute_ious_ltrb, iou_loss_ltrb,
                     sigmoid_focal_loss, smooth_l1)
from .deform_conv import DFConv2d, deform_conv2d
from .nms import batched_multiclass_nms, nms_select
from .roi_align import multilevel_roi_align, roi_align

__all__ = [
    "sigmoid_focal_loss", "bce_with_logits", "smooth_l1", "iou_loss_ltrb",
    "compute_ious_ltrb", "batched_multiclass_nms", "nms_select",
    "roi_align", "multilevel_roi_align", "DFConv2d", "deform_conv2d",
    "FCOSTargets", "assign_fcos_targets", "assign_fcos_targets_batch",
    "compute_ctrness_targets", "DecodeCfg", "decode_proposals",
    "FCOSLossCfg", "fcos_episodic_losses", "fcos_pretrain_losses",
    "LocationGrid", "build_location_grid", "flatten_level_maps",
]

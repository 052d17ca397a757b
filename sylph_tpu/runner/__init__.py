"""Runners: train/eval orchestration (reference sylph/runner/)."""

from .meta_fcos_runner import (MetaFCOSRunner, MetaFCOSROIEncoderRunner,
                               TFAFewShotDetectionRunner, create_runner)
from .meta_faster_rcnn_runner import MetaFasterRCNNRunner

__all__ = ["MetaFCOSRunner", "MetaFCOSROIEncoderRunner",
           "TFAFewShotDetectionRunner", "MetaFasterRCNNRunner",
           "create_runner"]

"""Runners: train/eval orchestration (reference sylph/runner/)."""

from .meta_fcos_runner import (MetaFCOSRunner, MetaFCOSROIEncoderRunner,
                               TFAFewShotDetectionRunner, create_runner)

__all__ = ["MetaFCOSRunner", "MetaFCOSROIEncoderRunner",
           "TFAFewShotDetectionRunner", "create_runner"]

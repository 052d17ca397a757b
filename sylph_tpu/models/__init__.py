"""Model stack: backbone, FPN, FCOS head, hypernetworks, meta-arch.

flax.linen modules in NHWC layout (TPU-native). All convolutions use
explicit torch-style padding so weights converted from the reference's
detectron2 checkpoints reproduce the same activations.
"""

from .resnet import ResNet, FrozenBatchNorm
from .fpn import FPN
from .fcos_head import FCOSHead, Scale
from .code_generator import CodeGeneratorHead
from .roi_encoder import ROIEncoder
from .meta_arch import MetaOneStageDetector

__all__ = [
    "ResNet", "FrozenBatchNorm", "FPN", "FCOSHead", "Scale",
    "CodeGeneratorHead", "ROIEncoder", "MetaOneStageDetector",
]

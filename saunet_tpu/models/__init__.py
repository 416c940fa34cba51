"""Model zoo and factory.

`build_unet` mirrors the reference's ModelBuilder factory surface
(/root/reference/models/models.py:143-166): arch selection, optional
warm-start from a checkpoint (non-strict), and a single supported
architecture, 'saunet'.
"""
from __future__ import annotations

import jax.numpy as jnp

from .blocks import (
    ConvBNRelu,
    DecoderBlock,
    DualAttBlock,
    GatedSpatialConv,
    HighFrequencyGatedSpatialConv,
    ResBasicBlock,
    SEBottleneck,
    SEModule,
    SEResNetBottleneck,
    SpatialAttentionBlock,
)
from .densenet import DenseNetEncoder, port_torchvision_state_dict
from .resnet import (
    BasicBlockStride,
    BottleneckBlock,
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
)
from .saunet import SAUNet
from .segmentation_module import SegmentationModule

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_unet(num_class: int = 4, arch: str = "saunet",
               dtype: str = "float32", **kwargs) -> SAUNet:
    arch = arch.lower()
    if arch != "saunet":
        raise ValueError(f"Architecture undefined: {arch!r}")
    return SAUNet(num_classes=num_class, dtype=_DTYPES[dtype], **kwargs)


__all__ = [
    "SAUNet", "SegmentationModule", "build_unet", "DenseNetEncoder",
    "port_torchvision_state_dict",
    "ConvBNRelu", "DecoderBlock", "DualAttBlock", "GatedSpatialConv",
    "HighFrequencyGatedSpatialConv", "ResBasicBlock", "SEBottleneck",
    "SEModule", "SEResNetBottleneck", "SpatialAttentionBlock",
    "BasicBlockStride", "BottleneckBlock", "ResNet",
    "resnet18", "resnet34", "resnet50", "resnet101",
]

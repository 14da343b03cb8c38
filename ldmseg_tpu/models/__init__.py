from .seg_vae import (
    SegVAE,
    DiagonalGaussian,
    AutoBottleneck,
    GumbelSoftmaxBottleneck,
    CodebookBottleneck,
)
from .layers import LayerNorm2d, ResnetBlock, MidBlock2D
from .unet import (
    UNet2DCondition,
    UNetConfig,
    expand_conv_in,
    freeze_filter,
)
from .image_vae import ImageVAE
from .posenet import PoseExpNet
from .descriptors import get_image_descriptors, DescriptorSpec
from .upscaler import Upscaler

__all__ = [
    "SegVAE",
    "DiagonalGaussian",
    "AutoBottleneck",
    "GumbelSoftmaxBottleneck",
    "CodebookBottleneck",
    "LayerNorm2d",
    "ResnetBlock",
    "MidBlock2D",
    "UNet2DCondition",
    "UNetConfig",
    "expand_conv_in",
    "freeze_filter",
    "ImageVAE",
    "PoseExpNet",
    "get_image_descriptors",
    "DescriptorSpec",
    "Upscaler",
]

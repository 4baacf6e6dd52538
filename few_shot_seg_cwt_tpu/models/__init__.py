from .resnet import DilatedResNet, Bottleneck, RESNET_DEPTHS, RESNET_CHANNELS
from .vgg import VGG16BN
from .pspnet import (
    PSPNet,
    PPM,
    CosCls,
    DotCls,
    build_pspnet,
    init_classifier_weights,
    apply_classifier,
    parse_cls_type,
)
from .cwt import MultiHeadAttentionOne, build_cwt

__all__ = [
    "DilatedResNet",
    "Bottleneck",
    "RESNET_DEPTHS",
    "RESNET_CHANNELS",
    "VGG16BN",
    "PSPNet",
    "PPM",
    "CosCls",
    "DotCls",
    "build_pspnet",
    "init_classifier_weights",
    "apply_classifier",
    "parse_cls_type",
    "MultiHeadAttentionOne",
    "build_cwt",
]

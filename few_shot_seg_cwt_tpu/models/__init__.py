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
from .conv4d import CenterPivotConv4d, Conv4d, conv4d
from .matching import MatchNet, NeighConsensus, SpatialContextEncoder
from .mmn import MMN, build_mmn
from .msm import MSBlock, WeightAverage
from .chm import CHM4d, CHM6d, CHMLearner
from .deform import DeformAtt, MSDeformAttn, grid_sample_bilinear, sine_positional_encoding
from .detr import DeTr, build_detr
from .att_zoo import CrossAttention, MHA, AttentionBlock, LinearDiag, build_attention_variant
from .fusion import DynamicFusion, FuseNet, FuseNet1

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

from .activation import trunc_exp
from .hash_encoding import HashGridEncoding
from .sh_encoding import sh_encoding
from .semantic_nerf import SemanticNeRF
from .deeplabv3 import DeepLabV3, seg_compute_dtype
from .resnet import RESNET101_LAYOUT, TINY_LAYOUT, ResNet101Backbone

__all__ = [
    "trunc_exp", "HashGridEncoding", "sh_encoding", "SemanticNeRF",
    "DeepLabV3", "seg_compute_dtype", "ResNet101Backbone", "RESNET101_LAYOUT", "TINY_LAYOUT"
]

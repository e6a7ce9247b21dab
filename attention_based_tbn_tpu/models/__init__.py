from .attention import (
    MultiheadAttention,
    PositionalEncoding,
    PrototypeAttention,
    UniModalAttention,
    gumbel_softmax,
    positional_encoding_table,
)
from .bn_inception import BNInception, BN_INCEPTION_BLOCKS, InceptionSpec
from .heads import Classifier, Fusion
from .layers import ConvBN, TorchBatchNorm, TorchConv, TorchGroupNorm, TorchLinear
from .losses import (
    attention_entropy,
    contrast_loss,
    cross_entropy,
    kl_div,
    prior_loss,
    tbn_loss,
)
from .resnet import ResNet
from .tbn import TBNModel, TBNSpec
from .vgg import VGG

__all__ = [
    "BNInception",
    "BN_INCEPTION_BLOCKS",
    "Classifier",
    "ConvBN",
    "Fusion",
    "InceptionSpec",
    "MultiheadAttention",
    "PositionalEncoding",
    "PrototypeAttention",
    "ResNet",
    "TBNModel",
    "TBNSpec",
    "TorchBatchNorm",
    "TorchConv",
    "TorchGroupNorm",
    "TorchLinear",
    "UniModalAttention",
    "VGG",
    "attention_entropy",
    "contrast_loss",
    "cross_entropy",
    "gumbel_softmax",
    "kl_div",
    "positional_encoding_table",
    "prior_loss",
    "tbn_loss",
]

from .mlp import make_mlp, mlp_apply, BasicMLP
from .resnet import ResNet256_6_2_1, build_resnet_model
from .autoencoder import ResNetAE
from .bert import TextBert, BertConfig, build_bert_model
from .joint import ImageReportModel

__all__ = [
    "make_mlp",
    "mlp_apply",
    "BasicMLP",
    "ResNet256_6_2_1",
    "build_resnet_model",
    "ResNetAE",
    "TextBert",
    "BertConfig",
    "build_bert_model",
    "ImageReportModel",
]

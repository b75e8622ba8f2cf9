from nuzero_tpu.networks.blocks import (
    VALUE_HEADS,
    BasicBlock,
    CombinedValueHead,
    DenseValueHead,
    DepthValueHead,
    DepthwiseConv,
    HexConv,
    HexDepthwiseConv,
    RawSeparableValueHead,
    ReducePolicyHead,
    ReduceValueHead,
    ReverseValueHead,
    SeparableValueHead,
    StrangeValueHead,
    make_value_head,
)
from nuzero_tpu.networks.convnet import ConvNet
from nuzero_tpu.networks.manager import NetworkManager
from nuzero_tpu.networks.mlp import MLPNetwork
from nuzero_tpu.networks.recurrent import RecurrentNet
from nuzero_tpu.networks.resnet import ResNet

__all__ = [
    "BasicBlock",
    "CombinedValueHead",
    "ConvNet",
    "DenseValueHead",
    "DepthValueHead",
    "DepthwiseConv",
    "HexConv",
    "HexDepthwiseConv",
    "MLPNetwork",
    "NetworkManager",
    "RawSeparableValueHead",
    "RecurrentNet",
    "ReducePolicyHead",
    "ReduceValueHead",
    "ResNet",
    "ReverseValueHead",
    "SeparableValueHead",
    "StrangeValueHead",
    "VALUE_HEADS",
    "make_value_head",
]

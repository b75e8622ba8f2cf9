from nuzero_tpu.networks.blocks import (
    BasicBlock,
    DenseValueHead,
    HexConv,
    ReducePolicyHead,
    ReduceValueHead,
)
from nuzero_tpu.networks.convnet import ConvNet
from nuzero_tpu.networks.manager import NetworkManager
from nuzero_tpu.networks.mlp import MLPNetwork
from nuzero_tpu.networks.recurrent import RecurrentNet
from nuzero_tpu.networks.resnet import ResNet

__all__ = [
    "BasicBlock",
    "ConvNet",
    "DenseValueHead",
    "HexConv",
    "MLPNetwork",
    "NetworkManager",
    "RecurrentNet",
    "ReducePolicyHead",
    "ReduceValueHead",
    "ResNet",
]

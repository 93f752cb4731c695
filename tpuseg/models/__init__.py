from tpuseg.models.blocks import DoubleConv, Down, Up, OutConv, ConvBNAct
from tpuseg.models.unet import UNet, LightUNet
from tpuseg.models.mobilenetv2 import MobileNetV2Encoder
from tpuseg.models.mobilenetv2_unet import MobileNetV2UNet
from tpuseg.models.registry import build_model, MODEL_REGISTRY

__all__ = [
    "DoubleConv",
    "Down",
    "Up",
    "OutConv",
    "ConvBNAct",
    "UNet",
    "LightUNet",
    "MobileNetV2Encoder",
    "MobileNetV2UNet",
    "build_model",
    "MODEL_REGISTRY",
]

"""Encoder zoo. Importing this package registers all encoders."""

from . import convnet4, deit, levit, lvvit, nest, resnet, resnet12, swin, visformer  # noqa: F401
from .common import global_avg_pool  # noqa: F401
from .convnet4 import ConvNet4  # noqa: F401
from .deit import VisionTransformer  # noqa: F401
from .nest import Nest  # noqa: F401
from .swin import SwinTransformer  # noqa: F401
from .levit import Levit  # noqa: F401
from .lvvit import LVViT  # noqa: F401
from .resnet import ResNet  # noqa: F401
from .resnet12 import ResNet12  # noqa: F401
from .visformer import Visformer  # noqa: F401

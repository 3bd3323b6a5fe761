"""Encoder zoo. Importing this package registers all encoders."""

from . import visformer  # noqa: F401
from .common import global_avg_pool  # noqa: F401
from .visformer import Visformer  # noqa: F401

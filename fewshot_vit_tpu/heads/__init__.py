"""Few-shot heads. Importing this package registers all heads."""

from .classifier import Classifier, LinearClassifier, NNClassifier  # noqa: F401
from .meta_baseline import MetaBaseline  # noqa: F401
from .token_label import TokenLabel, TokenLabelEpisodic  # noqa: F401
from .deepemd import DeepEMD  # noqa: F401
from .meta_token import MetaToken, MetaTokenV2, MetaTokenV3  # noqa: F401

from .registry import Registry, models, datasets
from .config import Config, load_config
from .log import Averager, Timer, RunLogger, time_str

__all__ = [
    "Registry",
    "models",
    "datasets",
    "Config",
    "load_config",
    "Averager",
    "Timer",
    "RunLogger",
    "time_str",
]

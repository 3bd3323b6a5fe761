from .io import (
    save_variables,
    load_variables,
    has_checkpoint,
    load_model,
    CheckpointPolicy,
    load_torch_state_dict,
    load_reference_head_checkpoint,
    load_reference_encoder_checkpoint,
    encoder_key_fn_for,
    head_key_fn,
)
from .torch_convert import convert_by_rule, convert_visformer, visformer_key, strip_prefix

__all__ = [
    "save_variables",
    "load_variables",
    "has_checkpoint",
    "load_model",
    "CheckpointPolicy",
    "load_torch_state_dict",
    "load_reference_head_checkpoint",
    "load_reference_encoder_checkpoint",
    "encoder_key_fn_for",
    "head_key_fn",
    "convert_by_rule",
    "convert_visformer",
    "visformer_key",
    "strip_prefix",
]

"""Checkpoint save/load (orbax) + reference-.pth ingestion.

Replaces the reference's torch.save dict format (SURVEY.md §2.1: ``{file,
config, model, model_args, model_sd, training{...}}``, save block
``sun_train_teacher/train_classifier.py:247-274``) and its policies:
``epoch-last`` every epoch, ``epoch-N`` periodically, ``max-va`` on best val.

Here: orbax for arrays (async-capable, TPU-friendly), JSON sidecar for
metadata (model name + args + epoch + val), and ``load_torch_checkpoint`` to
ingest the reference's released ``.pth`` files through the layout converter so
published accuracies are reproducible on TPU.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_variables(path: str, variables: Any, meta: Optional[Dict] = None) -> None:
    """Save a variable/state pytree + JSON meta at ``path`` (a directory).

    Atomic: the checkpoint is fully written to a ``.tmp`` sibling first and
    only swapped into place once arrays *and* meta are on disk, so a crash or
    preemption mid-save never destroys the previous checkpoint (the per-epoch
    ``resume`` directory is the crash-recovery path — it must survive).
    """
    path = os.path.abspath(path)
    tmp, old = path + ".tmp", path + ".old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(old):
        if not os.path.exists(path):
            # a previous save crashed between its two renames: ``.old`` is
            # the only valid checkpoint. Promote it back BEFORE starting the
            # (slow) new write — deleting it here would leave a crash during
            # ckptr.save with zero valid checkpoints.
            os.rename(old, path)
        else:
            shutil.rmtree(old)  # superseded: ``path`` is complete
    ckptr = _ocp().StandardCheckpointer()
    ckptr.save(os.path.join(tmp, "arrays"), variables)
    ckptr.wait_until_finished()
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta or {}, f, indent=2, default=str)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def has_checkpoint(path: str) -> bool:
    """True iff ``load_variables(path)`` would succeed — including the
    crash-window case where only ``path + '.old'`` survived an interrupted
    swap. Resume guards must use THIS, not a bare isdir on ``path/arrays``,
    or the recovery path load_variables implements is silently skipped."""
    path = os.path.abspath(path)
    return (os.path.isdir(os.path.join(path, "arrays"))
            or os.path.isdir(os.path.join(path + ".old", "arrays")))


def load_variables(path: str, target: Optional[Any] = None) -> Tuple[Any, Dict]:
    """Load (variables, meta). ``target`` (a matching pytree of arrays/shapes)
    restores with correct structure/dtypes; without it, restores raw."""
    path = os.path.abspath(path)
    if not os.path.isdir(os.path.join(path, "arrays")):
        # a crash between the two renames in save_variables leaves only .old
        if os.path.isdir(os.path.join(path + ".old", "arrays")):
            path = path + ".old"
        else:
            raise FileNotFoundError(
                f"no checkpoint at {path!r} (expected an orbax 'arrays' dir)"
            )
    ckptr = _ocp().StandardCheckpointer()
    if target is not None:
        variables = ckptr.restore(os.path.join(path, "arrays"), target=target)
    else:
        variables = ckptr.restore(os.path.join(path, "arrays"))
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return variables, meta


class CheckpointPolicy:
    """epoch-last / epoch-N / max-va save policy (reference
    ``train_classifier.py:253-274``)."""

    def __init__(self, save_dir: str, save_epoch: Optional[int] = None):
        self.save_dir = save_dir
        self.save_epoch = save_epoch
        # seed from an existing max-va so a resumed run can't overwrite the
        # best checkpoint with a worse post-resume epoch
        self.best_va = -float("inf")
        # also consult the '.old' crash-window copy: if a max-va save was
        # interrupted between its swap renames, only '.old' holds the best
        # val_acc — seeding -inf would let a worse post-resume epoch
        # overwrite the recovered best checkpoint
        for name in ("max-va", "max-va.old"):
            meta_path = os.path.join(save_dir, name, "meta.json")
            if os.path.exists(meta_path):
                try:
                    with open(meta_path) as f:
                        prev = json.load(f).get("val_acc")
                    if prev is not None:
                        self.best_va = max(self.best_va, float(prev))
                except (ValueError, OSError):
                    pass

    def on_epoch(self, epoch: int, variables: Any, meta: Dict, va: Optional[float] = None) -> None:
        meta = dict(meta, epoch=epoch, val_acc=va)
        save_variables(os.path.join(self.save_dir, "epoch-last"), variables, meta)
        if self.save_epoch and epoch % self.save_epoch == 0:
            save_variables(os.path.join(self.save_dir, f"epoch-{epoch}"), variables, meta)
        if va is not None and va > self.best_va:
            self.best_va = va
            save_variables(os.path.join(self.save_dir, "max-va"), variables, meta)


def load_model(path: str, **overrides: Any):
    """Rebuild a registered model from a checkpoint's embedded metadata and
    return ``(model, variables)`` — the reference's ``models.load(sv)``
    (``models/models.py:21-26``), which reconstructs from the saved name+args.

    The checkpoint meta must carry ``model`` (registry name) and the ctor
    kwargs the phase loops record (``encoder``, ``n_classes``, ...).
    """
    from ..core.registry import models as model_registry

    variables, meta = load_variables(path)
    name = meta.get("model")
    if name is None:
        raise ValueError(f"checkpoint at {path!r} has no 'model' in its meta")
    kwargs: Dict[str, Any] = {}
    if meta.get("encoder"):
        kwargs["encoder"] = meta["encoder"]
    if meta.get("n_classes") is not None:
        kwargs["classifier_args"] = {"n_classes": int(meta["n_classes"])}
    kwargs.update(overrides)
    model = model_registry.make(name, **kwargs)
    return model, variables


# --- reference .pth ingestion -------------------------------------------------


def load_torch_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Read a reference checkpoint file -> (flat numpy state dict, meta).

    Handles the reference dict format (``model_sd`` key) and SUN-D's ``params``
    variant with ``module.`` prefixes (``meta_tuning_sun_d/Models/utils.py:76-99``).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and ("model_sd" in blob or "params" in blob):
        sd = blob.get("model_sd", blob.get("params"))
        meta = {k: blob.get(k) for k in ("model", "model_args") if k in blob}
    else:
        sd, meta = blob, {}
    out = {}
    for k, v in sd.items():
        k = k[len("module."):] if k.startswith("module.") else k
        if k == "temp" and v.ndim == 0:
            out[k] = np.asarray(v)
            continue
        out[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out, meta


def head_key_fn(
    encoder_key_fn: Callable = None,
) -> Callable:
    """Torch-key rule for head-wrapped models (Classifier / TokenLabel /
    MetaBaseline): encoder params prefix 'encoder.', linear heads map to
    '<head>.linear.*', scalar 'temp' maps through."""
    from .torch_convert import visformer_key

    enc_fn = encoder_key_fn or visformer_key

    def key_fn(col, path):
        if path[0] == "encoder":
            return enc_fn(col, path[1:], prefix="encoder.")
        if path == ("temp",):
            return "temp"
        # classifier / classifier_local LinearClassifier -> torch Linear
        parts = [p for p in path[:-1]]
        leaf = "weight" if path[-1] == "kernel" else path[-1]
        return ".".join(parts + [leaf])

    return key_fn


def load_reference_head_checkpoint(
    path: str,
    flax_model,
    flax_variables: Any,
    encoder_key_fn: Callable = None,
) -> Any:
    """Convert a reference head checkpoint (.pth) into flax variables for
    ``flax_model`` (already constructed to match ``model_args``)."""
    from .torch_convert import convert_by_rule

    sd, _ = load_torch_state_dict(path)
    return convert_by_rule(flax_variables, sd, head_key_fn(encoder_key_fn))


def encoder_key_fn_for(encoder_name: str) -> Callable:
    """Torch key rule for a registered encoder name. Raises for an unknown
    name: a silent family fallback would die later inside ``convert_by_rule``
    with a misleading per-tensor KeyError instead of naming the real problem."""
    from .torch_convert import ENCODER_KEY_FNS

    try:
        return ENCODER_KEY_FNS[encoder_name]
    except KeyError:
        raise KeyError(
            f"no torch key rule for encoder {encoder_name!r}; known: "
            f"{sorted(ENCODER_KEY_FNS)}") from None


def load_reference_encoder_checkpoint(
    path: str,
    target_encoder_vars: Any,
    encoder_key_fn: Callable = None,
) -> Any:
    """Convert ONLY the encoder subtree of a reference checkpoint (.pth).

    The reference's ``load_encoder`` loads a full saved model and keeps
    ``.encoder``, discarding head params and ``temp``
    (``meta_tuning_sun_m/train_meta.py:124-125``); this is that rule through
    the torch converter: keys under ``encoder.`` convert into
    ``target_encoder_vars``, everything else is ignored. A state dict with no
    ``encoder.`` nesting is treated as a bare-encoder checkpoint."""
    from .torch_convert import convert_by_rule, strip_prefix, visformer_key

    sd, _ = load_torch_state_dict(path)
    enc_sd = strip_prefix(sd, "encoder.") or sd
    return convert_by_rule(target_encoder_vars, enc_sd,
                           encoder_key_fn or visformer_key)

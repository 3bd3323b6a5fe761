"""Shared phase-runner plumbing: config -> dataset/model/optimizer/loop glue.

One engine, phases as configs — kills the reference's five-way package
duplication (SURVEY.md §1). Each phase main lives in its own module
(``pretrain.py``, ``sun.py``, ``meta_tune.py``) and calls into here.
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import Config, load_config, datasets
from ..core import rng as rng_mod
from ..checkpoint import load_variables
from ..data.datasets import ArrayDataset
from ..eval.episodic import evaluate
from ..heads import MetaBaseline
from .optim import (
    make_optimizer,
    multistep_schedule,
    timm_cosine_schedule,
    timm_multistep_schedule,
)


def parse_args(description: str) -> Tuple[Config, argparse.Namespace]:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", required=True)
    p.add_argument("--name", default=None)
    p.add_argument("--tag", default=None)
    p.add_argument("--seed", type=int, default=rng_mod.DEFAULT_SEED)
    p.add_argument("--save-root", default="./save")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of epoch 2 here")
    args = p.parse_args()
    cfg = load_config(args.config)
    if cfg.get("distributed"):
        # multi-host DCN: must run before any other jax API in this process
        from ..parallel import init_distributed

        n = init_distributed(**dict(cfg.get("distributed_args", {}) or {}))
        print(f"jax.distributed: {n} processes, "
              f"{len(jax.devices())} global devices")
    rng_mod.enable_compilation_cache()
    return cfg, args


def profile_epoch(args, epoch: int):
    """Context manager: jax.profiler trace around epoch 2 when --profile-dir
    is set (replaces the reference's wall-clock-only Timer, SURVEY.md §5.1)."""
    import contextlib

    if getattr(args, "profile_dir", None) and epoch == 2:
        return jax.profiler.trace(args.profile_dir)
    return contextlib.nullcontext()


def save_dir_for(cfg: Config, args: argparse.Namespace, default_name: str) -> str:
    name = args.name or default_name
    if args.tag:
        name += f"_{args.tag}"
    path = os.path.join(args.save_root, name)
    os.makedirs(path, exist_ok=True)
    return path


_DTYPE_NAMES = {
    "float32": jnp.float32, "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
}


def model_dtype(cfg: Config, key: str = "model_args.dtype", default="float32"):
    """Compute dtype for the model from ``model_args.dtype`` (or ``key``).

    ``bfloat16`` gives mixed-precision training the TPU way: parameters and
    optimizer state stay fp32 (flax param dtype), activations and matmuls run
    bfloat16 on the MXU, and every loss is computed in fp32 (the steps cast
    logits up before the cross-entropy)."""
    name = str(cfg.get(key, default)).lower()
    try:
        return _DTYPE_NAMES[name]
    except KeyError:
        raise ValueError(
            f"{key}={name!r}: expected one of {sorted(_DTYPE_NAMES)}"
        ) from None


def build_dataset(cfg: Config, key: str) -> Optional[ArrayDataset]:
    name = cfg.get(key)
    if name is None:
        return None
    dargs = dict(cfg.get(f"{key}_args", {}) or {})
    return datasets.make(name, **dargs)


def visualize_datasets(logger, cfg: Config, **named_datasets) -> None:
    """``visualize_datasets: true`` -> one sample-grid PNG per split in the
    run dir (reference flag of the same name in every phase config)."""
    if not cfg.get("visualize_datasets"):
        return
    for name, ds in named_datasets.items():
        if ds is not None:
            logger.visualize_dataset(ds, name)


def visualize_augmented(logger, cfg: Config, dataset, aug_fn,
                        mean, std, views=("aug",), n_samples: int = 16) -> None:
    """``visualize_datasets: true`` -> one grid PNG per augmented VIEW of a
    training batch, exactly as the model will see it (denormalized back to
    uint8). The reference's grid shows post-transform samples
    (``dataset[i][0]`` through ``convert_raw``,
    ``sun_meta_training/utils/__init__.py:161-166``); with device-side
    augmentation the equivalent human-inspectable artifact is this dump of
    the real ``aug_fn`` output — ``visualize_train_aug.png`` (cropaug) or
    ``visualize_train_{strong,weak}.png`` (SUN dual view)."""
    if not cfg.get("visualize_datasets") or aug_fn is None:
        return
    import jax
    import numpy as np

    rng = np.random.default_rng(0)
    idx = np.sort(rng.choice(len(dataset), min(n_samples, len(dataset)),
                             replace=False))
    out = aug_fn(dataset.images[idx], jax.random.key(0))
    out = out if isinstance(out, tuple) else (out,)
    from ..data.transforms import denormalize

    for vname, v in zip(views, out):
        u8 = np.clip(np.asarray(denormalize(v, mean, std)) * 255.0, 0, 255)
        logger.image_grid(f"visualize_train_{vname}", u8.astype(np.uint8))


def build_optimizer(cfg: Config, params: Any, steps_per_epoch: int, batch_size: int = 0):
    """Optimizer + schedule from a phase config (reference styles unified)."""
    name = cfg.get("optimizer", "sgd")
    oargs = dict(cfg.get("optimizer_args", {}) or {})
    if name == "sam":
        # SAM is a step-level two-pass wrapper (train/sam.py); the optax chain
        # here is its base optimizer. Phase loops read sam_rho/sam_adaptive
        # from optimizer_args to select the SAM step.
        name = oargs.get("base", "sgd")
    lr = float(oargs.get("lr", 1e-3))
    if oargs.get("scale_lr_by_batch") and batch_size:
        lr = lr * batch_size / 512.0  # reference train_classifier.py:130
    wd = float(oargs.get("weight_decay", 0.0) or 0.0)
    epochs = int(cfg.get("max_epoch", 100))
    warmup = int(oargs.get("warmup_epochs", 0))
    sched_name = oargs.get("schedule", "cosine" if name == "adamw" else "multistep")
    if sched_name == "cosine":
        # timm CosineLRScheduler as the reference steps it
        # (train_classifier.py:132,206); lr_min defaults to 0 like timm's
        sched = timm_cosine_schedule(
            lr, steps_per_epoch, epochs, warmup,
            warmup_lr=float(oargs.get("warmup_lr", 1e-6)),
            lr_min=float(oargs.get("min_lr", 0.0)),
        )
    elif sched_name == "multistep" and oargs.get("milestones"):
        gamma = float(oargs.get("gamma", 0.1))
        if warmup > 0:
            # timm MultiStepLRScheduler (train_meta_warmup.py:141: warmup_t=3,
            # warmup_lr_init=1e-5, decay_rate=0.5)
            sched = timm_multistep_schedule(
                lr, steps_per_epoch, epochs, oargs["milestones"], gamma=gamma,
                warmup_epochs=warmup,
                warmup_lr=float(oargs.get("warmup_lr", 1e-5)),
            )
        else:
            # torch MultiStepLR (utils.make_optimizer, train_meta.py:211)
            sched = multistep_schedule(
                lr, steps_per_epoch, oargs["milestones"], gamma=gamma)
    else:
        sched = None
    return make_optimizer(
        params, name, lr=lr, weight_decay=wd, schedule=sched,
        grad_clip=oargs.get("grad_clip"),
        mask_decay=bool(oargs.get("mask_decay", False)),
    )


def fs_head_variables(encoder_variables: Dict, temp: float = 10.0) -> Dict:
    """Assemble MetaBaseline variables around existing encoder state (the
    reference's shared-encoder fs-eval view, ``train_classifier.py:116-118``)."""
    v: Dict[str, Any] = {"params": {"encoder": encoder_variables["params"],
                                    "temp": jnp.asarray(temp, jnp.float32)}}
    if encoder_variables.get("batch_stats"):
        v["batch_stats"] = {"encoder": encoder_variables["batch_stats"]}
    return v


# one MetaBaseline view per encoder: a fresh head per call would defeat the
# evaluator's jitted-callable cache and recompile every fs-eval epoch
_FS_HEAD_CACHE: Dict[int, Any] = {}


def fs_eval(
    encoder, encoder_variables, dataset: ArrayDataset,
    n_episodes: int = 200, way: int = 5, shots=(1, 5), query: int = 15,
    ep_per_batch: int = 8, seed: int = 0,
) -> Dict[str, float]:
    """Few-shot eval hook during training (reference fs-eval every N epochs)."""
    hit = _FS_HEAD_CACHE.get(id(encoder))
    if hit is not None and hit[0] is encoder:
        head = hit[1]
    else:
        head = MetaBaseline(encoder=encoder, temp_learnable=False)
        _FS_HEAD_CACHE[id(encoder)] = (encoder, head)
    variables = fs_head_variables(encoder_variables)
    out = {}
    for shot in shots:
        acc, ci, _ = evaluate(
            head, variables, dataset, n_episodes=n_episodes, way=way,
            shot=shot, query=query, ep_per_batch=ep_per_batch, seed=seed,
        )
        out[f"fsa-{shot}"] = acc
    return out


def emd_fs_eval(
    encoder, encoder_variables, dataset: ArrayDataset,
    n_episodes: int = 200, way: int = 5, shot: int = 1, query: int = 15,
    mode: str = "fcn", patch_list=(2, 3), num_patch: int = 9,
    patch_ratio: float = 2.0, seed: int = 0,
) -> Dict[str, float]:
    """DeepEMD episodic validation during CE pretraining (the reference
    SUN-D ``train_pretrain.py:139-168`` validates every epoch with
    deepemd-fcn episodes). One scan program over fixed-seed episodes."""
    from ..data.sampler import EpisodeSampler
    from ..heads import DeepEMD
    from ..ops.metric import mean_confidence_interval
    from .meta_tune_emd import make_emd_episode_fn, make_patch_fn

    key = (id(encoder), way, shot, query, mode, len(dataset))
    hit = _FS_HEAD_CACHE.get(key)
    if hit is not None and hit[0] is encoder:
        run = hit[1]
    else:
        head = DeepEMD(encoder=encoder)
        img = dataset.images.shape[1]
        patch_fn = make_patch_fn(mode, list(patch_list), num_patch,
                                 patch_ratio, img, False)
        episode_fn = make_emd_episode_fn(
            head, way, shot, query, patch_fn, dataset.mean, dataset.std,
            sfc=shot > 1,
        )
        labels = jnp.tile(jnp.arange(way), query)

        @jax.jit
        def run(variables, images, idx, rng):
            def body(carry, scan_in):
                idx_e, i = scan_in
                logits = episode_fn(variables, images[idx_e],
                                    jax.random.fold_in(rng, i))
                acc = jnp.mean((jnp.argmax(logits, -1) == labels)
                               .astype(jnp.float32))
                return carry, acc

            _, accs = jax.lax.scan(body, None, (idx, jnp.arange(idx.shape[0])))
            return accs

        _FS_HEAD_CACHE[key] = (encoder, run)

    variables = {col: {"encoder": tree} for col, tree in encoder_variables.items()}
    sampler = EpisodeSampler(dataset.labels, n_episodes, way, shot + query, 1)
    idx = np.stack(list(sampler.epoch(rng_mod.np_rng(seed))))
    # SUN-D interleaved layout: index t*way + w -> (class w, item t)
    idx = (idx.reshape(n_episodes, way, shot + query)
           .transpose(0, 2, 1).reshape(n_episodes, -1).astype(np.int32))
    accs = np.asarray(run(variables, jax.device_put(dataset.images),
                          jnp.asarray(idx), rng_mod.root_key(seed)))
    m, h = mean_confidence_interval(accs)
    return {"emd_acc": float(m), "emd_ci": float(h)}


def load_encoder_from_checkpoint(path: str, target_encoder_vars: Any,
                                 encoder_name: str = None) -> Any:
    """Load encoder variables from a checkpoint of any head-wrapped model
    (reference ``load_encoder``, ``test_few_shot.py:56-63``): an orbax dir, or
    a reference ``.pth`` through the torch converter (head params discarded,
    as ``models.load(...).encoder`` does — ``train_meta.py:124-125``).
    ``encoder_name`` picks the torch key rule; default is the visformer rule."""
    if str(path).endswith(".pth"):
        from ..checkpoint.io import (
            encoder_key_fn_for,
            load_reference_encoder_checkpoint,
        )

        key_fn = encoder_key_fn_for(encoder_name) if encoder_name else None
        return load_reference_encoder_checkpoint(
            path, target_encoder_vars, key_fn)
    saved, _ = load_variables(path)
    out = {}
    for col in target_encoder_vars:
        tree = saved.get(col, {})
        if "encoder" in tree:
            out[col] = tree["encoder"]
        else:  # checkpoint of a bare encoder
            out[col] = tree
    return out


def resolve_checkpoint_variables(cfg, head, variables, encoder_name: str):
    """Apply a config's ``load:`` / ``load_encoder:`` to freshly-initialized
    ``variables`` — the one dispatch the eval CLIs share (reference
    ``test_few_shot.py:52-63``): a full orbax save, a reference head ``.pth``
    through the torch converter, or an encoder-only checkpoint (orbax dir or
    reference ``.pth``, head params discarded). Returns ``variables``
    unchanged when the config names no checkpoint."""
    from ..eval.episodic import sub_variables

    path = cfg.get("load") or cfg.get("load_encoder")
    if not path:
        return variables
    if cfg.get("load"):
        if str(path).endswith(".pth"):
            from ..checkpoint.io import (
                encoder_key_fn_for,
                load_reference_head_checkpoint,
            )

            return load_reference_head_checkpoint(
                path, head, variables, encoder_key_fn_for(encoder_name))
        saved, _ = load_variables(path)
        return saved
    enc_vars = load_encoder_from_checkpoint(
        path, sub_variables(variables, "encoder"), encoder_name)
    variables = dict(variables)
    for col, tree in enc_vars.items():
        variables.setdefault(col, {})["encoder"] = tree
    return variables

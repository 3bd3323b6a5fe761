"""Phase 3a (SUN-M): Meta-Baseline episodic meta-tuning.

TPU re-design of ``meta_tuning_sun_m/train_meta.py`` / ``train_meta_warmup.py``:
episodic CE over cosine-prototype logits, SGD(+warmup multistep), per-epoch
reproducible episode draws, optional freeze_bn, episodic val on fixed seeds.

Run: ``python -m fewshot_vit_tpu.train.meta_tune --config configs/meta_tune_mini_visformer_1shot.yaml``
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core import RunLogger, models
from ..core import rng as rng_mod
from .. import models as _models  # noqa: F401
from .. import heads as _heads  # noqa: F401
from ..data import datasets as _datasets  # noqa: F401
from ..checkpoint import CheckpointPolicy, has_checkpoint
from ..data.sampler import EpisodeSampler
from ..eval.episodic import evaluate, sub_variables
from .loop import make_meta_tune_epoch, metrics_mean
from .runner import (
    build_dataset,
    build_optimizer,
    load_encoder_from_checkpoint,
    model_dtype,
    parse_args,
    save_dir_for,
)
from .state import TrainState


def check_standard_episodic(head, name: str) -> None:
    """Fail fast — at config time, not deep inside a jit trace — when the
    selected head does not implement the standard episodic contract this loop
    drives: ``apply(vars, x_shot (E,way,shot,...), x_query (E,Q,...)) ->
    (E,Q,way) logits``. The research/eval-only ports (token-label-ep*,
    meta-token*) and the whole-classification / SUN-D heads mark themselves
    with ``standard_episodic = False``."""
    if not getattr(head, "standard_episodic", True):
        raise ValueError(
            f"model {name!r} does not implement the standard episodic "
            "(x_shot, x_query) -> (E, Q, way) logits contract and cannot be "
            "meta-tuned by this loop. It is a research/eval-only or "
            "phase-specific head — see docs/PARITY.md (research ports) and "
            "train/meta_tune_emd.py (DeepEMD)."
        )


def main(cfg, args) -> TrainState:
    logger = RunLogger(save_dir_for(cfg, args, f"meta_tune_{cfg.get('train_dataset')}"))
    logger.log(f"config: {cfg.to_dict()}")

    train_ds = build_dataset(cfg, "train_dataset")
    val_ds = build_dataset(cfg, "val_dataset") or train_ds
    # optional second monitoring loader on the test split (reference 'tval',
    # meta_tuning_sun_m/train_meta_warmup.py:86-101)
    tval_ds = build_dataset(cfg, "tval_dataset")
    from .runner import visualize_datasets
    visualize_datasets(logger, cfg, train_dataset=train_ds, val_dataset=val_ds,
                       tval_dataset=tval_ds)

    way = int(cfg.get("n_train_way", cfg.get("n_way", 5)))
    shot = int(cfg.get("n_train_shot", cfg.get("n_shot", 1)))
    query = int(cfg.get("n_train_query", cfg.get("n_query", 15)))
    ep_per_batch = int(cfg.get("ep_per_batch", 4))
    train_batches = int(cfg.get("train_batches", 100))
    epochs = int(cfg.get("max_epoch", 100))

    head = models.make(
        cfg.get("model", "meta-baseline"),
        encoder=cfg.get("model_args.encoder", "visformer_micro_80"),
        encoder_args=dict(cfg.get("model_args.encoder_args", {}) or {}),
        temp=float(cfg.get("model_args.temp", 10.0)),
        temp_learnable=bool(cfg.get("model_args.temp_learnable", True)),
        dtype=model_dtype(cfg),
    )
    check_standard_episodic(head, cfg.get("model", "meta-baseline"))
    img = train_ds.images.shape[1]
    xs0 = jnp.zeros((1, way, shot, img, img, 3), jnp.float32)
    xq0 = jnp.zeros((1, way * query, img, img, 3), jnp.float32)
    variables = head.init(jax.random.key(args.seed), xs0, xq0)

    load_enc = cfg.get("load_encoder")
    if load_enc:
        enc_vars = load_encoder_from_checkpoint(
            load_enc, sub_variables(variables, "encoder"),
            cfg.get("model_args.encoder", "visformer_micro_80"),
        )
        variables = jax.tree_util.tree_map(lambda x: x, variables)
        for col, tree in enc_vars.items():
            variables.setdefault(col, {})["encoder"] = tree
    else:
        logger.log("WARNING: no 'load_encoder' — encoder randomly initialized")

    tx = build_optimizer(cfg, variables["params"], train_batches)
    state = TrainState.create(variables, tx)

    mesh_cfg = cfg.get("mesh")
    idx_shard = None
    data_shard = None
    if mesh_cfg:
        # multi-chip meta-tuning: episodes shard on `data` (the flat episode
        # batch axis reshapes to (E, way, shot+query) keeping E sharded), wide
        # kernels optionally tensor-parallel — same recipe as pretrain/sun.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import make_mesh, param_shardings, replicated

        mesh = make_mesh({k: int(v) for k, v in dict(mesh_cfg).items()})
        logger.log(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
        pshard = param_shardings(mesh, state.params)
        params = jax.tree_util.tree_map(jax.device_put, state.params, pshard)
        new_vars = {"params": params}
        if state.batch_stats:
            new_vars["batch_stats"] = jax.device_put(
                state.batch_stats, replicated(mesh))
        state = TrainState.create(new_vars, tx)
        data_shard = replicated(mesh)
        idx_shard = NamedSharding(mesh, P(None, "data"))  # (steps, E*way*(s+q))

    epoch_fn = make_meta_tune_epoch(
        head, tx, way, shot, query, ep_per_batch,
        freeze_bn=bool(cfg.get("freeze_bn", False)),
        mean=train_ds.mean, std=train_ds.std,
    )
    # Over-HBM train splits (ImageNet-800 scale, reference
    # sun_train_teacher/train_meta_im800.yaml): an epoch only touches
    # train_batches*ep_per_batch*way*(shot+query) images, so gather that
    # epoch subset host-side (memmap-friendly) and ship it as one
    # fixed-shape array — episode indices remap to the staged subset.
    from ..data.staging import DEFAULT_HBM_BUDGET_GB, needs_staging

    hbm_budget = float(cfg.get("hbm_budget_gb", DEFAULT_HBM_BUDGET_GB))
    stage = needs_staging(train_ds.images, hbm_budget)
    epoch_cap = min(train_batches * ep_per_batch * way * (shot + query),
                    len(train_ds))
    if stage:
        cap_bytes = epoch_cap * (train_ds.images.nbytes // len(train_ds))
        if cap_bytes > hbm_budget * 2 ** 30:
            raise ValueError(
                f"one epoch touches {cap_bytes / 2**30:.1f} GiB of episode "
                f"images > hbm_budget_gb={hbm_budget:g}; lower train_batches/"
                "ep_per_batch or raise the budget")
        logger.log(f"epoch-subset staging: dataset "
                   f"{train_ds.images.nbytes / 2**30:.1f} GiB > {hbm_budget:g} GiB; "
                   f"staging <= {epoch_cap} images/epoch")
        images_dev = None
    else:
        images_dev = jax.device_put(train_ds.images, data_shard)
    sampler = EpisodeSampler(train_ds.labels, train_batches, way, shot + query, ep_per_batch)
    n_way, n_shot = int(cfg.get("n_way", 5)), int(cfg.get("n_shot", 1))
    n_query = int(cfg.get("n_query", 15))
    val_episodes = int(cfg.get("val_episodes", 200))

    # monitoring splits stay device-resident across epochs (the host->device
    # link here is slow; re-uploading a val split per epoch costs ~10s/100MB)
    val_indices = None
    if val_ds is train_ds and stage:
        # fixed-seed val episodes repeat every epoch — stage just their images
        from ..data.staging import epoch_subset
        from ..eval.episodic import sample_episode_indices

        idx_val = sample_episode_indices(
            val_ds, val_episodes, n_way, n_shot + n_query, ep_per_batch, seed=0)
        subset, val_indices = epoch_subset(
            val_ds.images, idx_val, len(np.unique(idx_val)))
        val_images_dev = jax.device_put(subset)
    elif val_ds is train_ds and not stage:
        val_images_dev = images_dev
    else:
        val_images_dev = jax.device_put(val_ds.images)
    tval_images_dev = jax.device_put(tval_ds.images) if tval_ds is not None else None
    policy = CheckpointPolicy(logger.save_dir, save_epoch=cfg.get("save_epoch"))
    root = rng_mod.root_key(args.seed)

    # full-state resume (see train/pretrain.py)
    import os

    from ..checkpoint import load_variables, save_variables

    resume_dir = os.path.join(logger.save_dir, "resume")
    start_epoch = 1
    if cfg.get("resume") and has_checkpoint(resume_dir):
        state, meta = load_variables(resume_dir, target=state)
        start_epoch = int(meta.get("epoch", 0)) + 1
        logger.log(f"resumed full train state from epoch {start_epoch - 1}")

    for epoch in range(start_epoch, epochs + 1):
        t0 = time.time()
        # per-epoch seeded episode draws (reference train_meta.py:147)
        ep_rng = rng_mod.np_rng(args.seed, epoch)
        idx = np.stack(list(sampler.epoch(ep_rng))).astype(np.int32)
        if stage:
            from ..data.staging import epoch_subset

            imgs_epoch, idx_local = epoch_subset(train_ds.images, idx, epoch_cap)
            imgs_dev_e = jax.device_put(imgs_epoch, data_shard)
            idx_local = jnp.asarray(idx_local)
            if idx_shard is not None:
                idx_local = jax.device_put(idx_local, idx_shard)
            state, ms = epoch_fn(state, imgs_dev_e, idx_local,
                                 rng_mod.epoch_key(root, epoch))
            m = metrics_mean(ms)  # fetch completes the epoch...
            imgs_dev_e.delete()  # ...so the subset can be freed pre-val
        else:
            idx_dev = jnp.asarray(idx)
            if idx_shard is not None:
                idx_dev = jax.device_put(idx_dev, idx_shard)
            state, ms = epoch_fn(state, images_dev, idx_dev,
                                 rng_mod.epoch_key(root, epoch))
            m = metrics_mean(ms)
        line = f"epoch {epoch} train loss={m['loss']:.4f} acc={m['acc']:.4f}"

        # fixed-seed episodic val (reference seeds val draws with 0)
        acc, ci, _ = evaluate(
            head, state.variables, val_ds,
            n_episodes=val_episodes, way=n_way, shot=n_shot, query=n_query,
            ep_per_batch=ep_per_batch, seed=0, images_dev=val_images_dev,
            indices=val_indices,
        )
        line += f" | val {n_way}w{n_shot}s acc={acc:.4f} +- {ci:.4f}"
        extra = {}
        if tval_ds is not None:
            tacc, tci, _ = evaluate(
                head, state.variables, tval_ds,
                n_episodes=int(cfg.get("tval_episodes", 500)), way=n_way, shot=n_shot,
                query=int(cfg.get("n_query", 15)),
                ep_per_batch=ep_per_batch, seed=0, images_dev=tval_images_dev,
            )
            line += f" | tval acc={tacc:.4f} +- {tci:.4f}"
            extra["tval_acc"] = tacc
        logger.log(line + f" ({time.time() - t0:.1f}s)")
        logger.metrics(epoch, **m, val_acc=acc, **extra)
        policy.on_epoch(epoch, state.variables,
                        {"model": "meta-baseline",
                         "encoder": cfg.get("model_args.encoder")}, va=acc)
        save_variables(resume_dir, state, {"epoch": epoch})
    return state


if __name__ == "__main__":
    cfg, args = parse_args("phase-3a SUN-M meta-tuning")
    main(cfg, args)

"""Phase 1: supervised whole-classification pretraining of the teacher.

TPU re-design of ``sun_train_teacher/train_classifier.py:31-293``: CE over all
base classes, AdamW with batch-scaled lr + cosine warmup, per-epoch val CE,
periodic few-shot eval through a shared-encoder MetaBaseline view, checkpoint
policy epoch-last/epoch-N/max-va. The whole epoch is one device program.

Run: ``python -m fewshot_vit_tpu.train.pretrain --config configs/pretrain_mini_visformer.yaml``
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core import RunLogger, models
from ..core import rng as rng_mod
from .. import models as _models  # noqa: F401 — register encoders
from .. import heads as _heads  # noqa: F401 — register heads
from ..data import datasets as _datasets  # noqa: F401 — register datasets
from ..checkpoint import CheckpointPolicy, has_checkpoint
from ..eval.episodic import sub_variables
from .loop import batch_indices, eval_metrics, make_eval_ce_epoch, make_pretrain_epoch, metrics_mean
from .runner import (
    build_dataset,
    build_optimizer,
    fs_eval,
    model_dtype,
    parse_args,
    profile_epoch,
    save_dir_for,
)
from .state import TrainState


def main(cfg, args) -> TrainState:
    logger = RunLogger(save_dir_for(cfg, args, f"pretrain_{cfg.get('train_dataset')}"))
    logger.log(f"config: {cfg.to_dict()}")

    train_ds = build_dataset(cfg, "train_dataset")
    val_ds = build_dataset(cfg, "val_dataset")
    fs_ds = build_dataset(cfg, "fs_dataset")
    from .runner import visualize_datasets
    visualize_datasets(logger, cfg, train_dataset=train_ds, val_dataset=val_ds,
                       fs_dataset=fs_ds)

    n_classes = train_ds.n_classes
    model = models.make(
        cfg.get("model", "classifier"),
        encoder=cfg.get("model_args.encoder", "visformer_micro_80"),
        encoder_args=dict(cfg.get("model_args.encoder_args", {}) or {}),
        classifier=cfg.get("model_args.classifier", "linear-classifier"),
        classifier_args={"n_classes": n_classes},
        dtype=model_dtype(cfg),
    )

    batch_size = int(cfg.get("batch_size", 512))
    epochs = int(cfg.get("max_epoch", 100))
    steps_per_epoch = len(train_ds) // batch_size

    # model input size = post-augmentation size, not the raw stored size
    img = int(cfg.get("image_size", 80 if cfg.get("augment") else train_ds.images.shape[1]))
    variables = model.init(
        jax.random.key(args.seed), jnp.zeros((1, img, img, 3), jnp.float32)
    )
    tx = build_optimizer(cfg, variables["params"], steps_per_epoch, batch_size)
    # reference ModelEma (utils/__init__.py:174-196; commented out of use in
    # offline.py) — opt-in: `ema_decay: 0.9997` keeps an EMA shadow of the
    # params in the train state (saved/restored with it)
    ema_decay = float(cfg.get("ema_decay", 0) or 0)
    state = TrainState.create(variables, tx, ema=bool(ema_decay))

    from ..data.staging import DEFAULT_HBM_BUDGET_GB, EpochStager, needs_staging

    hbm_budget = float(cfg.get("hbm_budget_gb", DEFAULT_HBM_BUDGET_GB))
    stage = needs_staging(train_ds.images, hbm_budget)
    images_dev = labels_dev = None

    mesh_cfg = cfg.get("mesh")
    batch_shard = None
    image_shard = None
    if mesh_cfg:
        # multi-chip: dp over the batch axis, optional tp on wide kernels
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import make_mesh, param_shardings, replicated

        mesh = make_mesh({k: int(v) for k, v in dict(mesh_cfg).items()})
        logger.log(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
        pshard = param_shardings(mesh, state.params)
        params = jax.tree_util.tree_map(jax.device_put, state.params, pshard)
        state = TrainState.create(
            {"params": params, "batch_stats": jax.device_put(state.batch_stats, replicated(mesh))},
            tx, ema=bool(ema_decay),
        )
        image_shard = replicated(mesh)
        batch_shard = NamedSharding(mesh, P(None, "data"))  # idx (steps, batch)
    if not stage:
        # one upload, with the final placement (replicated iff mesh)
        images_dev = jax.device_put(train_ds.images, image_shard)
        labels_dev = jax.device_put(train_ds.labels.astype(np.int32), image_shard)
    preprocess_fn = None
    if cfg.get("augment") == "cropaug":
        # timm create_transform pipeline, on device (reference 'cropaug' path)
        from ..data.augment import make_cropaug_fn

        preprocess_fn = make_cropaug_fn(
            train_ds.mean, train_ds.std, out_size=int(cfg.get("image_size", 80))
        )
        from .runner import visualize_augmented
        visualize_augmented(logger, cfg, train_ds, preprocess_fn,
                            train_ds.mean, train_ds.std)
    sam_kw = {}
    if cfg.get("optimizer") == "sam":
        oargs = dict(cfg.get("optimizer_args", {}) or {})
        sam_kw = {"sam_rho": float(oargs.get("sam_rho", 0.05)),
                  "sam_adaptive": bool(oargs.get("adaptive", False))}
        logger.log(f"SAM pretraining: {sam_kw}")
    epoch_fn = make_pretrain_epoch(
        model, tx, preprocess_fn=preprocess_fn, mean=train_ds.mean, std=train_ds.std,
        ema_decay=ema_decay or None, remat=bool(cfg.get("remat", False)), **sam_kw,
    )
    stager = None
    if stage:
        stager = EpochStager(
            train_ds.images, train_ds.labels, batch_size,
            budget_gb=hbm_budget, sharding=batch_shard, image_sharding=image_shard,
        )
        logger.log(
            f"HBM staging: {train_ds.images.nbytes / 2**30:.1f} GiB dataset > "
            f"{hbm_budget:g} GiB budget -> {stager.n_chunks} chunks/epoch "
            f"x {stager.chunk_imgs} imgs"
        )

    def run_epoch(fn, state, epoch_i, key):
        """One epoch through ``fn``; streams HBM-sized chunks when staged."""
        if stager is None:
            idx = batch_indices(len(train_ds), batch_size, rng_mod.np_rng(args.seed, epoch_i))
            idx = jnp.asarray(idx)
            if batch_shard is not None:
                idx = jax.device_put(idx, batch_shard)
            state, ms = fn(state, images_dev, labels_dev, idx, key)
            return state, {k: np.asarray(v) for k, v in ms.items()}
        chunks = []
        for ci, (imgs_c, labels_c, idx_c) in enumerate(
            stager.epoch(rng_mod.np_rng(args.seed, epoch_i))
        ):
            state, ms = fn(state, imgs_c, labels_c, idx_c, jax.random.fold_in(key, ci))
            # fetch per chunk — forces completion so the staged buffer can be
            # freed before the next chunk uploads (never 2 chunks in HBM)
            chunks.append({k: np.asarray(v) for k, v in ms.items()})
        return state, {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}

    eval_fn = (make_eval_ce_epoch(model, train_ds.mean, train_ds.std,
                              n_valid=len(val_ds)) if val_ds else None)
    val_images = jax.device_put(val_ds.images) if val_ds else None
    val_labels = jax.device_put(val_ds.labels.astype(np.int32)) if val_ds else None

    policy = CheckpointPolicy(logger.save_dir, save_epoch=cfg.get("save_epoch"))
    root = rng_mod.root_key(args.seed)
    eval_fs_epoch = int(cfg.get("eval_fs_epoch", 5) or 0)

    # crash/preemption recovery: the FULL train state (params, batch stats,
    # optimizer state, step) checkpoints every epoch; `resume: true` picks up
    # where the last run stopped (the reference can only warm-start weights
    # via config['load'], losing optimizer state — SURVEY.md §5.3/5.4)
    import os

    from ..checkpoint import load_variables, save_variables

    resume_dir = os.path.join(logger.save_dir, "resume")
    start_epoch = 1
    if cfg.get("resume") and has_checkpoint(resume_dir):
        from .state import resume_train_state

        state, meta, note = resume_train_state(resume_dir, state)
        start_epoch = int(meta.get("epoch", 0)) + 1
        logger.log(f"resumed full train state from epoch {start_epoch - 1}")
        if note:
            logger.log(note)

    # the EMA shadow must be consumable, not just carried: checkpoint it under
    # ema/ (epoch-last + max-va on its own val acc) so it can be loaded like
    # any other checkpoint (reference ModelEma's evaluate-the-shadow use)
    ema_policy = CheckpointPolicy(os.path.join(logger.save_dir, "ema")) if ema_decay else None

    for epoch in range(start_epoch, epochs + 1):
        t0 = time.time()
        with profile_epoch(args, epoch):
            state, ms = run_epoch(epoch_fn, state, epoch, rng_mod.epoch_key(root, epoch))
        m = metrics_mean(ms)
        line = f"epoch {epoch} train loss={m['loss']:.4f} acc={m['acc']:.4f}"

        va = None
        if eval_fn is not None:
            vidx = batch_indices(len(val_ds), min(batch_size, len(val_ds)),
                                 rng_mod.np_rng(0, 0), drop_last=False)
            vm = eval_metrics(eval_fn(state.variables, val_images, val_labels, jnp.asarray(vidx)))
            va = vm["acc"]
            line += f" | val loss={vm['loss']:.4f} acc={va:.4f}"

        if fs_ds is not None and eval_fs_epoch and epoch % eval_fs_epoch == 0:
            fm = fs_eval(model.encoder, sub_variables(state.variables, "encoder"), fs_ds,
                         n_episodes=int(cfg.get("eval_fs_episodes", 200)))
            if cfg.get("eval_emd"):
                # SUN-D-style DeepEMD-episode validation during CE pretraining
                # (reference meta_tuning_sun_d/train_pretrain.py:139-168)
                from .runner import emd_fs_eval

                fm.update(emd_fs_eval(
                    model.encoder, sub_variables(state.variables, "encoder"),
                    fs_ds, n_episodes=int(cfg.get("eval_emd_episodes", 100)),
                    mode=cfg.get("eval_emd_mode", "fcn"),
                ))
            line += " | " + " ".join(f"{k}={v:.4f}" for k, v in fm.items())
            logger.metrics(epoch, **fm)

        ema_va = None
        if ema_policy is not None:
            ema_variables = {"params": state.ema_params}
            if state.batch_stats:
                ema_variables["batch_stats"] = state.batch_stats
            if eval_fn is not None:
                vidx = batch_indices(len(val_ds), min(batch_size, len(val_ds)),
                                     rng_mod.np_rng(0, 0), drop_last=False)
                ema_va = eval_metrics(
                    eval_fn(ema_variables, val_images, val_labels, jnp.asarray(vidx))
                )["acc"]
                line += f" | ema val acc={ema_va:.4f}"

        logger.log(line + f" ({time.time() - t0:.1f}s)")
        logger.metrics(epoch, **m, **({"val_acc": va} if va is not None else {}),
                       **({"ema_val_acc": ema_va} if ema_va is not None else {}))
        policy.on_epoch(epoch, state.variables,
                        {"model": "classifier", "n_classes": n_classes,
                         "encoder": cfg.get("model_args.encoder")}, va=va)
        if ema_policy is not None:
            ema_policy.on_epoch(epoch, ema_variables,
                                {"model": "classifier", "n_classes": n_classes,
                                 "encoder": cfg.get("model_args.encoder"),
                                 "ema_decay": ema_decay}, va=ema_va)
        save_variables(resume_dir, state, {"epoch": epoch, "ema": bool(ema_decay)})

    if cfg.get("epoch_ex"):
        # reference 'extra epoch with the default transform' -> epoch-ex.pth
        # (train_classifier.py:141-148, 253-274): one more epoch WITHOUT the
        # stochastic augmentation pipeline
        from ..checkpoint import save_variables

        # same execution options as the main epochs (remat so a memory-tight
        # run can't OOM on the extra epoch; ema_decay so the shadow keeps
        # updating) — only the augmentation pipeline is dropped
        plain_epoch_fn = make_pretrain_epoch(model, tx, mean=train_ds.mean, std=train_ds.std,
                                             ema_decay=ema_decay or None,
                                             remat=bool(cfg.get("remat", False)), **sam_kw)
        state, ms = run_epoch(plain_epoch_fn, state, epochs + 1,
                              rng_mod.epoch_key(root, epochs + 1))
        m = metrics_mean(ms)
        logger.log(f"epoch-ex train loss={m['loss']:.4f} acc={m['acc']:.4f}")
        save_variables(f"{logger.save_dir}/epoch-ex", state.variables,
                       {"model": "classifier", "n_classes": n_classes,
                        "encoder": cfg.get("model_args.encoder"), "epoch": "ex"})
        if ema_decay:
            # the extra epoch updated the shadow too — export it, else the
            # consumable ema/ checkpoints lag one epoch behind epoch-ex
            ema_variables = {"params": state.ema_params}
            if state.batch_stats:
                ema_variables["batch_stats"] = state.batch_stats
            save_variables(f"{logger.save_dir}/ema/epoch-ex", ema_variables,
                           {"model": "classifier", "n_classes": n_classes,
                            "encoder": cfg.get("model_args.encoder"),
                            "epoch": "ex", "ema_decay": ema_decay})
    return state


if __name__ == "__main__":
    cfg, args = parse_args("phase-1 teacher pretraining")
    main(cfg, args)

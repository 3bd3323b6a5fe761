"""Phase 2: SUN meta-training (self-promoted supervision).

TPU re-design of ``sun_meta_training/offline.py:78-443``: a token-label student
is trained with global CE plus a weighted soft cross-entropy on its patch-token
logits against soft labels produced by a FROZEN teacher (the phase-1 classifier
re-wrapped as a token-label model). Validation is episodic cosine matching on
pooled features at temp 10; few-shot 1/5-shot eval runs every N epochs.

Run: ``python -m fewshot_vit_tpu.train.sun --config configs/sun_mini_visformer.yaml``
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
from ..checkpoint import CheckpointPolicy, has_checkpoint, load_variables
from ..eval.episodic import sub_variables
from .loop import batch_indices, make_sun_epoch, metrics_mean
from .runner import build_dataset, build_optimizer, fs_eval, model_dtype, parse_args, save_dir_for
from .state import TrainState


def assemble_teacher_variables(teacher_init_vars, classifier_ckpt_vars):
    """Fill a token-label teacher from a phase-1 classifier checkpoint:
    encoder + global classifier copied, classifier_local left at init (unused
    for the teacher) — the reference's strict=False reload with model_args
    overridden (``offline.py:201-205``, ``models/models.py:21-26``)."""
    out = jax.tree_util.tree_map(lambda x: x, teacher_init_vars)
    for col in out:
        ck = classifier_ckpt_vars.get(col, {})
        for name in ("encoder", "classifier"):
            if name in ck:
                out[col][name] = ck[name]
    return out


def main(cfg, args) -> TrainState:
    logger = RunLogger(save_dir_for(cfg, args, f"sun_{cfg.get('train_dataset')}"))
    logger.log(f"config: {cfg.to_dict()}")

    train_ds = build_dataset(cfg, "train_dataset")
    fs_ds = build_dataset(cfg, "fs_dataset")
    from .runner import visualize_datasets
    visualize_datasets(logger, cfg, train_dataset=train_ds, fs_dataset=fs_ds)
    n_classes = train_ds.n_classes

    def make_token_label(dtype):
        return models.make(
            "token-label",
            encoder=cfg.get("model_args.encoder", "visformer_micro_80"),
            encoder_args=dict(cfg.get("model_args.encoder_args", {}) or {}),
            classifier_args={"n_classes": n_classes},
            dtype=dtype,
        )

    student = make_token_label(model_dtype(cfg))
    # The teacher is frozen and only produces top-k soft labels (no gradients
    # flow through it), so it can run at lower precision than the student —
    # `teacher_dtype: bfloat16` halves the teacher forward's MXU/HBM cost in
    # an otherwise-fp32 run. Defaults to the student's dtype.
    teacher = make_token_label(
        model_dtype(cfg, key="teacher_dtype",
                    default=str(cfg.get("model_args.dtype", "float32")))
    )

    img = int(cfg.get("image_size", 80))
    dummy = jnp.zeros((1, img, img, 3), jnp.float32)
    sv = student.init(jax.random.key(args.seed), dummy)
    tv = teacher.init(jax.random.key(args.seed + 1), dummy)

    load_path = cfg.get("load")
    if load_path:
        ck, _ = load_variables(load_path)
        tv = assemble_teacher_variables(tv, ck)
        if bool(cfg.get("init_student_from_teacher", True)):
            sv = assemble_teacher_variables(sv, ck)
    else:
        logger.log("WARNING: no 'load' checkpoint — teacher is randomly initialized")

    batch_size = int(cfg.get("batch_size", 512))
    epochs = int(cfg.get("max_epoch", 100))
    steps_per_epoch = max(1, len(train_ds) // batch_size)
    tx = build_optimizer(cfg, sv["params"], steps_per_epoch, batch_size)
    state = TrainState.create(sv, tx)
    # The epoch program donates the train state; the teacher may share loaded
    # buffers with the student (init_student_from_teacher), so give the teacher
    # its own copies to keep donation sound.
    tv = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), tv)

    mesh_cfg = cfg.get("mesh")
    batch_shard = None
    data_shard = None
    if mesh_cfg:
        # multi-chip SUN: dp over the batch axis, optional tp on wide kernels;
        # the frozen teacher replicates (forward-only). Same semantics as the
        # single-chip program — BN stats become exact global-batch stats.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import make_mesh, param_shardings, replicated

        mesh = make_mesh({k: int(v) for k, v in dict(mesh_cfg).items()})
        logger.log(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
        pshard = param_shardings(mesh, state.params)
        params = jax.tree_util.tree_map(jax.device_put, state.params, pshard)
        state = TrainState.create(
            {"params": params,
             "batch_stats": jax.device_put(state.batch_stats, replicated(mesh))},
            tx,
        )
        tv = jax.device_put(tv, replicated(mesh))
        data_shard = replicated(mesh)
        batch_shard = NamedSharding(mesh, P(None, "data"))  # idx (steps, batch)

    dual_view_fn = None
    if cfg.get("augment", "dual") == "dual":
        # location-aware weak/strong views on device (reference dual-view set)
        from ..data.augment import make_dual_view_fn

        dual_view_fn = make_dual_view_fn(
            train_ds.mean, train_ds.std,
            out_size=int(cfg.get("image_size", 80)),
            strong_prob=float(cfg.get("strong_prob", 0.5)),
        )
        from .runner import visualize_augmented
        visualize_augmented(logger, cfg, train_ds, dual_view_fn,
                            train_ds.mean, train_ds.std,
                            views=("strong", "weak"))
    epoch_fn = make_sun_epoch(
        student, teacher, tx,
        dual_view_fn=dual_view_fn,
        remat=bool(cfg.get("remat", False)),
        mean=train_ds.mean, std=train_ds.std,
        soft_k=int(cfg.get("tl_soft_k", 5)),
        bg_tokens=int(cfg.get("bg_token_num", 10)),
        token_weight=float(cfg.get("token_label_weight", 0.5)),
    )
    images_dev = jax.device_put(train_ds.images, data_shard)
    labels_dev = jax.device_put(train_ds.labels.astype(np.int32), data_shard)

    policy = CheckpointPolicy(logger.save_dir, save_epoch=cfg.get("save_epoch"))
    root = rng_mod.root_key(args.seed)
    eval_fs_epoch = int(cfg.get("eval_fs_epoch", 5) or 0)

    # full-state resume (see train/pretrain.py) — the 800-epoch SUN phase is
    # the longest-running job in the pipeline
    import os

    from ..checkpoint import save_variables

    resume_dir = os.path.join(logger.save_dir, "resume")
    start_epoch = 1
    if cfg.get("resume") and has_checkpoint(resume_dir):
        state, meta = load_variables(resume_dir, target=state)
        start_epoch = int(meta.get("epoch", 0)) + 1
        logger.log(f"resumed full train state from epoch {start_epoch - 1}")

    for epoch in range(start_epoch, epochs + 1):
        t0 = time.time()
        idx = batch_indices(len(train_ds), batch_size, rng_mod.np_rng(args.seed, epoch))
        idx = jnp.asarray(idx)
        if batch_shard is not None:
            idx = jax.device_put(idx, batch_shard)
        state, ms = epoch_fn(
            state, tv, images_dev, labels_dev, idx,
            rng_mod.epoch_key(root, epoch),
        )
        m = metrics_mean(ms)
        line = (f"epoch {epoch} loss={m['loss']:.4f} cls={m['cls_loss']:.4f} "
                f"token={m['token_loss']:.4f} acc={m['acc']:.4f}")

        va = None
        if fs_ds is not None and eval_fs_epoch and epoch % eval_fs_epoch == 0:
            fm = fs_eval(student.encoder, sub_variables(state.variables, "encoder"), fs_ds,
                         n_episodes=int(cfg.get("eval_fs_episodes", 200)))
            va = fm.get("fsa-1")
            line += " | " + " ".join(f"{k}={v:.4f}" for k, v in fm.items())
            logger.metrics(epoch, **fm)

        logger.log(line + f" ({time.time() - t0:.1f}s)")
        logger.metrics(epoch, **m)
        policy.on_epoch(epoch, state.variables,
                        {"model": "token-label", "n_classes": n_classes,
                         "encoder": cfg.get("model_args.encoder")}, va=va)
        save_variables(resume_dir, state, {"epoch": epoch})
    return state


if __name__ == "__main__":
    cfg, args = parse_args("phase-2 SUN meta-training")
    main(cfg, args)

"""Phase 3b (SUN-D): DeepEMD meta-tuning.

TPU re-design of ``meta_tuning_sun_d/train_meta.py``: episodic CE over
EMD-matching logits, SGD(nesterov, momentum .9, wd 5e-4) + StepLR(10, .5),
task-batch gradient accumulation expressed as episode batching, SFC prototype
refinement for shot>1, NaN-grad zeroing, fixed val episodes. Per-episode work
(patch pyramid -> encode -> Sinkhorn EMD) runs as ONE vmapped program — the
reference's per-(query, proto) OpenCV CPU loop (``:114-124``) is gone.

Episode index order is the reference's INTERLEAVED layout
(``Models/dataloader/samplers.py:5-34``): item-major 'abcdabcd', labels
``tile(arange(way), query)``.

Run: ``python -m fewshot_vit_tpu.train.meta_tune_emd --config configs/sund_mini_visformer_1shot.yaml``
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import RunLogger, models
from ..core import rng as rng_mod
from .. import models as _models  # noqa: F401
from .. import heads as _heads  # noqa: F401
from ..data import datasets as _datasets  # noqa: F401
from ..checkpoint import CheckpointPolicy, has_checkpoint
from ..data.patches import grid_patches, sampling_patches
from ..data.sampler import EpisodeSampler
from ..heads.deepemd import sfc_refine
from ..ops.metric import normal_confidence_interval
from .loop import metrics_mean
from .optim import multistep_schedule, zero_nan_grads
from .runner import build_dataset, load_encoder_from_checkpoint, model_dtype, parse_args, save_dir_for
from .state import TrainState
from ..eval.episodic import sub_variables


def make_patch_fn(mode: str, patch_list, num_patch: int, patch_ratio: float,
                  out_size: int, train: bool) -> Callable:
    """(images u8 (B,H,W,3), rng) -> model input (B[,P],out,out,3) float 0..255."""
    if mode == "grid":
        from ..data.patches import draw_grid_ratios

        def fn(images, rng):
            if train:
                # U[1, 3) per image per pyramid level, as the reference's
                # get_pyramid draws (grid/mini_imagenet.py:104-110)
                ratio = draw_grid_ratios(rng, images.shape[0], len(patch_list))
            else:
                ratio = patch_ratio
            return grid_patches(images, tuple(patch_list), ratio, out_size)
    elif mode == "sampling":
        def fn(images, rng):
            return sampling_patches(rng, images, num_patch, out_size)
    elif mode == "fcn":
        def fn(images, rng):
            return images.astype(jnp.float32)
    else:
        raise ValueError(mode)
    return fn


def make_emd_episode_fn(
    head, way: int, shot: int, query: int, patch_fn: Callable,
    mean, std, sfc: bool, sfc_kw=None, train: bool = False,
    remat: bool = False,
):
    """(variables, images u8 (way*(shot+query), H, W, 3), rng) -> logits (way*query, way).

    Interleaved episode layout: index t*way + w -> (class w, item t).

    ``remat=True`` wraps the encoder in ``jax.checkpoint``: the backward pass
    recomputes encoder activations instead of storing them across the
    EMD/Sinkhorn phase (identical losses/grads, unit-tested). Measured limits
    (v5e 15.75G, grid mode, 80px, 5-way 1-shot 15-query — a grid episode
    encodes way*(shot+query)*13 = 1,040 patch images): remat alone does NOT
    fit a vmapped bs>1 task batch on one chip (bs=4 fp32 wants 40.16G, bf16
    27.99G; even bs=2 wants ~17-19G — the rematted backward still live-holds
    ~0.8G fusion temps per encoder block across the batch). Single-chip
    memory relief is ``grad_accum: true``; multi-chip is ``mesh:`` episode
    parallelism, where remat shrinks the PER-CHIP episode so bigger models /
    resolutions fit (docs/PERF.md table)."""
    sfc_kw = dict(sfc_kw or {})

    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)

    from ..models.common import frozen_bn

    def encode(variables, x, key):
        # BN runs on frozen running stats during EMD tuning even in train
        # mode: per-episode batch stats under vmap would diverge per episode
        # (the reference's DataParallel BN had per-replica drift instead —
        # see SURVEY.md §7 "BatchNorm under data parallelism"). With
        # train=True, dropout/droppath stay stochastic like the reference's
        # model.train() (meta_tuning_sun_d/train_meta.py:145).
        rngs = ({"droppath": key, "dropout": jax.random.fold_in(key, 1)}
                if train else None)
        with frozen_bn():
            return head.apply(variables, x, train, rngs=rngs,
                              method=head.encode_nodes)

    if remat:
        encode = jax.checkpoint(encode)

    def fn(variables, images_u8, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        x = patch_fn(images_u8, k1)  # float [0, 255]
        x = (x / 255.0 - mean_a) / std_a
        nodes = encode(variables, x, k3)
        k = way * shot
        shot_nodes = nodes[:k].reshape(shot, way, *nodes.shape[1:])
        proto = shot_nodes.mean(axis=0)  # (way, N, C)
        query_nodes = nodes[k:]
        if sfc and shot > 1:
            support = nodes[:k]  # interleaved, labels tile(arange(way), shot)
            proto = sfc_refine(proto, support, way, shot, k2, **sfc_kw)
        return head.apply(variables, proto, query_nodes, method=head.meta)

    return fn


def validate_episode_mesh(mesh_shape, grad_accum, ep_per_batch):
    """The one validator for `mesh:` episode parallelism, shared by the CLI
    (before it builds the mesh) and ``make_emd_epoch_fn`` (the library entry)
    so the two paths cannot drift."""
    if grad_accum:
        raise ValueError(
            "mesh episode parallelism shards the vmapped task batch; it "
            "is incompatible with grad_accum=True (sequential episodes) — "
            "running the scan over a sharded mesh would reintroduce the "
            "replicated-grouped-conv image gather this path exists to "
            "prevent. Drop grad_accum — the mesh already bounds per-chip "
            "activation memory to one episode.")
    if "data" not in mesh_shape:
        raise ValueError(
            f"mesh {mesh_shape} has no 'data' axis — SUN-D episode "
            "parallelism shards the task batch over a data axis "
            "(e.g. mesh: {data: 8}). Tensor-parallel-only meshes belong to "
            "the pretrain/SUN phases.")
    if ep_per_batch % mesh_shape["data"]:
        raise ValueError(
            f"bs={ep_per_batch} must divide evenly over the mesh data "
            f"axis ({mesh_shape['data']})")


def make_emd_epoch_fn(episode_fn, tx, labels, ep_per_batch, grad_accum=False,
                      mesh=None):
    """jit: (state, images u8, idx (S, E, way*(shot+query)) interleaved, rng)
    -> (state, metrics).

    Task batching (the reference accumulates loss/bs over bs iterations and
    steps every bs, ``train_meta.py:166-177``). ``grad_accum=False`` vmaps the
    bs episodes concurrently (fastest); ``grad_accum=True`` scans them
    sequentially with summed gradients — identical math INCLUDING the
    per-episode ``detect_grad_nan`` accumulated-buffer rule (both modes keep
    exactly the post-last-NaN suffix of episode gradients per tensor;
    ``tests/test_deepemd.py::TestTaskBatching``), activation memory of ONE
    episode. A grid episode is way*(shot+query)*13 patch images, so vmapped
    bs>1 can exceed HBM at full query counts.

    ``mesh``: pass the episode-parallel mesh (the one the caller shards ``idx``
    over) and the vmapped path runs under ``jax.shard_map`` on its ``data``
    axis: each chip takes its contiguous episode block, computes per-episode
    grads locally, all-gathers only the (n_tensors, bs) NaN-flag bitmap, and
    psums the masked episode sums. Relying on GSPMD propagation instead does
    the wrong thing here: vmap-of-grad lowers per-episode weight grads to
    GROUPED convolutions (episodes -> feature groups), which the partitioner
    replicates — all-gathering every chip's episode images (caught by
    ``tests/test_hlo_collectives.py``).

    NaN-rule caveat shared by both vmapped variants: they reproduce the
    reference recurrence assuming the accumulated buffer first goes NaN at an
    episode whose OWN grad has NaN. A ±inf cancellation ACROSS episodes
    (finite per-episode grads, NaN only in their running sum) is sequential-
    order-dependent and cannot be vectorized; ``grad_accum=True`` is the
    bit-exact-reference mode for that pathology.
    """
    if mesh is not None:
        validate_episode_mesh(dict(mesh.shape), grad_accum, ep_per_batch)

    def epoch_fn_inner(state, images, idx, rng):
        def body(state, scan_in):
            idx_b, i = scan_in
            k = jax.random.fold_in(rng, i)
            # per-episode streams: fold_in(k, e) exactly as before, but carried
            # as data so a sharded episode axis (idx_b on the mesh's `data`
            # axis) propagates through the vmap — XLA then scatters episodes
            # across chips and psums the grads, the reference's DataParallel
            # pattern (meta_tuning_sun_d/train_meta.py:159).
            ep_keys = jax.vmap(lambda e: jax.random.fold_in(k, e))(
                jnp.arange(ep_per_batch))

            def ep_loss(params, idx_e, key_e):
                variables = {"params": params, "batch_stats": state.batch_stats}
                logits = episode_fn(variables, images[idx_e], key_e)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), labels
                ).mean(), logits

            if grad_accum:
                from .optim import zero_nan_tensor

                def one(carry, scan_e):
                    idx_e, key_e = scan_e
                    (loss_e, logits_e), grads_e = jax.value_and_grad(
                        ep_loss, has_aux=True)(state.params, idx_e, key_e)
                    loss_a, acc_a, grads_a = carry
                    acc_e = jnp.mean(
                        (jnp.argmax(logits_e, -1) == labels).astype(jnp.float32))
                    # detect_grad_nan runs after EVERY accumulation episode in
                    # the reference (train_meta.py:174) and zeroes the
                    # ACCUMULATED .grad buffer of any param whose sum contains
                    # NaN — wiping prior episodes' contributions to that
                    # tensor too. Same rule here: accumulate, then reset the
                    # accumulator tensor if it went NaN.
                    grads_a = jax.tree_util.tree_map(
                        lambda a, g: zero_nan_tensor(a + g), grads_a, grads_e)
                    return (loss_a + loss_e, acc_a + acc_e, grads_a), None

                zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
                (loss, acc, grads), _ = jax.lax.scan(
                    one, (jnp.float32(0), jnp.float32(0), zeros),
                    (idx_b, ep_keys))
                inv = 1.0 / ep_per_batch
                loss, acc = loss * inv, acc * inv
                grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            else:
                def ep_grad(idx_e, key_e, params=None):
                    (loss_e, logits_e), g_e = jax.value_and_grad(
                        ep_loss, has_aux=True)(
                            state.params if params is None else params,
                            idx_e, key_e)
                    acc_e = jnp.mean(
                        (jnp.argmax(logits_e, -1) == labels).astype(jnp.float32))
                    return loss_e, acc_e, g_e

                # The reference's per-episode detect_grad_nan on the
                # ACCUMULATED buffer (train_meta.py:174) in closed form: the
                # accumulator is always finite entering episode e (it was
                # zeroed if NaN), so it gets reset exactly at the episodes
                # whose OWN grad tensor contains NaN — the final buffer is
                # the sum of the suffix after the LAST such episode. That
                # order-dependent recurrence therefore vectorizes as a
                # reversed-cumsum mask over per-episode NaN flags, keeping
                # the update identical to grad_accum=True (tested).
                def suffix_keep(nan_flags):
                    # (..., bs) bool -> True where no NaN at/after that episode
                    return jnp.cumsum(
                        nan_flags[..., ::-1].astype(jnp.int32), axis=-1
                    )[..., ::-1] == 0

                if mesh is None:
                    losses, accs, grads_all = jax.vmap(ep_grad)(idx_b, ep_keys)
                    loss, acc = losses.mean(), accs.mean()

                    def masked_mean(g):  # (bs, *shape)
                        nan_e = jnp.any(
                            jnp.isnan(g.reshape(ep_per_batch, -1)), axis=1)
                        k = suffix_keep(nan_e).reshape(
                            (ep_per_batch,) + (1,) * (g.ndim - 1))
                        # where, not multiply: a wholesale-dropped episode may
                        # carry inf entries, and inf * 0 would mint new NaNs
                        return jnp.sum(jnp.where(k, g, 0), axis=0) / ep_per_batch

                    grads = jax.tree_util.tree_map(masked_mean, grads_all)
                else:
                    from jax.sharding import PartitionSpec as P

                    bs_loc = ep_per_batch // mesh.shape["data"]

                    def local_grads(idx_loc, keys_loc):
                        # manual over `data`: this chip's contiguous episode
                        # block, grads stay chip-local end to end.
                        # pcast-to-varying first: params captured from outside
                        # the manual region are device-invariant over `data`,
                        # and AD keeps cotangents of invariant values invariant
                        # by auto-psumming them — grad would silently come
                        # back as the GLOBAL episode sum on every chip,
                        # destroying the per-episode NaN structure (and
                        # double-counting through the explicit psum below).
                        p_loc = jax.tree_util.tree_map(
                            lambda t: jax.lax.pcast(t, "data", to="varying"),
                            state.params)
                        losses, accs, g = jax.vmap(
                            lambda i, kk: ep_grad(i, kk, params=p_loc)
                        )(idx_loc, keys_loc)
                        leaves, treedef = jax.tree_util.tree_flatten(g)
                        flags = jnp.stack([
                            jnp.any(jnp.isnan(t.reshape(bs_loc, -1)), axis=1)
                            for t in leaves])  # (n_tensors, bs_loc)
                        # the only gathered buffer: (n_tensors, bs) of bools
                        flags = jax.lax.all_gather(
                            flags, "data", axis=1, tiled=True)
                        keep = suffix_keep(flags)  # (n_tensors, bs) global
                        i0 = jax.lax.axis_index("data") * bs_loc
                        keep_loc = jax.lax.dynamic_slice_in_dim(
                            keep, i0, bs_loc, 1)
                        masked = [
                            jnp.sum(jnp.where(
                                keep_loc[i].reshape(
                                    (bs_loc,) + (1,) * (t.ndim - 1)), t, 0),
                                axis=0)
                            for i, t in enumerate(leaves)]
                        gsum = jax.tree_util.tree_unflatten(treedef, masked)
                        grads = jax.tree_util.tree_map(
                            lambda t: jax.lax.psum(t, "data") / ep_per_batch,
                            gsum)
                        return (jax.lax.pmean(losses.mean(), "data"),
                                jax.lax.pmean(accs.mean(), "data"), grads)

                    loss, acc, grads = jax.shard_map(
                        local_grads, mesh=mesh,
                        in_specs=(P("data"), P("data")),
                        out_specs=(P(), P(), P()),
                        axis_names=frozenset({"data"}),
                    )(idx_b, ep_keys)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 opt_state=opt_state), {"loss": loss, "acc": acc}

        state, ms = jax.lax.scan(body, state, (idx, jnp.arange(idx.shape[0])))
        return state, ms

    return jax.jit(epoch_fn_inner, donate_argnums=(0,))


def build_sund_optimizer(cfg, train_batches: int) -> optax.GradientTransformation:
    """The reference's SUN-D recipe (``meta_tuning_sun_d/train_meta.py:115-116``):
    nesterov SGD(momentum .9, wd 5e-4 on EVERY param) + StepLR(step_size,
    gamma) stepped once per epoch — expressed as milestones at each
    step_size multiple. ``detect_grad_nan`` (``Models/utils.py:115-118``)
    becomes the in-jit NaN-zeroing transform. Trajectory-anchored against the
    real torch loop in tests/test_trajectory_parity.py."""
    epochs = int(cfg.get("max_epoch", 100))
    sched = multistep_schedule(
        float(cfg.get("lr", 5e-4)), train_batches,
        milestones=list(range(int(cfg.get("step_size", 10)), epochs + 1,
                              int(cfg.get("step_size", 10)))),
        gamma=float(cfg.get("gamma", 0.5)),
    )
    return optax.chain(
        zero_nan_grads(),  # reference detect_grad_nan
        optax.add_decayed_weights(float(cfg.get("weight_decay", 5e-4))),
        optax.sgd(sched, momentum=0.9, nesterov=True),
    )


def main(cfg, args) -> TrainState:
    logger = RunLogger(save_dir_for(cfg, args, f"sund_{cfg.get('train_dataset')}"))
    logger.log(f"config: {cfg.to_dict()}")

    train_ds = build_dataset(cfg, "train_dataset")
    val_ds = build_dataset(cfg, "val_dataset") or train_ds
    from .runner import visualize_datasets
    visualize_datasets(logger, cfg, train_dataset=train_ds, val_dataset=val_ds)

    way = int(cfg.get("way", 5))
    shot = int(cfg.get("shot", 1))
    query = int(cfg.get("query", 15))
    ep_per_batch = int(cfg.get("bs", 1))  # reference task-batch accumulation
    mode = cfg.get("deepemd", "grid")
    img = int(cfg.get("image_size", 80))

    head = models.make(
        "deepemd",
        encoder=cfg.get("model_args.encoder", "visformer_micro_80"),
        encoder_args=dict(cfg.get("model_args.encoder_args", {}) or {}),
        temperature=float(cfg.get("temperature", 12.5)),
        solver_reg=float(cfg.get("solver_reg", 0.05)),
        solver_iters=int(cfg.get("solver_iters", 100)),
        solver=cfg.get("solver", "sinkhorn_detached"),
        feature_pyramid=cfg.get("feature_pyramid"),
        dtype=model_dtype(cfg),
    )
    with jax.default_device(jax.devices("cpu")[0]):
        variables = head.init(jax.random.key(args.seed), jnp.zeros((1, img, img, 3)))
    variables = jax.device_put(variables)
    load_enc = cfg.get("load_encoder")
    if load_enc:
        enc_vars = load_encoder_from_checkpoint(
            load_enc, sub_variables(variables, "encoder"),
            cfg.get("model_args.encoder", "visformer_micro_80"))
        variables = dict(variables)
        for col, tree in enc_vars.items():
            variables.setdefault(col, {})["encoder"] = tree
    else:
        logger.log("WARNING: no 'load_encoder' — encoder randomly initialized")

    epochs = int(cfg.get("max_epoch", 100))
    train_batches = int(cfg.get("train_batches", 50))
    tx = build_sund_optimizer(cfg, train_batches)
    state = TrainState.create(variables, tx)

    mesh_cfg = cfg.get("mesh")
    idx_shard = None
    data_shard = None
    if mesh_cfg:
        # Episode parallelism over the mesh: the task batch's episode axis
        # shards on `data` (each chip holds ONE episode's activations — the
        # vmapped bs>1 path fits in HBM this way), params/batch_stats
        # replicate, XLA psums the episode-mean gradients. This is the
        # reference's DataParallel scatter-episodes pattern
        # (meta_tuning_sun_d/train_meta.py:82,159) as PartitionSpecs.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import make_mesh, param_shardings, replicated

        shape = {k: int(v) for k, v in dict(mesh_cfg).items()}
        validate_episode_mesh(shape, bool(cfg.get("grad_accum", False)),
                              ep_per_batch)
        mesh = make_mesh(shape)
        logger.log(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
        pshard = param_shardings(mesh, state.params)
        params = jax.tree_util.tree_map(jax.device_put, state.params, pshard)
        new_vars = {"params": params}
        if state.batch_stats:
            new_vars["batch_stats"] = jax.device_put(
                state.batch_stats, replicated(mesh))
        state = TrainState.create(new_vars, tx)
        data_shard = replicated(mesh)
        idx_shard = NamedSharding(mesh, P(None, "data", None))  # (S, E, L)

    patch_train = make_patch_fn(mode, cfg.get("patch_list", [2, 3]),
                                int(cfg.get("num_patch", 9)),
                                float(cfg.get("patch_ratio", 2.0)), img, True)
    mean, std = train_ds.mean, train_ds.std
    sfc_kw = {"steps": int(cfg.get("sfc_update_step", 100)),
              "lr": float(cfg.get("sfc_lr", 0.1)),
              "batch_size": int(cfg.get("sfc_bs", 4))}
    episode_fn = make_emd_episode_fn(
        head, way, shot, query, patch_train, mean, std,
        sfc=shot > 1, sfc_kw=sfc_kw,
        train=True, remat=bool(cfg.get("remat", False)),
    )
    labels = jnp.tile(jnp.arange(way), query)
    images_dev = jax.device_put(train_ds.images, data_shard)
    epoch_fn = make_emd_epoch_fn(
        episode_fn, tx, labels, ep_per_batch,
        grad_accum=bool(cfg.get("grad_accum", False)),
        mesh=mesh if mesh_cfg else None,
    )

    # eval episode program (interleaved, fixed patch ratio, SFC in eval as ref)
    patch_eval = make_patch_fn(mode, cfg.get("patch_list", [2, 3]),
                               int(cfg.get("num_patch", 9)),
                               float(cfg.get("patch_ratio", 2.0)), img, False)
    # don't double the image HBM footprint when validating on the train split
    val_images = (images_dev if val_ds is train_ds
                  else jax.device_put(val_ds.images, data_shard))

    from ..eval.emd_eval import (
        group_episode_indices,
        make_emd_cached_episode_fn,
        make_emd_eval_run_fn,
        make_emd_node_cache_fn,
    )

    if mode != "sampling":
        # grid/fcn eval patches are deterministic per image -> encode each
        # image's nodes once per eval call and gather per episode: identical
        # logits (see eval/emd_eval.py), encoder work O(dataset) instead of
        # O(episodes x 80 images). Validation dominates a SUN-D epoch, so
        # this roughly halves epoch wall and makes the 2000-episode inline
        # final test ~encoder-free.
        _encode_all = make_emd_node_cache_fn(head, patch_eval, mean, std)
        _run_eval = make_emd_eval_run_fn(
            make_emd_cached_episode_fn(head, way, shot, sfc=shot > 1,
                                       sfc_kw=sfc_kw), labels)
        _eval_epb = 16

        def val_fn(variables, images, idx, rng):
            return _run_eval(variables, _encode_all(variables, images), idx, rng)
    else:
        _run_eval = make_emd_eval_run_fn(
            make_emd_episode_fn(head, way, shot, query, patch_eval, mean, std,
                                sfc=shot > 1, sfc_kw=sfc_kw), labels)
        _eval_epb = 1

        def val_fn(variables, images, idx, rng):
            return _run_eval(variables, images, idx, rng)

    def interleaved(idx_flat: np.ndarray, n_ep: int) -> np.ndarray:
        # sampler emits (E, way, n_per) class-major; SUN-D order is item-major
        return idx_flat.reshape(n_ep, way, shot + query).transpose(0, 2, 1).reshape(n_ep, -1)

    train_sampler = EpisodeSampler(train_ds.labels, train_batches, way, shot + query, ep_per_batch)
    val_episodes = int(cfg.get("val_episode", 200))
    val_sampler = EpisodeSampler(val_ds.labels, val_episodes, way, shot + query, 1)
    val_idx = group_episode_indices(interleaved(
        np.stack(list(val_sampler.epoch(rng_mod.np_rng(0)))).reshape(val_episodes, -1),
        val_episodes,
    ), _eval_epb)

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

    best_va, best_epoch = -float("inf"), 0
    for epoch in range(start_epoch, epochs + 1):
        t0 = time.time()
        ep_rng = rng_mod.np_rng(args.seed, epoch)
        idx = np.stack([
            interleaved(train_sampler.batch(ep_rng), ep_per_batch)
            for _ in range(train_batches)
        ]).astype(np.int32)
        idx = jnp.asarray(idx)
        if idx_shard is not None:
            idx = jax.device_put(idx, idx_shard)
        state, ms = epoch_fn(state, images_dev, idx, rng_mod.epoch_key(root, epoch))
        m = metrics_mean(ms)

        accs = np.asarray(val_fn(state.variables, val_images, jnp.asarray(val_idx),
                                 rng_mod.epoch_key(root, 0)))[:val_episodes]
        va, ci = normal_confidence_interval(accs)
        if va > best_va:
            best_va, best_epoch = va, epoch
        logger.log(
            f"epoch {epoch} train loss={m['loss']:.4f} acc={m['acc']:.4f} | "
            f"val {way}w{shot}s acc={va:.4f} +- {ci:.4f} ({time.time() - t0:.1f}s)"
        )
        logger.metrics(epoch, **m, val_acc=va)
        policy.on_epoch(epoch, state.variables,
                        {"model": "deepemd", "deepemd": mode,
                         "encoder": cfg.get("model_args.encoder")}, va=va)
        save_variables(resume_dir, state, {"epoch": epoch})

    # inline final test phase (reference train_meta.py:237-277): reload the
    # best-val checkpoint, run the full test protocol, append results.txt
    test_episodes = int(cfg.get("test_episode", 2000 if shot == 1 else 600))
    best_dir = os.path.join(logger.save_dir, "max-va")
    if test_episodes and has_checkpoint(best_dir):
        best_vars, best_meta = load_variables(best_dir, target=state.variables)
        test_ds = build_dataset(cfg, "test_dataset") or val_ds
        test_sampler = EpisodeSampler(test_ds.labels, test_episodes, way, shot + query, 1)
        test_idx = group_episode_indices(interleaved(
            np.stack(list(test_sampler.epoch(rng_mod.np_rng(1)))).reshape(test_episodes, -1),
            test_episodes,
        ), _eval_epb)
        # val images are already device-resident when no test_dataset is
        # configured — don't double the eval image HBM footprint
        test_images = (val_images if test_ds is val_ds
                       else jax.device_put(test_ds.images, data_shard))
        accs = np.asarray(val_fn(best_vars, test_images, jnp.asarray(test_idx),
                                 rng_mod.epoch_key(root, 1)))[:test_episodes]
        m_t, ci_t = normal_confidence_interval(accs)
        # max-va meta is authoritative (it survives resume; local best_va/
        # best_epoch only cover this process's epochs)
        best_va_saved = best_meta.get("val_acc", best_va)
        best_epoch_saved = best_meta.get("epoch", best_epoch)
        lines = [
            f"Val Best Epoch {best_epoch_saved}, best val Acc {float(best_va_saved):.4f}",
            f"Test Acc {m_t * 100:.4f} + {ci_t * 100:.4f}",
        ]
        logger.log(f"final test {way}w{shot}s ({test_episodes} episodes): "
                   f"acc={m_t * 100:.2f} +- {ci_t * 100:.2f} (%)")
        with open(os.path.join(logger.save_dir, "results.txt"), "a") as f:
            f.write("\n".join(lines) + "\n")
    return state


if __name__ == "__main__":
    cfg, args = parse_args("phase-3b SUN-D DeepEMD meta-tuning")
    main(cfg, args)

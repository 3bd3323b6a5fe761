"""Released-checkpoint evaluation CLI (phase: test).

TPU re-design of ``test_phase/test_few_shot.py:36-117``: N-way K-shot episodic
accuracy with 95% CI over ``--test-epochs`` x 2000 episodes, plus the ``--sauc``
mode (2-way episodes scored as ROC-AUC of cosine similarity to the first
class's prototype, ``test_few_shot.py:95-112``).

Run:
  python -m fewshot_vit_tpu.eval.run --config configs/test_mini_1shot.yaml --shot 1
  python -m fewshot_vit_tpu.eval.run --config ... --sauc
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..core import load_config, models
from ..core import rng as rng_mod
from .. import models as _models  # noqa: F401
from .. import heads as _heads  # noqa: F401
from ..data import datasets as _datasets  # noqa: F401
from ..core.registry import datasets as dataset_registry
from ..data.sampler import EpisodeSampler
from ..ops.metric import l2_normalize, mean_confidence_interval, roc_auc
from ..data.transforms import normalize
from ..train.runner import resolve_checkpoint_variables
from .episodic import evaluate, evaluate_cached, sub_variables


def load_model_for_eval(cfg, seed: int = rng_mod.DEFAULT_SEED, dtype=jnp.float32):
    """Build a meta-baseline head and load weights per config: 'load' (full
    head checkpoint, orbax dir or reference .pth) or 'load_encoder'."""
    enc_name = cfg.get("encoder", cfg.get("model_args.encoder", "visformer_micro_80"))
    head = models.make(
        "meta-baseline",
        encoder=enc_name,
        encoder_args=dict(cfg.get("model_args.encoder_args", {}) or {}),
        dtype=dtype,
    )
    img = int(cfg.get("image_size", 80))
    xs0 = jnp.zeros((1, 2, 1, img, img, 3), jnp.float32)
    xq0 = jnp.zeros((1, 2, img, img, 3), jnp.float32)
    variables = jax.tree_util.tree_map(
        np.asarray, head.init(jax.random.key(seed), xs0, xq0)
    )
    return head, resolve_checkpoint_variables(cfg, head, variables, enc_name)


def sauc_eval(head, variables, dataset, n_episodes, shot, query=15,
              ep_per_batch=8, seed=rng_mod.DEFAULT_SEED, images_dev=None):
    """2-way ROC-AUC mode: scores = cosine(query, class-0 prototype).

    One scan program over episode batches (single host fetch), matching the
    device-resident design of ``eval.episodic``."""
    import math

    n_batches = math.ceil(n_episodes / ep_per_batch)
    sampler = EpisodeSampler(dataset.labels, n_batches, 2, shot + query, ep_per_batch)
    rng = rng_mod.np_rng(seed)
    idx_all = np.stack(list(sampler.epoch(rng))).astype(np.int32)
    enc_vars = sub_variables(variables, "encoder")
    mean, std = dataset.mean, dataset.std
    if images_dev is None:
        images_dev = jax.device_put(dataset.images)

    @jax.jit
    def scores_fn(enc_vars, images, idx_all):
        def body(carry, idx):
            x = normalize(images[idx], mean, std)
            _, pooled = head.encoder.apply(enc_vars, x, train=False)
            f = pooled.reshape(ep_per_batch, 2, shot + query, -1)
            proto = l2_normalize(f[:, 0, :shot].mean(axis=1))  # (E, C)
            q = l2_normalize(f[:, :, shot:].reshape(ep_per_batch, 2 * query, -1))
            return carry, jnp.einsum("eqc,ec->eq", q, proto)

        _, s = jax.lax.scan(body, None, idx_all)
        return s.reshape(-1, 2 * query)

    scores = np.asarray(scores_fn(enc_vars, images_dev, jnp.asarray(idx_all)))
    y = np.array([1] * query + [0] * query)
    aucs = [roc_auc(s, y) for s in scores[:n_episodes]]
    m, h = mean_confidence_interval(aucs)
    return m, h, np.asarray(aucs)


def main():
    p = argparse.ArgumentParser(description="few-shot eval")
    p.add_argument("--config", required=True)
    p.add_argument("--shot", type=int, default=1)
    p.add_argument("--test-epochs", type=int, default=1)
    p.add_argument("--sauc", action="store_true")
    p.add_argument("--cached", action="store_true",
                   help="cached-features fast path (identical accuracy)")
    p.add_argument("--episodes", type=int, default=2000)
    p.add_argument("--fold-bn", action="store_true",
                   help="fold frozen-stats BNs into adjacent conv/dense "
                        "weights before eval (exact transform, +~2%% "
                        "throughput — models/fold.py; supported encoder "
                        "families only)")
    p.add_argument("--int8", action="store_true",
                   help="EXPERIMENTAL: int8 encoder weights + static "
                        "activation scales calibrated on a random sample of "
                        "the eval set (implies --fold-bn; models/quant.py — "
                        "measured SLOWER than bf16 end-to-end on v5e, see "
                        "docs/KERNELS.md; accuracy gated on synthetic "
                        "protocol only)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 encoder compute (+~17%% throughput; mean "
                        "accuracy measured identical, per-episode accs may flip)")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard episode batches over an N-chip data mesh")
    args = p.parse_args()
    if args.mesh_data and (args.cached or args.sauc):
        p.error("--mesh-data is only supported in the default eval mode "
                "(not with --cached/--sauc)")
    rng_mod.enable_compilation_cache()
    cfg = load_config(args.config)

    ds = dataset_registry.make(cfg.get("dataset", "mini-imagenet"),
                               **dict(cfg.get("dataset_args", {}) or {}))
    head, variables = load_model_for_eval(
        cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32
    )
    if args.int8:
        from ..models.quant import quantize_encoder_in_head

        with jax.default_device(jax.devices("cpu")[0]):
            # random sample: dataset images are class-contiguous, so a
            # prefix slice would calibrate the scales on ~one class
            idx = rng_mod.np_rng(rng_mod.DEFAULT_SEED).choice(
                len(ds.images), size=min(256, len(ds.images)), replace=False)
            calib = normalize(jnp.asarray(ds.images[np.sort(idx)]),
                              ds.mean, ds.std)
            head, variables = quantize_encoder_in_head(
                head, jax.tree_util.tree_map(np.asarray, variables),
                calib_images=calib)
    elif args.fold_bn:
        from ..models.fold import fold_encoder_in_head

        head, variables = fold_encoder_in_head(
            head, jax.tree_util.tree_map(np.asarray, variables))
    mesh = None
    if args.mesh_data:
        from ..parallel import make_mesh

        mesh = make_mesh({"data": args.mesh_data})

    # one host->device upload, amortized across test epochs; cached mode
    # reuses the one-time feature encode the same way
    images_dev = jax.device_put(ds.images)
    feats = None
    if args.cached:
        from .episodic import encode_dataset

        feats = encode_dataset(head.encoder, sub_variables(variables, "encoder"),
                               ds, images_dev=images_dev)
        images_dev = None  # only feats are needed — release the uint8 HBM

    all_accs = []
    for epoch in range(1, args.test_epochs + 1):
        seed = rng_mod.DEFAULT_SEED + epoch - 1
        if args.sauc:
            acc, ci, accs = sauc_eval(head, variables, ds, args.episodes,
                                      args.shot, seed=seed, images_dev=images_dev)
        elif args.cached:
            # ep_per_batch matches the default path so both modes draw the
            # SAME episodes from the same seed — accuracies are comparable
            acc, ci, accs = evaluate_cached(
                head.encoder, sub_variables(variables, "encoder"), ds,
                n_episodes=args.episodes, shot=args.shot, ep_per_batch=8,
                seed=seed, feats=feats,
            )
        else:
            acc, ci, accs = evaluate(
                head, variables, ds, n_episodes=args.episodes, shot=args.shot,
                ep_per_batch=8, seed=seed, mesh=mesh, images_dev=images_dev,
            )
        all_accs.extend(accs.tolist())
        m, h = mean_confidence_interval(all_accs)
        print(f"test epoch {epoch}: acc={m * 100:.2f} +- {h * 100:.2f} (%)")


if __name__ == "__main__":
    main()

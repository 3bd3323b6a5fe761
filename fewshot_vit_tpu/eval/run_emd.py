"""SUN-D standalone evaluation CLI.

TPU re-design of ``meta_tuning_sun_d/eval.py``: N-way K-shot DeepEMD episodic
accuracy with 95% CI (default 2000 1-shot / 600 5-shot episodes,
``meta_tuning_sun_d/README.md:36-39``), SFC for shot>1, grid/sampling/fcn
patch modes. The whole eval is one scan program on device.

``--cached``: for the deterministic eval pipelines (grid with fixed
``patch_ratio``, fcn) the protocol recomputes the SAME node features for an
image every time it appears in an episode; caching encodes each image's
nodes once and gathers them per episode — identical logits (frozen BN eval
forward), encoder work drops from O(episodes x 80 images) to O(dataset).
``sampling`` draws random crops per episode, so it is not cacheable.

Run: ``python -m fewshot_vit_tpu.eval.run_emd --config configs/sund_mini_visformer_1shot.yaml --shot 1``
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
from ..data.sampler import EpisodeSampler
from ..ops.metric import normal_confidence_interval
from ..train.runner import build_dataset, resolve_checkpoint_variables


# shared eval programs (also used by train.meta_tune_emd's inline val/test)
from .emd_eval import (  # noqa: F401  (re-exported; tests/tools import here)
    group_episode_indices,
    make_emd_cached_episode_fn,
    make_emd_eval_run_fn,
    make_emd_node_cache_fn,
)


def main():
    p = argparse.ArgumentParser(description="SUN-D DeepEMD eval")
    p.add_argument("--config", required=True)
    p.add_argument("--shot", type=int, default=None)
    p.add_argument("--episodes", type=int, default=None)
    p.add_argument("--ep-per-batch", type=int, default=4)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 encoder compute (EMD math stays fp32)")
    p.add_argument("--cached", action="store_true",
                   help="encode each image's nodes once (grid/fcn only; "
                        "identical logits, ~encoder-free episodes)")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard each episode batch over an N-chip data mesh "
                        "(episode parallelism over ICI; --ep-per-batch must "
                        "be a multiple of N)")
    args = p.parse_args()
    if args.mesh_data and args.ep_per_batch % args.mesh_data:
        p.error("--ep-per-batch must be a multiple of --mesh-data")
    rng_mod.enable_compilation_cache()
    cfg = load_config(args.config)

    from ..train.meta_tune_emd import make_emd_episode_fn, make_patch_fn

    ds = build_dataset(cfg, "test_dataset") or build_dataset(cfg, "val_dataset")
    way = int(cfg.get("way", 5))
    shot = args.shot if args.shot is not None else int(cfg.get("shot", 1))
    query = int(cfg.get("query", 15))
    n_episodes = args.episodes or (2000 if shot == 1 else 600)
    mode = cfg.get("deepemd", "grid")
    img = int(cfg.get("image_size", 80))

    if cfg.get("solver") == "exact" and jax.default_backend() != "cpu":
        print("WARNING: solver 'exact' runs the C++ simplex as a HOST "
              "callback — parity-grade CPU mode (JAX_PLATFORMS=cpu). Some "
              "device runtimes (e.g. the axon relay) reject host callbacks "
              "outright, and on real TPUs every EMD batch round-trips to "
              "the host; the production on-device solver is "
              "'sinkhorn_detached'.")
    head = models.make(
        "deepemd",
        encoder=cfg.get("model_args.encoder", "visformer_micro_80"),
        encoder_args=dict(cfg.get("model_args.encoder_args", {}) or {}),
        temperature=float(cfg.get("temperature", 12.5)),
        solver_reg=float(cfg.get("solver_reg", 0.05)),
        solver_iters=int(cfg.get("solver_iters", 100)),
        solver=cfg.get("solver", "sinkhorn_detached"),
        feature_pyramid=cfg.get("feature_pyramid"),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        variables = head.init(jax.random.key(rng_mod.DEFAULT_SEED),
                              jnp.zeros((1, img, img, 3)))
    variables = jax.device_put(variables)
    # `load:` reference SUN-D checkpoints ({'params': state_dict}, e.g. the
    # released max_acc.pth) go through the torch converter; `load_encoder:`
    # takes the encoder subtree only (orbax dir or reference .pth)
    variables = resolve_checkpoint_variables(
        cfg, head, variables,
        cfg.get("model_args.encoder", "visformer_micro_80"))

    patch_fn = make_patch_fn(mode, cfg.get("patch_list", [2, 3]),
                             int(cfg.get("num_patch", 9)),
                             float(cfg.get("patch_ratio", 2.0)), img, False)
    # standalone-eval default is 100 (meta_tuning_sun_d/eval.py:41), NOT the
    # trainer's 0.1 (train_meta.py:56) — the released checkpoints were
    # evaluated with sfc_lr=100
    sfc_kw = {"steps": int(cfg.get("sfc_update_step", 100)),
              "lr": float(cfg.get("sfc_lr", 100.0)),
              "batch_size": int(cfg.get("sfc_bs", 4))}
    labels = jnp.tile(jnp.arange(way), query)

    sampler = EpisodeSampler(ds.labels, n_episodes, way, shot + query, 1)
    rng = rng_mod.np_rng(rng_mod.DEFAULT_SEED)
    idx = np.stack(list(sampler.epoch(rng)))
    idx = (idx.reshape(n_episodes, way, shot + query)
           .transpose(0, 2, 1).reshape(n_episodes, -1).astype(np.int32))
    # group episodes into ep-per-batch vmapped chunks (pad by repeating the
    # last episode; padded accs are truncated below)
    idx = group_episode_indices(idx, max(1, args.ep_per_batch))
    images_dev = jax.device_put(ds.images)

    if args.cached:
        if mode == "sampling":
            raise SystemExit("--cached requires deterministic eval patches "
                             "(grid/fcn); 'sampling' re-crops per episode")
        encode_all = make_emd_node_cache_fn(head, patch_fn, ds.mean, ds.std)
        data_dev = encode_all(variables, images_dev)
        ep_fn = make_emd_cached_episode_fn(head, way, shot, sfc=shot > 1,
                                           sfc_kw=sfc_kw)
    else:
        data_dev = images_dev
        ep_fn = make_emd_episode_fn(head, way, shot, query, patch_fn,
                                    ds.mean, ds.std, sfc=shot > 1,
                                    sfc_kw=sfc_kw)
    run = make_emd_eval_run_fn(ep_fn, labels)
    idx_dev = jnp.asarray(idx)
    if args.mesh_data:
        # episode parallelism over ICI: variables + data replicated, the
        # in-batch episode axis sharded (same scheme as eval/run.py --mesh-data)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import make_mesh

        mesh = make_mesh({"data": args.mesh_data})
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
        data_dev = jax.device_put(data_dev, NamedSharding(mesh, P()))
        idx_dev = jax.device_put(idx_dev, NamedSharding(mesh, P(None, "data", None)))
    accs = np.asarray(run(variables, data_dev, idx_dev,
                          rng_mod.root_key(rng_mod.DEFAULT_SEED)))[:n_episodes]
    m, h = normal_confidence_interval(accs)
    print(f"{way}-way {shot}-shot ({mode}): acc={m * 100:.2f} +- {h * 100:.2f} (%)  [{n_episodes} episodes]")


if __name__ == "__main__":
    main()

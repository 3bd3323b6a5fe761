"""AOT model export for serving (``jax.export`` / StableHLO).

The reference has no deployment story: serving one of its models means
shipping the whole torch codebase plus a ``.pth`` and re-running
``test_phase/test_few_shot.py``-style Python per request. Here the eval
forward is exported ONCE as a self-contained StableHLO artifact — weights
baked in as constants, uint8 normalization included — which a serving
process deserializes and calls with zero model/framework code beyond jax
(and across jax releases, via StableHLO's forward-compatibility window).
Multi-platform export (``platforms=("cpu", "tpu")``) lets one artifact be
built on a CPU dev box and served on TPU chips unchanged.

Three artifact flavors:

* **episode scorer** — ``(x_shot, x_query) -> (E, Q, way) logits``: the full
  few-shot decision function (encoder + prototype head) at a fixed
  ``(way, shot, query)`` protocol, raw uint8 images in;
* **EMD episode scorer** (``--emd``) — the SUN-D DeepEMD decision function:
  interleaved episode images in, patch pipeline + encoder + SFC + Sinkhorn
  matching baked into one blob;
* **encoder** — ``images -> (B, C) pooled embeddings``: for feature stores
  and cached protocols (the one-time encode behind
  ``eval.episodic.evaluate_cached``).

CLI::

  python -m fewshot_vit_tpu.eval.export --config configs/test_mini_1shot.yaml \
      --out scorer.stablehlo --shot 1 [--encoder-only] [--platforms cpu,tpu]

Serving side (no fewshot_vit_tpu import needed)::

  from jax import export
  scorer = export.deserialize(bytearray(open("scorer.stablehlo", "rb").read()))
  logits = scorer.call(x_shot_u8, x_query_u8)
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export
from jax.sharding import AbstractMesh, NamedSharding, PartitionSpec

from ..data.transforms import MEAN, STD, normalize


def _data_sharding(data_shards: int, ndim: int):
    """Episode/batch-axis sharding over an N-way ``data`` mesh.

    Uses ``AbstractMesh`` so an N-chip serving artifact can be exported from
    a box with fewer (e.g. one) devices; the serving side provides a concrete
    N-device mesh through its input shardings."""
    mesh = AbstractMesh((data_shards,), ("data",))
    return NamedSharding(mesh, PartitionSpec("data", *([None] * (ndim - 1))))


def export_episode_scorer(
    head,
    variables,
    *,
    way: int,
    shot: int,
    query: int,
    image_size: int,
    ep_per_batch: int = 1,
    mean: Tuple[float, ...] = MEAN,
    std: Tuple[float, ...] = STD,
    platforms: Optional[Sequence[str]] = None,
    data_shards: int = 0,
) -> jax_export.Exported:
    """Export the episodic decision function with weights baked in.

    The exported call takes raw uint8 images —
    ``x_shot (E, way, shot, H, W, 3)``, ``x_query (E, way*query, H, W, 3)`` —
    normalizes them with the dataset stats captured at export time, and
    returns ``(E, way*query, way)`` float32 cosine logits, exactly the
    eval-mode forward ``eval.episodic.evaluate`` runs per episode batch.

    ``data_shards=N`` builds a multi-chip artifact: the episode axis is
    sharded over an N-way ``data`` mesh (weights replicate as constants, XLA
    inserts no cross-chip collectives — episodes are embarrassingly
    parallel), so one blob serves an N-chip slice. Requires
    ``ep_per_batch % N == 0``; the serving side feeds inputs placed on its
    own N-device mesh.
    """
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    def fn(x_shot, x_query):
        xs = normalize(x_shot, mean, std)
        xq = normalize(x_query, mean, std)
        return head.apply(variables, xs, xq, train=False)

    xs_shape = (ep_per_batch, way, shot, image_size, image_size, 3)
    xq_shape = (ep_per_batch, way * query, image_size, image_size, 3)
    sharding = None
    if data_shards:
        if ep_per_batch % data_shards:
            raise ValueError(
                f"ep_per_batch={ep_per_batch} must divide over "
                f"data_shards={data_shards}")
        sharding = _data_sharding(data_shards, len(xs_shape))
    xs_spec = jax.ShapeDtypeStruct(xs_shape, jnp.uint8, sharding=sharding)
    xq_spec = jax.ShapeDtypeStruct(
        xq_shape, jnp.uint8,
        sharding=_data_sharding(data_shards, len(xq_shape)) if data_shards else None,
    )
    return jax_export.export(jax.jit(fn), platforms=_norm_platforms(platforms))(
        xs_spec, xq_spec
    )


def export_encoder(
    encoder,
    enc_variables,
    *,
    image_size: int,
    batch: int = 128,
    mean: Tuple[float, ...] = MEAN,
    std: Tuple[float, ...] = STD,
    platforms: Optional[Sequence[str]] = None,
    data_shards: int = 0,
) -> jax_export.Exported:
    """Export ``uint8 images (B, H, W, 3) -> (B, C) pooled embeddings``.

    ``data_shards=N`` shards the batch axis over an N-way ``data`` mesh
    (multi-chip artifact; ``batch % N == 0``)."""
    enc_variables = jax.tree_util.tree_map(jnp.asarray, enc_variables)

    def fn(images):
        _, pooled = encoder.apply(enc_variables, normalize(images, mean, std),
                                  train=False)
        return pooled

    if data_shards and batch % data_shards:
        raise ValueError(f"batch={batch} must divide over data_shards={data_shards}")
    spec = jax.ShapeDtypeStruct(
        (batch, image_size, image_size, 3), jnp.uint8,
        sharding=_data_sharding(data_shards, 4) if data_shards else None,
    )
    return jax_export.export(jax.jit(fn), platforms=_norm_platforms(platforms))(spec)


def export_emd_episode_scorer(
    head,
    variables,
    *,
    way: int,
    shot: int,
    query: int,
    image_size: int,
    patch_fn,
    sfc_kw=None,
    ep_per_batch: int = 1,
    mean: Tuple[float, ...] = MEAN,
    std: Tuple[float, ...] = STD,
    platforms: Optional[Sequence[str]] = None,
    data_shards: int = 0,
    seed: int = 0,
) -> jax_export.Exported:
    """Export the SUN-D DeepEMD episodic decision function (weights baked in).

    The exported call takes ONE uint8 tensor per episode batch —
    ``images (E, way*(shot+query), H, W, 3)`` in the protocol's interleaved
    layout (index ``t*way + w`` -> class ``w``, item ``t``; items
    ``0..shot-1`` are supports) — and returns ``(E, way*query, way)`` float32
    EMD logits: patch pipeline, encoder, SFC prototype refinement (5-shot),
    and the Sinkhorn optimal-transport matching all compile into the
    artifact, exactly the eval-mode forward ``eval.run_emd`` runs per
    episode (reference protocol: ``meta_tuning_sun_d/eval.py:36-104``).

    The episode RNG is baked from ``seed`` for reproducible serving: grid/fcn
    eval patches are deterministic anyway; under ``sampling`` mode the crop
    pattern (and the 5-shot SFC minibatch order) is therefore FIXED across
    calls — export one artifact per seed if crop diversity matters.

    ``data_shards=N`` shards the episode axis over an N-way ``data`` mesh
    (``ep_per_batch % N == 0``), as in ``export_episode_scorer``.
    """
    from ..train.meta_tune_emd import make_emd_episode_fn

    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    ep_fn = make_emd_episode_fn(head, way, shot, query, patch_fn, mean, std,
                                sfc=shot > 1, sfc_kw=sfc_kw)
    key = jax.random.key(seed)

    def fn(images):
        keys = jax.random.split(key, images.shape[0])
        return jax.vmap(lambda im, k: ep_fn(variables, im, k))(images, keys)

    shape = (ep_per_batch, way * (shot + query), image_size, image_size, 3)
    sharding = None
    if data_shards:
        if ep_per_batch % data_shards:
            raise ValueError(
                f"ep_per_batch={ep_per_batch} must divide over "
                f"data_shards={data_shards}")
        sharding = _data_sharding(data_shards, len(shape))
    spec = jax.ShapeDtypeStruct(shape, jnp.uint8, sharding=sharding)
    return jax_export.export(jax.jit(fn), platforms=_norm_platforms(platforms))(spec)


def _norm_platforms(platforms: Optional[Sequence[str]]):
    if not platforms:
        return None
    return tuple(str(p).lower() for p in platforms)


def save_exported(exported: jax_export.Exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(bytes(exported.serialize()))


def load_exported(path: str) -> jax_export.Exported:
    with open(path, "rb") as f:
        return jax_export.deserialize(bytearray(f.read()))


def main():
    p = argparse.ArgumentParser(description="export a serving artifact")
    p.add_argument("--config", required=True,
                   help="eval config (same schema as eval.run)")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--way", type=int, default=5)
    p.add_argument("--shot", type=int, default=1)
    p.add_argument("--query", type=int, default=15)
    p.add_argument("--ep-per-batch", type=int, default=1)
    p.add_argument("--encoder-only", action="store_true",
                   help="export images->embeddings instead of the episode scorer")
    p.add_argument("--emd", action="store_true",
                   help="export the SUN-D DeepEMD episode scorer instead "
                        "(config uses the eval.run_emd schema: deepemd, "
                        "patch_list, temperature, ...)")
    p.add_argument("--batch", type=int, default=128,
                   help="encoder artifact batch size (--encoder-only)")
    p.add_argument("--platforms", default="",
                   help="comma list, e.g. 'cpu,tpu' for a multi-platform "
                        "artifact (default: the current jax platform)")
    p.add_argument("--data-shards", type=int, default=0,
                   help="build an N-chip artifact: episode/batch axis sharded "
                        "over an N-way data mesh (exportable from a 1-chip box)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 encoder compute inside the artifact")
    p.add_argument("--fold-bn", action="store_true",
                   help="fold frozen-stats BNs into the baked weights "
                        "(exact; serving-ready BN-free artifact — "
                        "models/fold.py; supported encoder families only)")
    args = p.parse_args()

    from ..core import load_config
    from ..core.registry import datasets as dataset_registry
    from .. import models as _models  # noqa: F401
    from .. import heads as _heads  # noqa: F401
    from ..data import datasets as _datasets  # noqa: F401
    from .episodic import sub_variables
    from .run import load_model_for_eval

    cfg = load_config(args.config)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.emd:
        from ..core import models as model_registry

        head = model_registry.make(
            "deepemd",
            encoder=cfg.get("model_args.encoder", "visformer_micro_80"),
            encoder_args=dict(cfg.get("model_args.encoder_args", {}) or {}),
            temperature=float(cfg.get("temperature", 12.5)),
            solver_reg=float(cfg.get("solver_reg", 0.05)),
            solver_iters=int(cfg.get("solver_iters", 100)),
            solver=cfg.get("solver", "sinkhorn_detached"),
            feature_pyramid=cfg.get("feature_pyramid"),
            dtype=dtype,
        )
        img0 = int(cfg.get("image_size", 80))
        variables = head.init(jax.random.key(0), jnp.zeros((1, img0, img0, 3)))
        from ..train.runner import resolve_checkpoint_variables

        variables = resolve_checkpoint_variables(
            cfg, head, variables,
            cfg.get("model_args.encoder", "visformer_micro_80"))
    else:
        head, variables = load_model_for_eval(cfg, dtype=dtype)
    if args.fold_bn:
        if args.emd:
            p.error("--fold-bn is not supported with --emd (the DeepEMD "
                    "head keeps its own encoder wrapper)")
        from ..models.fold import fold_encoder_in_head

        head, variables = fold_encoder_in_head(
            head, jax.tree_util.tree_map(np.asarray, variables))
    # dataset stats are baked into the artifact's normalize; export does not
    # otherwise need the data, so a missing dataset falls back to the
    # ImageNet stats (every loader but cifar-fs uses them) with a note
    ds_key = "test_dataset" if "test_dataset" in cfg else "dataset"
    try:
        ds = dataset_registry.make(cfg.get(ds_key, "mini-imagenet"),
                                   **dict(cfg.get(ds_key + "_args", {}) or {}))
        ds_mean, ds_std = ds.mean, ds.std
    except (FileNotFoundError, OSError) as e:
        print(f"note: dataset not loadable ({e}); baking default "
              f"ImageNet mean/std into the artifact")
        ds_mean, ds_std = MEAN, STD
    img = int(cfg.get("image_size", 80))
    platforms = [s for s in args.platforms.split(",") if s]
    if args.emd:
        from ..train.meta_tune_emd import make_patch_fn

        mode = cfg.get("deepemd", "grid")
        patch_fn = make_patch_fn(mode, cfg.get("patch_list", [2, 3]),
                                 int(cfg.get("num_patch", 9)),
                                 float(cfg.get("patch_ratio", 2.0)), img, False)
        # standalone-eval SFC default is sfc_lr=100 (meta_tuning_sun_d/
        # eval.py:41), matching eval.run_emd
        sfc_kw = {"steps": int(cfg.get("sfc_update_step", 100)),
                  "lr": float(cfg.get("sfc_lr", 100.0)),
                  "batch_size": int(cfg.get("sfc_bs", 4))}
        exp = export_emd_episode_scorer(
            head, variables, way=args.way, shot=args.shot, query=args.query,
            image_size=img, patch_fn=patch_fn, sfc_kw=sfc_kw,
            ep_per_batch=args.ep_per_batch, mean=ds_mean, std=ds_std,
            platforms=platforms, data_shards=args.data_shards,
        )
    elif args.encoder_only:
        exp = export_encoder(
            head.encoder, sub_variables(variables, "encoder"),
            image_size=img, batch=args.batch, mean=ds_mean, std=ds_std,
            platforms=platforms, data_shards=args.data_shards,
        )
    else:
        exp = export_episode_scorer(
            head, variables, way=args.way, shot=args.shot, query=args.query,
            image_size=img, ep_per_batch=args.ep_per_batch,
            mean=ds_mean, std=ds_std, platforms=platforms,
            data_shards=args.data_shards,
        )
    save_exported(exp, args.out)
    import os

    kind = ("EMD episode scorer" if args.emd
            else "encoder" if args.encoder_only else "episode scorer")
    plats = ",".join(exp.platforms)
    print(f"exported {kind} [{plats}] x{exp.nr_devices} device(s) -> "
          f"{args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()

"""SUN-D DeepEMD eval throughput probe.

Times the SAME run program ``eval/run_emd.py`` builds
(``eval/emd_eval.py::make_emd_eval_run_fn``; 5-way 1-shot 15-query,
visformer_micro_80, Sinkhorn flows) on synthetic data, steady-state,
fetch-forced — direct at ep_per_batch 1 and 4, and the cached-nodes path.
For context: the reference runs one cv2.EMD C++ simplex per
(query, prototype) pair on CPU inside a Python double loop
(``meta_tuning_sun_d/Models/models/Network.py:114-124``).

``--mode sampling`` probes the random-9-crop pipeline
(``sampling/mini_imagenet.py:52-58``): each episode draw re-crops every
image with fresh RRC windows, so node features are NOT a pure function of
the image — the cached path cannot apply by design and that leg is skipped
with a note (VERDICT r4 #7).

Run: python tools/emd_probe.py [--mode grid|sampling]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("grid", "sampling"), default="grid")
    args = ap.parse_args()
    from fewshot_vit_tpu.core.watchdog import watchdog_reexec
    watchdog_reexec(timeout_s=1800)
    import jax
    import jax.numpy as jnp

    from fewshot_vit_tpu.core import models, datasets
    from fewshot_vit_tpu.core.rng import enable_compilation_cache
    import fewshot_vit_tpu.models  # noqa: F401
    import fewshot_vit_tpu.heads  # noqa: F401
    import fewshot_vit_tpu.data.datasets  # noqa: F401
    from fewshot_vit_tpu.data.sampler import EpisodeSampler
    from fewshot_vit_tpu.eval.emd_eval import (
        group_episode_indices,
        make_emd_cached_episode_fn,
        make_emd_eval_run_fn,
        make_emd_node_cache_fn,
    )
    from fewshot_vit_tpu.train.meta_tune_emd import make_emd_episode_fn, make_patch_fn
    from fewshot_vit_tpu.core import rng as rng_mod

    enable_compilation_cache()
    way, shot, query = 5, 1, 15
    n_episodes = 200
    ds = datasets.make("synthetic", n_classes=20, n_per_class=600, image_size=80, seed=0)

    labels = jnp.tile(jnp.arange(way), query)
    sampler = EpisodeSampler(ds.labels, n_episodes, way, shot + query, 1)
    idx = np.stack(list(sampler.epoch(rng_mod.np_rng(0))))
    idx = (idx.reshape(n_episodes, way, shot + query)
           .transpose(0, 2, 1).reshape(n_episodes, -1).astype(np.int32))
    images_dev = jax.device_put(ds.images)
    patch_fn = make_patch_fn(args.mode, [2, 3], 9, 2.0, 80, False)
    n_patch = 13 if args.mode == "grid" else 9  # grid pyramid 2x2+3x3; sampling 9 RRC
    key = rng_mod.root_key(0)

    def timed(run, variables, data, idx_g):
        idx_dev = jax.device_put(idx_g)
        np.asarray(run(variables, data, idx_dev, key))
        np.asarray(run(variables, data, idx_dev, key))
        t0 = time.perf_counter()
        accs = np.asarray(run(variables, data, idx_dev, key))[:n_episodes]
        dt = time.perf_counter() - t0
        return dt, float(accs.mean())

    for tag, dtype in [("fp32", jnp.float32), ("bf16", jnp.bfloat16)]:
        head = models.make("deepemd", encoder="visformer_micro_80", dtype=dtype)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = head.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)))
        variables = jax.device_put(variables)

        direct_fn = make_emd_episode_fn(head, way, shot, query, patch_fn,
                                        ds.mean, ds.std, sfc=False)
        run = make_emd_eval_run_fn(direct_fn, labels)
        acc_direct = None
        for epb in (1, 4):
            dt, acc = timed(run, variables, images_dev,
                            jnp.asarray(group_episode_indices(idx, epb)))
            acc_direct = acc if acc_direct is None else acc_direct
            print(f"SUN-D {args.mode} eval [{tag}] epb={epb}: {n_episodes/dt:7.1f} "
                  f"episodes/s ({dt/n_episodes*1e3:.1f} ms/episode, "
                  f"{n_patch}-patch {args.mode}, Sinkhorn; acc {acc:.4f})",
                  flush=True)

        if args.mode == "sampling":
            print(f"SUN-D sampling eval [{tag}] --cached: N/A by design — "
                  "crops are redrawn per episode, node features are not a "
                  "pure function of the image, so there is nothing to cache",
                  flush=True)
            continue

        # cached: encode each image's nodes once, gather per episode
        cache_fn = make_emd_node_cache_fn(head, patch_fn, ds.mean, ds.std)
        np.asarray(cache_fn(variables, images_dev))  # compile encode
        t0 = time.perf_counter()
        nodes_dev = cache_fn(variables, images_dev)
        np.asarray(nodes_dev[0, 0, 0])  # force
        dt_enc = time.perf_counter() - t0
        run_c = make_emd_eval_run_fn(
            make_emd_cached_episode_fn(head, way, shot, sfc=False), labels)
        dt_c, acc_cached = timed(run_c, variables, nodes_dev,
                                 jnp.asarray(group_episode_indices(idx, 16)))
        print(f"SUN-D grid eval [{tag}] --cached epb=16: {n_episodes/dt_c:7.1f} "
              f"episodes/s ({dt_c/n_episodes*1e3:.2f} ms/episode; one-time "
              f"encode of {len(ds)} imgs = {dt_enc:.1f}s; acc {acc_cached:.4f} "
              f"vs direct {acc_direct:.4f})", flush=True)


if __name__ == "__main__":
    main()

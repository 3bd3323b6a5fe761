"""SUN-D DeepEMD eval throughput probe.

Times the same one-scan-program eval that ``eval/run_emd.py`` builds
(grid mode, 5-way 1-shot 15-query, visformer_micro_80, Sinkhorn flows) on
synthetic data, steady-state, fetch-forced. For context: the reference runs
one cv2.EMD C++ simplex per (query, prototype) pair on CPU inside a Python
double loop (``meta_tuning_sun_d/Models/models/Network.py:114-124``).

Run: python tools/emd_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fewshot_vit_tpu.core import models, datasets
    from fewshot_vit_tpu.core.rng import enable_compilation_cache
    import fewshot_vit_tpu.models  # noqa: F401
    import fewshot_vit_tpu.heads  # noqa: F401
    import fewshot_vit_tpu.data.datasets  # noqa: F401
    from fewshot_vit_tpu.data.sampler import EpisodeSampler
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
    patch_fn = make_patch_fn("grid", [2, 3], 9, 2.0, 80, False)

    for tag, dtype in [("fp32", jnp.float32), ("bf16", jnp.bfloat16)]:
        head = models.make("deepemd", encoder="visformer_micro_80", dtype=dtype)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = head.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)))
        variables = jax.device_put(variables)
        episode_fn = make_emd_episode_fn(head, way, shot, query, patch_fn,
                                         ds.mean, ds.std, sfc=False)

        @jax.jit
        def run(variables, images, idx, rng):
            def body(carry, scan_in):
                idx_e, i = scan_in
                logits = episode_fn(variables, images[idx_e], jax.random.fold_in(rng, i))
                acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
                return carry, acc

            _, accs = jax.lax.scan(body, None, (idx, jnp.arange(idx.shape[0])))
            return accs

        key = rng_mod.root_key(0)
        np.asarray(run(variables, images_dev, jnp.asarray(idx), key))
        np.asarray(run(variables, images_dev, jnp.asarray(idx), key))
        t0 = time.perf_counter()
        accs = run(variables, images_dev, jnp.asarray(idx), key)
        acc_direct = float(np.asarray(accs).mean())
        dt = time.perf_counter() - t0
        print(f"SUN-D grid eval [{tag}]: {n_episodes/dt:7.1f} episodes/s "
              f"({dt/n_episodes*1e3:.1f} ms/episode, 13-patch grid, Sinkhorn)",
              flush=True)

        # --cached mode: encode each image's nodes once, gather per episode
        from fewshot_vit_tpu.eval.run_emd import (
            make_emd_cached_episode_fn, make_emd_node_cache_fn,
        )

        cache_fn = make_emd_node_cache_fn(head, patch_fn, ds.mean, ds.std)
        cached_fn = make_emd_cached_episode_fn(head, way, shot, sfc=False)

        @jax.jit
        def run_cached(variables, nodes, idx, rng):
            def body(carry, scan_in):
                idx_e, i = scan_in
                logits = cached_fn(variables, nodes[idx_e], jax.random.fold_in(rng, i))
                acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
                return carry, acc

            _, accs = jax.lax.scan(body, None, (idx, jnp.arange(idx.shape[0])))
            return accs

        np.asarray(cache_fn(variables, images_dev))  # compile encode
        t0 = time.perf_counter()
        nodes_dev = cache_fn(variables, images_dev)
        nodes_np_done = np.asarray(nodes_dev[0, 0, 0])  # force
        dt_enc = time.perf_counter() - t0
        np.asarray(run_cached(variables, nodes_dev, jnp.asarray(idx), key))
        np.asarray(run_cached(variables, nodes_dev, jnp.asarray(idx), key))
        t0 = time.perf_counter()
        accs_c = run_cached(variables, nodes_dev, jnp.asarray(idx), key)
        acc_cached = float(np.asarray(accs_c).mean())
        dt_c = time.perf_counter() - t0
        print(f"SUN-D grid eval [{tag}] --cached: {n_episodes/dt_c:7.1f} episodes/s "
              f"({dt_c/n_episodes*1e3:.2f} ms/episode; one-time encode of "
              f"{len(ds)} imgs = {dt_enc:.1f}s; acc {acc_cached:.4f} vs "
              f"direct {acc_direct:.4f})", flush=True)


if __name__ == "__main__":
    main()

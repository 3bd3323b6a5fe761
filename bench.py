"""Benchmark: full-protocol episodic eval throughput on the local TPU chip.

Protocol: 5-way 1-shot 15-query episodes, Visformer-micro-80 MetaBaseline,
full re-encode of all 80 images per episode (NO feature caching — matching the
reference's ``test_phase/test_few_shot.py`` work per episode), bfloat16
activations (measured identical mean accuracy to fp32; the parameters stay
fp32 — see docs/PERF.md for the precision study and the roofline analysis).

Dataset: real miniImageNet test pickle if present under ``./materials``,
otherwise a synthetic stand-in with the same test-split geometry
(20 classes x 600 images, 80x80 uint8). Throughput is data-independent.

Baseline: the north-star target of >=10k eval episodes/min on a TPU v4-8
(4 chips) => 41.67 episodes/sec/chip. vs_baseline = measured / 41.67.

Config from the tools/perf_probe.py sweep (2026-08-16, v5e): bf16 +
ep_per_batch=128 (250.5 eps/s; fp32/64 was 189.7). The program is
encoder-compute-bound: gather+normalize is <1% of time and attention <2%.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

from fewshot_vit_tpu.core.watchdog import watchdog_reexec


def measure(int8: bool = False) -> dict:
    """Run the headline benchmark; returns the result dict (also consumed by
    tools/perf_rounds.py for the round-over-round regression table). The
    caller is responsible for the hang watchdog. ``int8=True`` measures the
    EXPERIMENTAL quantized encoder (models/quant.py) — reported under its
    own metric name, never as the headline."""
    import jax
    import jax.numpy as jnp

    from fewshot_vit_tpu.core import models, datasets
    from fewshot_vit_tpu.core.rng import enable_compilation_cache

    enable_compilation_cache()
    import fewshot_vit_tpu.models  # noqa: F401
    import fewshot_vit_tpu.heads  # noqa: F401
    import fewshot_vit_tpu.data.datasets  # noqa: F401
    from fewshot_vit_tpu.eval.episodic import evaluate

    way, shot, query = 5, 1, 15
    ep_per_batch = 128  # measured optimum on v5e in bf16 (32/64 within 4%)
    n_episodes = 1024

    if os.path.exists("./materials/miniImageNet_category_split_test.pickle"):
        ds = datasets.make("mini-imagenet", root_path="./materials", split="test")
    else:
        ds = datasets.make("synthetic", n_classes=20, n_per_class=600, image_size=80, seed=0)

    head = models.make("meta-baseline", encoder="visformer_micro_80",
                       dtype=jnp.bfloat16)
    xs = jnp.zeros((1, way, shot, 80, 80, 3), jnp.float32)
    xq = jnp.zeros((1, way * query, 80, 80, 3), jnp.float32)
    # init on CPU: TPU compiles go through a slow remote-compile path here,
    # and param init math is trivial
    with jax.default_device(jax.devices("cpu")[0]):
        variables = head.init(jax.random.key(0), xs, xq)
    # frozen-BN folding (models/fold.py): the eval-mode BNs fold exactly into
    # the adjacent conv/dense weights — measured +2.3% eps/s, |acc delta|
    # 1e-4 (tools/fold_probe.py, 2026-08-20); exactness is unit-tested
    # (tests/test_fold.py). The reference ships the same idea as LeViT
    # .fuse() (sun_meta_training/models/levit.py:150-172).
    if int8:
        from fewshot_vit_tpu.data.transforms import normalize
        from fewshot_vit_tpu.models.quant import quantize_encoder_in_head

        with jax.default_device(jax.devices("cpu")[0]):
            # random sample — the dataset is class-contiguous, a prefix
            # slice would calibrate activation scales on ~one class
            idx = np.sort(np.random.default_rng(0).choice(
                len(ds.images), size=min(256, len(ds.images)), replace=False))
            calib = normalize(jnp.asarray(ds.images[idx]), ds.mean, ds.std)
            head, variables = quantize_encoder_in_head(
                head, jax.tree_util.tree_map(np.asarray, variables),
                calib_images=calib)
    else:
        from fewshot_vit_tpu.models.fold import fold_encoder_in_head

        head, variables = fold_encoder_in_head(
            head, jax.tree_util.tree_map(np.asarray, variables))
    variables = jax.device_put(variables, jax.devices()[0])
    images_dev = jax.device_put(ds.images)

    # warmup: compile + one full pass (the persistent compile cache is
    # defeated by the TPU plugin's per-process session id, so steady-state
    # must be measured within-process)
    evaluate(head, variables, ds, n_episodes=n_episodes, way=way, shot=shot,
             query=query, ep_per_batch=ep_per_batch, seed=1, images_dev=images_dev)

    t0 = time.perf_counter()
    acc, ci, accs = evaluate(
        head, variables, ds, n_episodes=n_episodes, way=way, shot=shot,
        query=query, ep_per_batch=ep_per_batch, seed=2, images_dev=images_dev,
    )
    dt = time.perf_counter() - t0
    eps_per_sec = n_episodes / dt

    target_per_chip = 10000.0 / 60.0 / 4.0  # v4-8 north star, per chip
    name = "eval_episodes_per_sec_per_chip_5way1shot_full_protocol"
    if int8:
        name += "_int8_experimental"
    return {
        "metric": name,
        "value": round(eps_per_sec, 2),
        "unit": "episodes/s/chip",
        "vs_baseline": round(eps_per_sec / target_per_chip, 3),
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true",
                    help="EXPERIMENTAL int8 encoder (models/quant.py); "
                         "reported under its own metric name")
    args = ap.parse_args()
    # Warm-cache runs finish in ~2 min; a cold remote compile adds a few
    # more. Past 1500s the device relay is hung — fail loudly.
    watchdog_reexec(timeout_s=1500)
    print(json.dumps(measure(int8=args.int8)))


if __name__ == "__main__":
    main()

"""Frozen-BN folding probe: headline eval throughput, folded vs unfolded.

VERDICT r4 weak-item 2: docs/PERF.md measures 42.6 TF/s bf16 (21.6% MFU) on
the eval path and attributes part of the 55-65 TF/s-ceiling gap to BN/GELU
VPU chains. In eval mode every BN is a fixed per-channel affine that folds
exactly into the adjacent conv/dense weights (models/fold.py) — XLA cannot do
that rewrite itself because the weights are runtime arguments. This probe
answers: does removing the BNs buy measurable episodes/s on the real chip?

Protocol identical to bench.py (5-way 1-shot 15-query, visformer_micro_80
MetaBaseline, full re-encode, bf16 activations, ep_per_batch=128), plus an
accuracy cross-check between the two programs on the same episodes.

Usage: python tools/fold_probe.py [--episodes 1024] [--ep-per-batch 128]
       [--encoder visformer_micro_80|levit_micro_80|resnet12|resnet12-wide]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=1024)
    ap.add_argument("--ep-per-batch", type=int, default=128)
    ap.add_argument("--encoder", default="visformer_micro_80")
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    from fewshot_vit_tpu.core.watchdog import watchdog_reexec

    watchdog_reexec(timeout_s=2400)

    import jax
    import jax.numpy as jnp

    from fewshot_vit_tpu.core import models, datasets
    from fewshot_vit_tpu.core.rng import enable_compilation_cache
    from fewshot_vit_tpu.models.fold import fold_encoder_in_head

    enable_compilation_cache()
    import fewshot_vit_tpu.models  # noqa: F401
    import fewshot_vit_tpu.heads  # noqa: F401
    import fewshot_vit_tpu.data.datasets  # noqa: F401
    from fewshot_vit_tpu.eval.episodic import evaluate

    way, shot, query = 5, 1, 15
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    ds = datasets.make("synthetic", n_classes=20, n_per_class=600,
                       image_size=80, seed=0)
    head = models.make("meta-baseline", encoder=args.encoder, dtype=dtype)
    xs = jnp.zeros((1, way, shot, 80, 80, 3), jnp.float32)
    xq = jnp.zeros((1, way * query, 80, 80, 3), jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = head.init(jax.random.key(0), xs, xq)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    fhead, fvars = fold_encoder_in_head(head, variables)

    images_dev = jax.device_put(ds.images)
    results = {}
    for name, h, v in (("unfolded", head, variables), ("folded", fhead, fvars)):
        v = jax.device_put(v, jax.devices()[0])
        evaluate(h, v, ds, n_episodes=args.episodes, way=way, shot=shot,
                 query=query, ep_per_batch=args.ep_per_batch, seed=1,
                 images_dev=images_dev)
        t0 = time.perf_counter()
        acc, ci, _ = evaluate(
            h, v, ds, n_episodes=args.episodes, way=way, shot=shot,
            query=query, ep_per_batch=args.ep_per_batch, seed=2,
            images_dev=images_dev)
        dt = time.perf_counter() - t0
        results[name] = (args.episodes / dt, acc, ci)
        print(f"{name:>9}: {args.episodes / dt:8.1f} eps/s  acc={acc:.4f}+-{ci:.4f}")

    speedup = results["folded"][0] / results["unfolded"][0]
    dacc = abs(results["folded"][1] - results["unfolded"][1])
    print(f"speedup: {speedup:.3f}x   |acc delta|: {dacc:.4f}")


if __name__ == "__main__":
    main()

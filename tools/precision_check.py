"""bf16-vs-fp32 accuracy equivalence on the bench's headline configuration.

Runs the EXACT protocol bench.py measures (5-way 1-shot 15-query full-protocol
episodic eval, visformer_micro_80 MetaBaseline, identical params and identical
episode indices for both precisions) once with fp32 activations and once with
bfloat16, and prints one JSON line with both mean accuracies and their gap.
The default-on test `tests/test_cli_integration.py::TestPrecisionParity`
asserts the gap — turning the docs/PERF.md "bf16 accuracy is identical" claim
into an enforced invariant (VERDICT r2 #5).

Usage: python tools/precision_check.py   (env: PRECHECK_EPISODES, PRECHECK_EPB)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from fewshot_vit_tpu.core.watchdog import watchdog_reexec
    watchdog_reexec(timeout_s=1800)
    import jax
    import jax.numpy as jnp

    from fewshot_vit_tpu.core import models, datasets
    from fewshot_vit_tpu.core.rng import enable_compilation_cache

    enable_compilation_cache()
    import fewshot_vit_tpu.models  # noqa: F401
    import fewshot_vit_tpu.heads  # noqa: F401
    import fewshot_vit_tpu.data.datasets  # noqa: F401
    from fewshot_vit_tpu.eval.episodic import evaluate, sample_episode_indices

    way, shot, query = 5, 1, 15
    n_episodes = int(os.environ.get("PRECHECK_EPISODES", 512))
    epb = int(os.environ.get("PRECHECK_EPB", 128))       # bench headline (bf16)
    epb_fp32 = int(os.environ.get("PRECHECK_EPB_FP32", 64))  # fp32@128 OOMs HBM

    ds = datasets.make("synthetic", n_classes=20, n_per_class=600,
                       image_size=80, seed=0)
    images_dev = jax.device_put(ds.images)

    # one episode draw at the headline geometry, shared by both precisions;
    # fp32 runs the SAME flat episode blocks regrouped to its smaller batch
    # (each index row is ep_per_batch consecutive way*(shot+query) blocks, so
    # the reshape is a pure regrouping, episode content untouched)
    idx = sample_episode_indices(ds, n_episodes, way, shot + query, epb, seed=7)
    ep_len = way * (shot + query)
    idx_fp32 = idx.reshape(-1, epb_fp32 * ep_len)

    out = {}
    for name, dtype, epb_i, idx_i in (
        ("fp32", jnp.float32, epb_fp32, idx_fp32),
        ("bf16", jnp.bfloat16, epb, idx),
    ):
        head = models.make("meta-baseline", encoder="visformer_micro_80",
                           dtype=dtype)
        xs = jnp.zeros((1, way, shot, 80, 80, 3), jnp.float32)
        xq = jnp.zeros((1, way * query, 80, 80, 3), jnp.float32)
        # params are fp32 under both settings and the init key is shared, so
        # the two runs differ ONLY in activation precision
        with jax.default_device(jax.devices("cpu")[0]):
            variables = head.init(jax.random.key(0), xs, xq)
        variables = jax.device_put(variables, jax.devices()[0])
        acc, ci, _ = evaluate(
            head, variables, ds, n_episodes=n_episodes, way=way, shot=shot,
            query=query, ep_per_batch=epb_i, seed=7, images_dev=images_dev,
            indices=idx_i,
        )
        out[f"acc_{name}"] = round(float(acc), 6)
        out[f"ci_{name}"] = round(float(ci), 6)
    out["abs_diff"] = round(abs(out["acc_fp32"] - out["acc_bf16"]), 6)
    out["n_episodes"] = n_episodes
    print(json.dumps(out))


if __name__ == "__main__":
    main()

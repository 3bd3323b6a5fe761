"""SUN-D (DeepEMD) training throughput probe — the docs/PERF.md table source.

Times the REAL epoch program ``train/meta_tune_emd.py`` builds
(``make_emd_epoch_fn`` over ``make_emd_episode_fn``: grid patches with
per-image/per-level train ratios, differentiable Sinkhorn flows, the
reference's zero-NaN + weight-decay + Nesterov-SGD optimizer chain) on
synthetic data, 5-way 1-shot 15-query, visformer_micro_80. Configurations
match the reference's task-batching semantics: ``bs=1`` (reference default),
``bs=4`` vmapped (concurrent episodes), and ``bs=4 grad_accum`` (sequential
scan with summed grads, one episode's activation memory —
``train_meta.py:166-177`` semantics).

Methodology per docs/PERF.md: one ``lax.scan`` program over N steps,
double-warm, fetch-forced, min over ``--repeats`` (this box's shared relay
has large within-process spread).

Run: python tools/emd_train_probe.py [--repeats N] [--steps S] [--vmap-bs4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fewshot_vit_tpu.core.watchdog import watchdog_reexec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--steps", type=int, default=4,
                    help="train steps per timed program")
    ap.add_argument("--vmap-bs4", action="store_true",
                    help="also time bs=4 vmapped (can exceed HBM at full "
                         "query counts — off by default)")
    ap.add_argument("--only-remat", action="store_true",
                    help="skip the already-measured base rows; time only "
                         "the vmapped+remat configurations")
    ap.add_argument("--tiny", action="store_true",
                    help="correctness smoke: forces the CPU platform, tiny "
                         "encoder at 32px, 2-way 2-query, 1 step — numbers "
                         "are meaningless")
    args = ap.parse_args()
    watchdog_reexec(timeout_s=120 if args.tiny else 1800)

    import jax

    if args.tiny:
        # env-var platform pinning is ignored on this box (sitecustomize);
        # only jax.config.update after import actually leaves the relay.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from fewshot_vit_tpu.core import datasets, models
    from fewshot_vit_tpu.core import rng as rng_mod
    from fewshot_vit_tpu.core.rng import enable_compilation_cache
    import fewshot_vit_tpu.models  # noqa: F401
    import fewshot_vit_tpu.heads  # noqa: F401
    import fewshot_vit_tpu.data.datasets  # noqa: F401
    from fewshot_vit_tpu.data.sampler import EpisodeSampler
    from fewshot_vit_tpu.train.meta_tune_emd import (
        make_emd_episode_fn,
        make_emd_epoch_fn,
        make_patch_fn,
    )
    from fewshot_vit_tpu.train.optim import multistep_schedule, zero_nan_grads
    from fewshot_vit_tpu.train.state import TrainState

    enable_compilation_cache()
    way, shot, query = 5, 1, 15
    img = 80
    if args.tiny:
        way, query = 2, 2
        args.steps, args.repeats, args.vmap_bs4 = 1, 1, False
        img = 32
    ds = datasets.make("synthetic", n_classes=20, n_per_class=200,
                       image_size=img, seed=0)
    images_dev = jax.device_put(ds.images)
    labels = jnp.tile(jnp.arange(way), query)
    patch_fn = make_patch_fn("grid", [2, 3], 9, 2.0, img, True)

    # one fixed pool of interleaved episode indices, reshaped per bs below
    n_ep_pool = args.steps * 4
    sampler = EpisodeSampler(ds.labels, n_ep_pool, way, shot + query, 1)
    idx_pool = np.stack(list(sampler.epoch(rng_mod.np_rng(0))))
    idx_pool = (idx_pool.reshape(n_ep_pool, way, shot + query)
                .transpose(0, 2, 1).reshape(n_ep_pool, -1).astype(np.int32))

    def tx_chain():
        sched = multistep_schedule(5e-4, 50, milestones=[10], gamma=0.5)
        return optax.chain(
            zero_nan_grads(),
            optax.add_decayed_weights(5e-4),
            optax.sgd(sched, momentum=0.9, nesterov=True),
        )

    def make_head(dtype):
        if args.tiny:
            # the smoke checks the epoch program's structure, not the model:
            # a 2-conv encoder keeps the CPU compile to seconds.
            import flax.linen as nn

            from fewshot_vit_tpu.heads import DeepEMD

            class _TinyEnc(nn.Module):
                @nn.compact
                def __call__(self, x, train=False):
                    x = nn.relu(nn.Conv(8, (3, 3), strides=(2, 2))(x))
                    x = nn.relu(nn.Conv(8, (3, 3), strides=(2, 2))(x))
                    return x, x.mean(axis=(1, 2))

            return DeepEMD(encoder=_TinyEnc(), solver_iters=5)
        return models.make("deepemd", encoder="visformer_micro_80", dtype=dtype)

    def run(tag, dtype, bs, grad_accum, remat=False):
        # a config that exceeds HBM is a result, not a probe failure
        try:
            _run(tag, dtype, bs, grad_accum, remat)
        except Exception as e:  # jaxlib.xla_extension.XlaRuntimeError
            msg = str(e)
            # direct runs raise RESOURCE_EXHAUSTED; the axon relay wraps the
            # same failure as an HTTP 500 whose body says "Ran out of memory
            # in memory space hbm. Used X of 15.75G"
            if any(s in msg for s in ("RESOURCE_EXHAUSTED", "Out of memory",
                                      "Ran out of memory",
                                      "Exceeded hbm capacity")):
                import re
                used = re.search(r"Used ([\d.]+[GM]) of", msg)
                detail = f" (needs {used.group(1)})" if used else ""
                print(f"{tag:34s}: OOM — exceeds 15.75G HBM{detail}",
                      flush=True)
            else:
                raise

    def _run(tag, dtype, bs, grad_accum, remat=False):
        head = make_head(dtype)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = head.init(jax.random.key(0), jnp.zeros((1, img, img, 3)))
        variables = jax.device_put(variables)
        tx = tx_chain()
        state = TrainState.create(variables, tx)
        episode_fn = make_emd_episode_fn(
            head, way, shot, query, patch_fn, ds.mean, ds.std,
            sfc=False, train=True, remat=remat,
        )
        epoch_fn = make_emd_epoch_fn(episode_fn, tx, labels, bs,
                                     grad_accum=grad_accum)
        idx = jnp.asarray(
            idx_pool[: args.steps * bs].reshape(args.steps, bs, -1))
        key = rng_mod.root_key(0)

        # the program donates the state: chain it through warm + timed calls
        state, ms = epoch_fn(state, images_dev, idx, key)
        np.asarray(ms["loss"])
        state, ms = epoch_fn(state, images_dev, idx, key)
        np.asarray(ms["loss"])
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            state, ms = epoch_fn(state, images_dev, idx, key)
            np.asarray(ms["loss"])
            times.append((time.perf_counter() - t0) / args.steps)
        t = min(times)
        eps = bs / t
        print(f"{tag:34s}: {t*1e3:7.1f} ms/step  {eps:5.1f} episodes/s   "
              + " ".join(f"{x*1e3:.0f}" for x in times), flush=True)

    if not args.only_remat:
        run("fp32, bs=1 (reference default)", jnp.float32, 1, False)
        if args.vmap_bs4:
            run("fp32, bs=4, vmapped", jnp.float32, 4, False)
        run("fp32, bs=4, grad_accum", jnp.float32, 4, True)
        run("bf16 encoder, bs=4, grad_accum", jnp.bfloat16, 4, True)
    # remat: jax.checkpoint around the encoder drops stored activations.
    # Measured 2026-08-18 (v5e, 15.75G): it is NOT enough to fit bs=4
    # vmapped grid batches (fp32 wants 40.16G — the rematted backward still
    # live-holds ~0.8G temps per encoder block across the 4x1040-image
    # batch); bs=2 is the vmapped frontier probed here.
    run("fp32, bs=4, vmapped + remat", jnp.float32, 4, False, remat=True)
    run("bf16 encoder, bs=4, vmapped + remat", jnp.bfloat16, 4, False, remat=True)
    run("fp32, bs=2, vmapped + remat", jnp.float32, 2, False, remat=True)
    run("bf16 encoder, bs=2, vmapped + remat", jnp.bfloat16, 2, False, remat=True)


if __name__ == "__main__":
    main()

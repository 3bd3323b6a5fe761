"""Training-step throughput probe (phase-1 CE, phase-2 SUN, phase-3 tune).

Measures steady-state per-step time on the real TPU at batch 512,
visformer_micro_80, as the mean over a 10-step ``lax.scan`` program —
mirroring the framework's one-program-per-epoch design. (A bare
step-per-launch measurement is meaningless on this box: the axon relay
charges ~10-20 ms per argument buffer per launch, so a 127-leaf variables
pytree adds ~1.5 s/launch; the epoch-scan programs pass weights once.)

Run: python tools/train_probe.py [--only all|pretrain|sun|meta] [--repeats N]

``--repeats`` re-times each section N times within the process (fresh state,
same compiled program) — the fp32 SUN step in particular shows large
across-process run-to-run variance (see docs/PERF.md), so a single
measurement is not trustworthy.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["all", "pretrain", "sun", "meta"],
                    default="all")
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()
    from fewshot_vit_tpu.core.watchdog import watchdog_reexec
    watchdog_reexec(timeout_s=1800)
    import jax
    import jax.numpy as jnp
    import optax

    from fewshot_vit_tpu.core import models
    from fewshot_vit_tpu.core.rng import enable_compilation_cache
    import fewshot_vit_tpu.models  # noqa: F401
    import fewshot_vit_tpu.heads  # noqa: F401
    from fewshot_vit_tpu.data.augment import make_cropaug_fn, make_dual_view_fn
    from fewshot_vit_tpu.train.state import TrainState
    from fewshot_vit_tpu.train.steps import make_pretrain_step, make_sun_step

    enable_compilation_cache()
    B, n_classes, N_STEPS = 512, 64, 10
    rng_np = np.random.default_rng(0)
    img84 = jax.device_put(rng_np.integers(0, 256, (B, 84, 84, 3), dtype=np.uint8))
    img80 = jax.device_put(rng_np.integers(0, 256, (B, 80, 80, 3), dtype=np.uint8))
    labels = jax.device_put(
        rng_np.integers(0, n_classes, (B,), dtype=np.int64).astype(np.int32))
    tx = optax.adamw(1e-3)

    def time_scan(step, state, images, extra=()):
        """Scan N_STEPS of `step(state, *extra, images, labels, rng)` in ONE
        jitted program; report mean per-step time (double-warm, fetch-forced)."""
        keys = jax.random.split(jax.random.key(0), N_STEPS)

        @jax.jit
        def epoch(state, images, labels, keys, *extra):
            def body(s, k):
                s, m = step(s, *extra, images, labels, k)
                return s, m["loss"]
            s, losses = jax.lax.scan(body, state, keys)
            return s, losses[-1]

        s, loss = epoch(state, images, labels, keys, *extra)
        np.asarray(loss)
        s, loss = epoch(s, images, labels, keys, *extra)
        np.asarray(loss)
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            s, loss = epoch(s, images, labels, keys, *extra)
            np.asarray(loss)
            times.append((time.perf_counter() - t0) / N_STEPS)
        if args.repeats > 1:
            print("  repeats: " + " ".join(f"{t*1e3:.1f}" for t in times)
                  + " ms/step", flush=True)
        return min(times)

    def pretrain_state(dtype=None):
        import jax.numpy as _jnp
        model = models.make("classifier", encoder="visformer_micro_80",
                            classifier_args={"n_classes": n_classes},
                            **({"dtype": dtype} if dtype else {}))
        with jax.default_device(jax.devices("cpu")[0]):
            variables = model.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)))
        variables = jax.device_put(variables)
        return model, TrainState.create(variables, tx)

    if args.only in ("all", "pretrain"):
        model, state = pretrain_state()
        step = make_pretrain_step(model, tx, jit=False)
        t = time_scan(step, state, img80)
        print(f"pretrain plain     : {t*1e3:7.1f} ms/step  {B/t:7.0f} img/s", flush=True)

        model, state = pretrain_state()
        step = make_pretrain_step(model, tx, preprocess_fn=make_cropaug_fn(), jit=False)
        t = time_scan(step, state, img84)
        print(f"pretrain cropaug   : {t*1e3:7.1f} ms/step  {B/t:7.0f} img/s", flush=True)

        model, state = pretrain_state(dtype=jnp.bfloat16)
        step = make_pretrain_step(model, tx, preprocess_fn=make_cropaug_fn(), jit=False)
        t = time_scan(step, state, img84)
        print(f"pretrain cropaug bf16: {t*1e3:5.1f} ms/step  {B/t:7.0f} img/s", flush=True)

    if args.only in ("all", "meta"):
        # phase-3 SUN-M meta-tune: the real epoch program
        # (train/loop.py::make_meta_tune_epoch — in-program episode gather +
        # split_shot_query + MetaBaseline step), training geometry of
        # configs/meta_tune_mini_visformer_1shot.yaml (10-way 1-shot 5-query,
        # ep_per_batch 8), reference SGD-momentum optimizer chain.
        from fewshot_vit_tpu.core import datasets as ds_mod
        import fewshot_vit_tpu.data.datasets  # noqa: F401
        from fewshot_vit_tpu.train.loop import make_meta_tune_epoch

        ds = ds_mod.make("synthetic", n_classes=16, n_per_class=64,
                         image_size=80, seed=0)
        images_dev = jax.device_put(ds.images)
        way, shot, query, epb = 10, 1, 5, 8
        per_step = epb * way * (shot + query)
        idx = jax.device_put(jnp.asarray(
            rng_np.integers(0, ds.images.shape[0], (N_STEPS, per_step)),
            jnp.int32))
        tx_meta = optax.sgd(1e-3, momentum=0.9)
        for tag, dtype_kw in [("", {}), (" bf16", {"dtype": jnp.bfloat16})]:
            head = models.make("meta-baseline", encoder="visformer_micro_80",
                               **dtype_kw)
            with jax.default_device(jax.devices("cpu")[0]):
                hv = head.init(jax.random.key(2),
                               jnp.zeros((1, way, shot, 80, 80, 3)),
                               jnp.zeros((1, way * query, 80, 80, 3)))
            state = TrainState.create(jax.device_put(hv), tx_meta)
            epoch_fn = make_meta_tune_epoch(head, tx_meta, way, shot, query,
                                            epb, mean=ds.mean, std=ds.std)
            key = jax.random.key(3)
            # the program donates the state: chain warm + timed calls
            state, ms = epoch_fn(state, images_dev, idx, key)
            np.asarray(ms["loss"])
            state, ms = epoch_fn(state, images_dev, idx, key)
            np.asarray(ms["loss"])
            times = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                state, ms = epoch_fn(state, images_dev, idx, key)
                np.asarray(ms["loss"])
                times.append((time.perf_counter() - t0) / N_STEPS)
            t = min(times)
            print(f"meta-tune 10w1s5q{tag:5s}: {t*1e3:7.1f} ms/step  "
                  f"{epb/t:6.1f} episodes/s  "
                  f"{per_step/t:7.0f} img/s", flush=True)

    if args.only not in ("all", "sun"):
        return
    # phase-2 SUN: student token-label + frozen teacher, device dual-view
    for tag, dtype_kw in [("", {}), (" bf16", {"dtype": jnp.bfloat16})]:
        student = models.make("token-label", encoder="visformer_micro_80",
                              classifier_args={"n_classes": n_classes},
                              **dtype_kw)
        with jax.default_device(jax.devices("cpu")[0]):
            sv = student.init(jax.random.key(1), jnp.zeros((1, 80, 80, 3)))
        sv = jax.device_put(sv)
        state = TrainState.create(sv, tx)
        tvars = {"params": sv["params"]}
        if sv.get("batch_stats"):
            tvars["batch_stats"] = sv["batch_stats"]
        sun = make_sun_step(student, student, tx,
                            dual_view_fn=make_dual_view_fn(), jit=False)

        def sun_step(s, tv, images, labels, k):
            return sun(s, tv, images, images, labels, k)

        t = time_scan(sun_step, state, img84, extra=(tvars,))
        print(f"sun dual-view{tag:5s}: {t*1e3:7.1f} ms/step  {B/t:7.0f} img/s",
              flush=True)


if __name__ == "__main__":
    main()

"""Eval-throughput perf probe: where does the episode-eval program spend time?

Measures, on the real chip, steady-state within-process:
  * full-protocol evaluate() fp32 vs bf16 at several ep_per_batch sizes,
  * a gather+normalize-only program (the data-movement floor),
  * an encoder-only program (the compute roof), fp32 vs bf16,
and prints XLA's own FLOP estimate for the encoder to derive achieved
FLOP/s / MFU. All timings force host fetches (on this box block_until_ready
does not wait for the axon relay; only fetches do).

Usage: python tools/perf_probe.py [--quick]
"""

import argparse
import time

import numpy as np


def fetch(x):
    return np.asarray(x)


def timeit(fn, *args, reps=3):
    fetch(fn(*args))  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--sweep", default="",
                   help="comma list of ep_per_batch sizes for the "
                        "full-protocol sweep (default 32,64,128)")
    p.add_argument("--full-only", action="store_true",
                   help="skip the component probes; run only the "
                        "full-protocol sweep")
    args = p.parse_args()
    from fewshot_vit_tpu.core.watchdog import watchdog_reexec
    watchdog_reexec(timeout_s=1800)

    import jax
    import jax.numpy as jnp

    from fewshot_vit_tpu.core import models, datasets
    from fewshot_vit_tpu.core.rng import enable_compilation_cache
    import fewshot_vit_tpu.models  # noqa: F401
    import fewshot_vit_tpu.heads  # noqa: F401
    import fewshot_vit_tpu.data.datasets  # noqa: F401
    from fewshot_vit_tpu.eval.episodic import evaluate
    from fewshot_vit_tpu.data.transforms import normalize

    enable_compilation_cache()
    way, shot, query = 5, 1, 15
    n_episodes = 512 if args.quick else 1024
    ds = datasets.make("synthetic", n_classes=20, n_per_class=600, image_size=80, seed=0)
    images_dev = jax.device_put(ds.images)
    mean, std = ds.mean, ds.std

    # --- encoder FLOPs per image (XLA cost analysis) ---
    enc = models.make("visformer_micro_80")
    with jax.default_device(jax.devices("cpu")[0]):
        ev = enc.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)))
    ev = jax.device_put(ev, jax.devices()[0])
    xin = jnp.zeros((256, 80, 80, 3), jnp.float32)
    lowered = jax.jit(lambda v, x: enc.apply(v, x, train=False)[1]).lower(ev, xin)
    ca = lowered.compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops_per_img = ca["flops"] / 256.0
    print(f"encoder fp32 flops/image (XLA estimate): {flops_per_img/1e9:.3f} GF")

    # --- component: gather + normalize only ---
    epb = 64
    if args.full_only:
        sweep = ([int(s) for s in args.sweep.split(",") if s]
                 or ([64] if args.quick else [32, 64, 128]))
        _full_protocol_sweep(args, sweep, way, shot, query, n_episodes, ds,
                             images_dev, flops_per_img)
        return
    n_batches = n_episodes // epb
    idx = np.random.default_rng(0).integers(0, len(ds), (n_batches, epb * way * (shot + query)), dtype=np.int32)
    idx_dev = jnp.asarray(idx)

    @jax.jit
    def gather_norm(images, idx_all):
        def body(c, i):
            x = normalize(images[i], mean, std)
            return c, x.sum()
        _, s = jax.lax.scan(body, None, idx_all)
        return s

    t = timeit(gather_norm, images_dev, idx_dev)
    n_img = n_batches * epb * way * (shot + query)
    print(f"gather+normalize: {t*1e3:.1f} ms for {n_img} imgs -> {n_img/t:.0f} img/s "
          f"({n_episodes/t:.0f} eps/s equivalent)")

    # --- component: encoder-only scan (no gather), fp32 vs bf16 ---
    for dtype, tag in [(jnp.float32, "fp32"), (jnp.bfloat16, "bf16")]:
        enc_d = models.make("visformer_micro_80", dtype=dtype)
        batch = epb * way * (shot + query)  # same shape as one eval iter
        x_big = jnp.zeros((n_batches, batch, 80, 80, 3), dtype)

        @jax.jit
        def enc_scan(v, xs):
            def body(c, x):
                _, pooled = enc_d.apply(v, x, train=False)
                return c, pooled.sum()
            _, s = jax.lax.scan(body, None, xs)
            return s

        t = timeit(enc_scan, ev, x_big)
        tf = flops_per_img * n_img / t / 1e12
        print(f"encoder-only {tag}: {t*1e3:.1f} ms -> {n_img/t:.0f} img/s, "
              f"{tf:.1f} TFLOP/s achieved ({n_episodes/t:.0f} eps/s equivalent)")

    # --- full protocol: fp32 vs bf16 x ep_per_batch sweep ---
    # (Pallas attention is benchmarked at the kernel level in
    # tools/attn_bench.py — XLA wins at these shapes, see docs/KERNELS.md.)
    sweep = ([int(s) for s in args.sweep.split(",") if s]
             or ([64] if args.quick else [32, 64, 128]))
    _full_protocol_sweep(args, sweep, way, shot, query, n_episodes, ds,
                         images_dev, flops_per_img)


def _full_protocol_sweep(args, sweep, way, shot, query, n_episodes, ds,
                         images_dev, flops_per_img):
    import jax
    import jax.numpy as jnp

    from fewshot_vit_tpu.core import models
    from fewshot_vit_tpu.eval.episodic import evaluate

    for dtype, tag in [(jnp.float32, "fp32"), (jnp.bfloat16, "bf16")]:
        head = models.make("meta-baseline", encoder="visformer_micro_80", dtype=dtype)
        xs0 = jnp.zeros((1, way, shot, 80, 80, 3), jnp.float32)
        xq0 = jnp.zeros((1, way * query, 80, 80, 3), jnp.float32)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = head.init(jax.random.key(0), xs0, xq0)
        variables = jax.device_put(variables, jax.devices()[0])
        for epb_i in sweep:
            try:
                evaluate(head, variables, ds, n_episodes=n_episodes, way=way, shot=shot,
                         query=query, ep_per_batch=epb_i, seed=1, images_dev=images_dev)
            except Exception as e:  # e.g. HBM OOM at compile
                print(f"full protocol {tag} epb={epb_i}: "
                      f"FAILED ({type(e).__name__}: {str(e)[:90]})")
                continue
            t0 = time.perf_counter()
            evaluate(head, variables, ds, n_episodes=n_episodes, way=way, shot=shot,
                     query=query, ep_per_batch=epb_i, seed=2, images_dev=images_dev)
            dt = time.perf_counter() - t0
            print(f"full protocol {tag} epb={epb_i}: {n_episodes/dt:.1f} eps/s "
                  f"({flops_per_img*n_episodes*80/dt/1e12:.1f} TF/s effective)")


if __name__ == "__main__":
    main()

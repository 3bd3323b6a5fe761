"""Per-stage encoder timing: where do visformer_micro_80's cycles go?

Times truncated forward programs (stem; stem+stage1; ... full) at the eval
batch size, in fp32 and bf16, and reports per-stage deltas with each stage's
XLA FLOP estimate -> effective FLOP/s per stage. Scalar-reduced in-program.

Usage: python tools/stage_probe.py
"""

import time
from functools import partial

import numpy as np


def timeit(fn, *args, reps=3):
    np.asarray(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from fewshot_vit_tpu.core.watchdog import watchdog_reexec
    watchdog_reexec(timeout_s=1800)
    import jax
    import jax.numpy as jnp

    from fewshot_vit_tpu.models.visformer import Visformer

    print(f"platform: {jax.devices()[0]}")
    B = 2560
    REPS = 4
    # cumulative depth configs: stem only -> +stage1 -> +stage2 -> full
    stages = [
        ("stem", (0, 0, 0)),
        ("+stage1", (4, 0, 0)),
        ("+stage2", (4, 2, 0)),
        ("+stage3(full)", (4, 2, 3)),
    ]
    for dtype, tag in [(jnp.float32, "fp32"), (jnp.bfloat16, "bf16")]:
        prev_t, prev_f = 0.0, 0.0
        rows = []
        for name, depth in stages:
            enc = Visformer(img_size=80, init_channels=64, embed_dim=256,
                            depth=depth, num_heads=6, mlp_ratio=4.0, group=8,
                            attn_stage="011", spatial_conv="100", dtype=dtype)
            with jax.default_device(jax.devices("cpu")[0]):
                v = enc.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)))
            v = jax.device_put(v, jax.devices()[0])
            x = jnp.zeros((B, 80, 80, 3), dtype)

            def run(v, x):
                def body(c, _):
                    _, pooled = enc.apply(v, x + c, train=False)
                    return pooled.mean().astype(x.dtype), None
                c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=REPS)
                return c

            jr = jax.jit(run)
            ca = jr.lower(v, x).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            flops = ca["flops"] / REPS
            t = timeit(jr, v, x) / REPS
            d_t, d_f = t - prev_t, flops - prev_f
            rows.append((name, t, d_t, d_f))
            prev_t, prev_f = t, flops
        print(f"--- {tag} (B={B}) ---")
        for name, t, d_t, d_f in rows:
            eff = d_f / d_t / 1e12 if d_t > 0 else float("nan")
            print(f"{name:14s} cum {t*1e3:8.2f} ms | stage {d_t*1e3:8.2f} ms "
                  f"| {d_f/B/1e6:7.1f} MF/img | {eff:5.1f} TF/s")


if __name__ == "__main__":
    main()

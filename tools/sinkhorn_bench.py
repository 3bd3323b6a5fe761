"""Microbenchmark: fused Pallas Sinkhorn vs the XLA lax.scan solver, real TPU.

Shapes mirror DeepEMD call sites: per episode batch, way*query problems of
N x N (fcn: N=25; grid [2,3]: N=13; sampling: N=9), 100 iterations.
Scalar-reduced in-program (host fetches cost seconds on this box's link).

Usage: python tools/sinkhorn_bench.py
"""

import time
from functools import partial

import numpy as np


def timeit(fn, *args, reps=5):
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

    from fewshot_vit_tpu.kernels.sinkhorn import sinkhorn_pallas
    from fewshot_vit_tpu.ops.emd import normalize_weights, sinkhorn

    print(f"platform: {jax.devices()[0]}")
    REPS = 4
    cases = [
        ("fcn episode", 375, 25), ("grid episode", 375, 13),
        ("sampling episode", 375, 9), ("fcn 4-task batch", 1500, 25),
    ]
    for tag, b, n in cases:
        rng = np.random.default_rng(0)
        cost = jnp.asarray(rng.uniform(0, 1, (b, n, n)), jnp.float32)
        w1 = normalize_weights(jnp.asarray(rng.uniform(0.1, 1, (b, n)), jnp.float32))
        w2 = normalize_weights(jnp.asarray(rng.uniform(0.1, 1, (b, n)), jnp.float32))

        def looped(core):
            def fn(cost, w1, w2):
                def body(c, _):
                    f = core(cost + c, w1, w2)
                    return f.mean(), None
                c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=REPS)
                return c
            return jax.jit(fn)

        xla = looped(partial(sinkhorn, reg=0.05, iters=100))
        t_xla = timeit(xla, cost, w1, w2) / REPS
        try:
            pal = looped(partial(sinkhorn_pallas, reg=0.05, iters=100, block_b=8))
            t_pal = timeit(pal, cost, w1, w2) / REPS
            r = t_xla / t_pal
            verdict = "pallas" if r > 1.05 else ("xla" if r < 0.95 else "tie")
            print(f"{tag:18s} B={b:5d} N={n:3d} iters=100: xla {t_xla*1e3:8.2f} ms"
                  f" | pallas {t_pal*1e3:8.2f} ms | x{r:.2f} -> {verdict}")
        except Exception as e:
            print(f"{tag}: pallas FAILED {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()

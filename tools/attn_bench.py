"""Microbenchmark: Pallas fused MHSA vs XLA einsum chain, real TPU.

Shapes mirror the zoo's attention call sites (Visformer stage2 T=100 /
stage3 T=25 at eval batch sizes). Timing forces host fetches (axon relay:
block_until_ready does not wait). Output feeds docs/KERNELS.md — the default
attention path is set from this data, not from claims.

Usage: python tools/attn_bench.py
"""

import time

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

    from fewshot_vit_tpu.kernels.attention import attention_core, fused_mhsa

    print(f"platform: {jax.devices()[0]}")
    # (tag, B, T, H, hd): visformer_micro stage2/stage3 at eval batch 5120
    cases = [
        ("visformer s2 eval", 5120, 100, 6, 42),
        ("visformer s3 eval", 5120, 25, 6, 85),
        ("visformer s2 train", 512, 100, 6, 42),
        ("nest/swin window", 4096, 25, 4, 32),
    ]
    for dtype, dtag in [(jnp.float32, "fp32"), (jnp.bfloat16, "bf16")]:
        for tag, b, t, h, hd in cases:
            k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
            q = jax.random.normal(k1, (b, t, h, hd), dtype)
            k = jax.random.normal(k2, (b, t, h, hd), dtype)
            v = jax.random.normal(k3, (b, t, h, hd), dtype)
            scale = hd ** -0.5

            # reduce to a scalar INSIDE the program: fetching the full output
            # would cost seconds over this box's ~9 MB/s host link and swamp
            # the kernel time. Loop the op in-program so the scalar fetch
            # amortizes to nothing.
            REPS = 8

            def looped(core):
                def fn(q, k, v):
                    def body(c, _):
                        o = core(q + c, k, v, scale)
                        return o.mean().astype(q.dtype), None
                    c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype), None, length=REPS)
                    return c
                return jax.jit(fn)

            from functools import partial

            xla = looped(partial(attention_core, use_pallas=False))
            t_xla = timeit(xla, q, k, v) / REPS

            pal = looped(partial(attention_core, use_pallas=True))
            try:
                t_pal = timeit(pal, q, k, v) / REPS
                ratio = t_xla / t_pal
                verdict = "pallas" if ratio > 1.05 else ("xla" if ratio < 0.95 else "tie")
                print(f"{dtag} {tag:20s} B={b:5d} T={t:3d} H={h} hd={hd:3d}: "
                      f"xla {t_xla*1e3:7.2f} ms | pallas {t_pal*1e3:7.2f} ms | "
                      f"x{ratio:.2f} -> {verdict}")
            except Exception as e:
                print(f"{dtag} {tag:20s}: pallas FAILED {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()

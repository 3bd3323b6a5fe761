"""Stage-2 small-matmul attack (VERDICT r4 #6).

docs/PERF.md's per-stage table pins visformer stage 2 at 29.2 TF/s — the
weakest attention stage. The suspect is the attention core's MXU mapping at
these shapes (T=100 tokens, heads=6, head_dim=42): the QK^T contraction pads
42 -> 128 lanes (33% use) and the AV matmul's N=42 output pads the same way,
so ~2/3 of every MXU pass is zeros. This probe measures the candidate
remaps on the REAL chip at the exact stage-2 shapes (B x 10 x 10 x 256,
whole attention module: qkv Dense -> core -> out proj, shared weights):

  a. baseline     — the shipped einsum chain (bqhd,bkhd->bhqk / bhqk,bkhd->bqhd)
  b. bmm          — heads pre-transposed into the batch axis, explicit
                    jnp.matmul batched GEMMs (math-identical; tests whether
                    the moveaxis/einsum layout costs anything)
  c. pad64        — q/k/v zero-padded 42 -> 64 in head_dim before the core
                    (math-identical: zero lanes contribute 0 to QK^T; padded
                    v columns are sliced off after AV) — halves lane waste
                    IF XLA was not already padding optimally
  d. pad128       — same, padded to the full 128 lane width
  e. sol_1head*   — ONE 252-dim head (NOT math-preserving: the layout
                    speed-of-light — contraction dim fills ~2 lane tiles,
                    6x fewer, 6x bigger matmuls at identical total FLOPs)

Timing: lax.scan of REPS chained module applications (carry = activation),
scalar reduced in-program, host fetch forces completion (same harness as
tools/groupconv_probe.py). Equality of (a)-(d) asserted to 1e-2 on CPU-sized
inputs first.

Usage: python tools/stage2_probe.py [--quick]
Findings are recorded in docs/KERNELS.md (win wired or falsification row).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 32


def time_scan(fn, *args, n_timings=5):
    """ms per application of fn via a scan of REPS CHAINED calls (carry =
    activation, so the body cannot be hoisted as loop-invariant)."""
    import jax

    @jax.jit
    def prog(x, *rest):
        def body(c, _):
            y = fn(c, *rest)
            return y.astype(c.dtype), ()

        y, _ = jax.lax.scan(body, x, None, length=REPS)
        return y.mean()

    float(np.asarray(prog(*args)))  # compile + warm 1
    float(np.asarray(prog(*args)))  # warm 2
    best = min(
        (lambda t0: (float(np.asarray(prog(*args))), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(n_timings)
    )
    return best / REPS * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    from fewshot_vit_tpu.core.watchdog import watchdog_reexec
    watchdog_reexec(timeout_s=1800)

    import jax
    import jax.numpy as jnp

    # stage-2 micro shapes: dim=256, heads=6, head_dim=round(256//6)=42, T=100
    dim, heads, hd, hw = 256, 6, 42, 10
    t = hw * hw
    scale = hd ** -0.5
    batches = [512] if args.quick else [512, 2560]
    dtypes = [jnp.bfloat16] if args.quick else [jnp.float32, jnp.bfloat16]

    rng = np.random.default_rng(0)
    w_qkv = rng.normal(size=(dim, 3 * heads * hd), scale=0.05).astype(np.float32)
    w_proj = rng.normal(size=(heads * hd, dim), scale=0.05).astype(np.float32)
    # sol_1head: same parameter count, one 252-wide head
    w_qkv1 = rng.normal(size=(dim, 3 * heads * hd), scale=0.05).astype(np.float32)

    def split_qkv(x, w_qkv):
        b = x.shape[0]
        qkv = (x.reshape(b, t, dim) @ w_qkv.astype(x.dtype))
        qkv = qkv.reshape(b, t, 3, heads, hd)
        return jnp.moveaxis(qkv, 2, 0)  # q, k, v: (B, T, h, d)

    def finish(out, x, w_proj):  # out: (B, T, h*d)
        b = x.shape[0]
        return (out @ w_proj.astype(x.dtype)).reshape(b, hw, hw, dim)

    def baseline(x, w_qkv, w_proj):
        q, k, v = split_qkv(x, w_qkv)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        return finish(out.reshape(x.shape[0], t, heads * hd), x, w_proj)

    def bmm(x, w_qkv, w_proj):
        b = x.shape[0]
        q, k, v = split_qkv(x, w_qkv)
        q = q.transpose(0, 2, 1, 3).reshape(b * heads, t, hd)
        k = k.transpose(0, 2, 1, 3).reshape(b * heads, t, hd)
        v = v.transpose(0, 2, 1, 3).reshape(b * heads, t, hd)
        attn = jax.nn.softmax(jnp.matmul(q, k.transpose(0, 2, 1)) * scale, axis=-1)
        out = jnp.matmul(attn, v).reshape(b, heads, t, hd)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, heads * hd)
        return finish(out, x, w_proj)

    def padded(x, w_qkv, w_proj, dpad):
        b = x.shape[0]
        q, k, v = split_qkv(x, w_qkv)
        pad = ((0, 0), (0, 0), (0, 0), (0, dpad - hd))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)[..., :hd]
        return finish(out.reshape(b, t, heads * hd), x, w_proj)

    def sol_1head(x, w_qkv, w_proj):
        b = x.shape[0]
        d1 = heads * hd  # 252
        qkv = (x.reshape(b, t, dim) @ w_qkv.astype(x.dtype)).reshape(b, t, 3, d1)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        attn = jax.nn.softmax(
            jnp.einsum("bqd,bkd->bqk", q, k) * (d1 ** -0.5), axis=-1)
        out = jnp.einsum("bqk,bkd->bqd", attn, v)
        return finish(out, x, w_proj)

    # correctness: (b)-(d) must equal (a)
    xs = jnp.asarray(rng.normal(size=(8, hw, hw, dim)), jnp.float32)
    ref = np.asarray(baseline(xs, jnp.asarray(w_qkv), jnp.asarray(w_proj)))
    for name, got in [
        ("bmm", np.asarray(bmm(xs, jnp.asarray(w_qkv), jnp.asarray(w_proj)))),
        ("pad64", np.asarray(padded(xs, jnp.asarray(w_qkv), jnp.asarray(w_proj), 64))),
        ("pad128", np.asarray(padded(xs, jnp.asarray(w_qkv), jnp.asarray(w_proj), 128))),
    ]:
        err = np.abs(got - ref).max()
        assert err < 1e-2, (name, err)
        print(f"equality {name}: max|diff|={err:.2e}")

    for dtype in dtypes:
        for b in batches:
            x = jnp.asarray(rng.normal(size=(b, hw, hw, dim)), dtype)
            wq, wp = jnp.asarray(w_qkv, dtype), jnp.asarray(w_proj, dtype)
            wq1 = jnp.asarray(w_qkv1, dtype)
            rows = [
                ("baseline_einsum", lambda: time_scan(baseline, x, wq, wp)),
                ("bmm_headbatch", lambda: time_scan(bmm, x, wq, wp)),
                ("pad64", lambda: time_scan(
                    lambda xx, a, c: padded(xx, a, c, 64), x, wq, wp)),
                ("pad128", lambda: time_scan(
                    lambda xx, a, c: padded(xx, a, c, 128), x, wq, wp)),
                ("sol_1head*", lambda: time_scan(sol_1head, x, wq1, wp)),
            ]
            print(f"\n-- dtype={jnp.dtype(dtype).name} B={b} "
                  f"(T={t}, heads={heads}, hd={hd}) --")
            for name, fn in rows:
                print(f"{name:20s} {fn():8.3f} ms")


if __name__ == "__main__":
    main()

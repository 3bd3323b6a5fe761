"""Stage-1 grouped-conv MFU attack (VERDICT r2 #8).

docs/PERF.md argues visformer stage 1 is capped at ~25% lane use because its
group=8 3x3 convs give every MXU pass a 32-wide output tile. This probe
measures the untried layouts on the REAL chip at the stage-1 shapes
(B x 20 x 20 x 256, 8 groups of 32):

  a. baseline       — feature_group_count=8 conv (what the model runs)
  b. batch_group    — groups folded into the batch axis + batch_group_count=8
                      (math-identical: per-group filters preserved)
  c. stencil_dense  — 9-shifted-matmul stencil with a DENSE 256x256 weight per
                      tap, block-zeroed (8x the FLOPs, full MXU lanes)
  d. stencil_block  — 9-shifted einsum with block-diagonal (8,32,32) weights
  e. shared_smallconv — groups into batch + ONE shared 32->32 conv (NOT
                      math-preserving; the pure layout speed-of-light)

Timing: lax.scan of REPS applications inside one jitted program, result
reduced to a scalar in-program, host fetch forces completion (axon relay
rules — see the verify skill). Equality of (a)-(d) is asserted to 1e-2.

Usage: python tools/groupconv_probe.py [--quick]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# enough chained applications that the axon relay's ~10-25 ms per-launch
# cost is <3% of the measured window even for the fastest layout
REPS = 32


def time_scan(fn, *args, n_timings=5):
    """ms per application of fn, measured as a scan of REPS CHAINED calls.

    The carry is the activation itself (every layout here maps (B,H,W,C) ->
    (B,H,W,C)), so each iteration's input depends on the previous output —
    a loop-INVARIANT body (`fn(*a)` ignoring the carry) gets hoisted out of
    the while loop by XLA and times one application plus launch overhead."""
    import jax

    @jax.jit
    def prog(x, *rest):
        def body(c, _):
            y = fn(c, *rest)
            return y.astype(c.dtype), ()

        y, _ = jax.lax.scan(body, x, None, length=REPS)
        return y.mean()

    float(np.asarray(prog(*args)))  # compile + warm 1
    float(np.asarray(prog(*args)))  # warm 2 (relay one-time costs)
    best = min(
        (lambda t0: (float(np.asarray(prog(*args))), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(n_timings)
    )
    return best / REPS * 1e3  # ms per application


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    from fewshot_vit_tpu.core.watchdog import watchdog_reexec
    watchdog_reexec(timeout_s=1800)

    import jax
    import jax.numpy as jnp

    g, cg = 8, 32
    c = g * cg  # 256
    h = w = 20
    batches = [512] if args.quick else [512, 2560]
    dtypes = [jnp.bfloat16] if args.quick else [jnp.float32, jnp.bfloat16]

    rng = np.random.default_rng(0)
    wg = rng.normal(size=(3, 3, cg, c), scale=0.05).astype(np.float32)  # grouped rhs
    # dense 256x256 per tap, zero outside the diagonal blocks
    wd = np.zeros((3, 3, c, c), np.float32)
    for k in range(g):
        wd[:, :, k * cg:(k + 1) * cg, k * cg:(k + 1) * cg] = (
            wg[:, :, :, k * cg:(k + 1) * cg])
    wb = np.stack([wd[:, :, k * cg:(k + 1) * cg, k * cg:(k + 1) * cg]
                   for k in range(g)], axis=2)  # (3,3,g,cg,cg)
    ws = wg[:, :, :, :cg]  # shared small conv

    dn = jax.lax.conv_dimension_numbers((1, h, w, c), (3, 3, cg, c),
                                        ("NHWC", "HWIO", "NHWC"))

    def baseline(x, wg):
        return jax.lax.conv_general_dilated(
            x, wg.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=g)

    def batch_group(x, wg):
        b = x.shape[0]
        # (B,H,W,g,cg) -> group-major batch (g*B,H,W,cg)
        xg = x.reshape(b, h, w, g, cg).transpose(3, 0, 1, 2, 4).reshape(g * b, h, w, cg)
        dn2 = jax.lax.conv_dimension_numbers((g * b, h, w, cg), (3, 3, cg, c),
                                             ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xg, wg.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn2,
            batch_group_count=g)  # (B, H, W, c): feature block k from batch group k
        return y

    def stencil(x, w_tap, block):
        b = x.shape[0]
        pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for di in range(3):
            for dj in range(3):
                win = pad[:, di:di + h, dj:dj + w, :]
                if block:
                    t = jnp.einsum("bhwgc,gcd->bhwgd",
                                   win.reshape(b, h, w, g, cg),
                                   w_tap[di, dj].astype(x.dtype),
                                   preferred_element_type=x.dtype)
                    t = t.reshape(b, h, w, c)
                else:
                    t = win @ w_tap[di, dj].astype(x.dtype)
                out = t if out is None else out + t
        return out

    def shared_smallconv(x, ws):
        b = x.shape[0]
        xg = x.reshape(b, h, w, g, cg).transpose(0, 3, 1, 2, 4).reshape(b * g, h, w, cg)
        dn3 = jax.lax.conv_dimension_numbers((b * g, h, w, cg), (3, 3, cg, cg),
                                             ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xg, ws.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn3)
        return y.reshape(b, g, h, w, cg).transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)

    # correctness: (b)-(d) must equal (a)
    xs = jnp.asarray(rng.normal(size=(8, h, w, c)), jnp.float32)
    ref = np.asarray(baseline(xs, jnp.asarray(wg)))
    for name, got in [
        ("batch_group", np.asarray(batch_group(xs, jnp.asarray(wg)))),
        ("stencil_dense", np.asarray(stencil(xs, jnp.asarray(wd), False))),
        ("stencil_block", np.asarray(stencil(xs, jnp.asarray(wb), True))),
    ]:
        err = np.abs(got - ref).max()
        assert err < 1e-2, (name, err)
        print(f"equality {name}: max|diff|={err:.2e}")

    for dtype in dtypes:
        for b in batches:
            x = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
            rows = [
                ("baseline_group8", lambda: time_scan(baseline, x, jnp.asarray(wg, dtype))),
                ("batch_group", lambda: time_scan(batch_group, x, jnp.asarray(wg, dtype))),
                ("stencil_dense", lambda: time_scan(
                    lambda xx, ww: stencil(xx, ww, False), x, jnp.asarray(wd, dtype))),
                ("stencil_block", lambda: time_scan(
                    lambda xx, ww: stencil(xx, ww, True), x, jnp.asarray(wb, dtype))),
                ("shared_smallconv*", lambda: time_scan(shared_smallconv, x, jnp.asarray(ws, dtype))),
            ]
            print(f"\n-- dtype={jnp.dtype(dtype).name} B={b} (20x20x256, g=8) --")
            for name, fn in rows:
                print(f"{name:20s} {fn():8.3f} ms")


if __name__ == "__main__":
    main()

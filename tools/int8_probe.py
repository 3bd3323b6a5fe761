"""int8 quantization headroom probe: raw MXU throughput at eval-path shapes.

docs/PERF.md concludes the bf16 eval path sits at this architecture's
measured single-chip ceiling (~43.7 TF/s). The one untried precision lever
is int8: the v5e MXU's int8 path has 2x the peak of bf16. This probe
answers the PREREQUISITE question only — does XLA:TPU actually deliver
int8 speedups at the visformer's shapes, or do the small tiles /grouped
convs that cap bf16 MFU cap int8 identically? It times the four
representative ops of the stage table (docs/PERF.md) in bf16 vs int8
(int32 accumulation, requantized carry):

  a. stem 3x3 conv 64 -> 256 @ 40x40       (the near-roofline conv)
  b. grouped 3x3 conv g=8, 256ch @ 20x20   (stage 1's lane-packing cap)
  c. qkv dense 256 -> 756 @ T=100          (stage 2 projection)
  d. mlp dense 512 -> 2048 @ T=25          (stage 3, best-mapped)

This is a LAYOUT/THROUGHPUT probe, not a quantization implementation:
no calibration, no accuracy claim — if the speedups are real, wiring a
quantized eval path (per-channel scales + accuracy gate on real data)
becomes a justified follow-up; if not, the lever is falsified cheaply.

Usage: python tools/int8_probe.py [--quick]
Findings go to docs/KERNELS.md.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 32


def time_scan(fn, x0, *rest, n_timings=5):
    """ms per application; scan of REPS chained calls (carry = activation,
    output cast back to the carry dtype so the body cannot be hoisted)."""
    import jax

    @jax.jit
    def prog(x, *args):
        def body(c, _):
            y = fn(c, *args)
            return y.astype(c.dtype), ()

        y, _ = jax.lax.scan(body, x, None, length=REPS)
        return y.astype(np.float32).mean()

    float(np.asarray(prog(x0, *rest)))
    float(np.asarray(prog(x0, *rest)))
    best = min(
        (lambda t0: (float(np.asarray(prog(x0, *rest))), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(n_timings)
    )
    return best / REPS * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    from fewshot_vit_tpu.core.watchdog import watchdog_reexec
    watchdog_reexec(timeout_s=1800)

    import jax
    import jax.numpy as jnp

    b = 512 if args.quick else 2560
    rng = np.random.default_rng(0)

    def conv_case(h, w, cin, cout, groups):
        x = rng.integers(-80, 80, (b, h, w, cin)).astype(np.int8)
        wk = rng.integers(-80, 80, (3, 3, cin // groups, cout)).astype(np.int8)
        # 1x1 back-projection restores the carry shape when cin != cout
        # (counted in FLOPs; the requant between them is the shift a real
        # int8 pipeline pays between layers)
        wp = rng.integers(-80, 80, (1, 1, cout, cin)).astype(np.int8)
        dn = jax.lax.conv_dimension_numbers(
            (b, h, w, cin), wk.shape, ("NHWC", "HWIO", "NHWC"))

        def requant(y, like):
            return (y >> 7).astype(like) if like == jnp.int8 else (y * 0.01).astype(like)

        def run(xx, ww, wwp):
            acc = jnp.int32 if xx.dtype == jnp.int8 else jnp.float32
            y = jax.lax.conv_general_dilated(
                xx, ww, (1, 1), "SAME", dimension_numbers=dn,
                feature_group_count=groups, preferred_element_type=acc)
            if cin == cout and groups > 1:
                return y if acc == jnp.float32 else (y >> 7)
            y = requant(y, xx.dtype)
            dn2 = jax.lax.conv_dimension_numbers(
                (b, h, w, cout), wwp.shape, ("NHWC", "HWIO", "NHWC"))
            z = jax.lax.conv_general_dilated(
                y, wwp, (1, 1), "SAME", dimension_numbers=dn2,
                preferred_element_type=acc)
            return z if acc == jnp.float32 else (z >> 7)

        flops = 2 * b * h * w * (cin // groups) * cout * 9
        if not (cin == cout and groups > 1):
            flops += 2 * b * h * w * cout * cin
        return x, (wk, wp), run, flops

    def dense_case(t, cin, cout):
        x = rng.integers(-80, 80, (b, t, cin)).astype(np.int8)
        wk = rng.integers(-80, 80, (cin, cout)).astype(np.int8)

        # back-projection cout->cin keeps the carry at x's shape so the
        # chained scan cannot hoist the timed matmul
        wb = rng.integers(-80, 80, (cout, cin)).astype(np.int8)

        def run2(xx, ww, wwb):
            acc = jnp.int32 if xx.dtype == jnp.int8 else jnp.float32
            y = jax.lax.dot_general(
                xx, ww, (((2,), (0,)), ((), ())), preferred_element_type=acc)
            y = (y >> 7).astype(xx.dtype) if xx.dtype == jnp.int8 else (y * 0.01).astype(xx.dtype)
            z = jax.lax.dot_general(
                y, wwb, (((2,), (0,)), ((), ())), preferred_element_type=acc)
            return (z >> 7) if xx.dtype == jnp.int8 else z * 0.01

        return x, (wk, wb), run2, 2 * b * t * cin * cout * 2

    cases = [
        ("stem_conv 64->256 @40x40", conv_case(40, 40, 64, 256, 1)),
        ("group8_conv 256 @20x20", conv_case(20, 20, 256, 256, 8)),
        ("qkv_dense 256->756 @T100", dense_case(100, 256, 756)),
        ("mlp_dense 512->2048 @T25", dense_case(25, 512, 2048)),
    ]
    print(f"B={b}; ms per application, scan of {REPS} chained calls")
    print(f"{'op':28s} {'bf16 ms':>9} {'int8 ms':>9} {'speedup':>8} "
          f"{'int8 TOP/s':>11}")
    for name, (x, wk, run, flops) in cases:
        if isinstance(wk, tuple):
            args8 = (jnp.asarray(x),) + tuple(jnp.asarray(w) for w in wk)
            argsb = (jnp.asarray(x, jnp.bfloat16),) + tuple(
                jnp.asarray(w, jnp.bfloat16) for w in wk)
        else:
            args8 = (jnp.asarray(x), jnp.asarray(wk))
            argsb = (jnp.asarray(x, jnp.bfloat16), jnp.asarray(wk, jnp.bfloat16))
        ms_b = time_scan(run, *argsb)
        ms_8 = time_scan(run, *args8)
        tops = flops / (ms_8 * 1e-3) / 1e12
        print(f"{name:28s} {ms_b:9.3f} {ms_8:9.3f} {ms_b / ms_8:7.2f}x "
              f"{tops:10.1f}")


if __name__ == "__main__":
    main()

"""Phase-2 SUN step decomposition: attribute the step time to components.

Builds a ladder of cumulative scan programs — dual-view augmentation only,
+frozen-teacher forward, +soft-label generation, +student train-mode forward,
then the real full step (adds value_and_grad backward + AdamW update) — and
times each as a 10-step ``lax.scan`` at batch 512 / visformer_micro_80 (the
``tools/train_probe.py`` methodology: one program, double-warm, fetch-forced,
min over ``--repeats``; see docs/PERF.md for why min-of-N on this box).

Successive differences attribute the cost. Run:
    python tools/sun_decomp_probe.py [--repeats N] [--bf16] [--teacher-bf16]
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
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--teacher-bf16", action="store_true",
                    help="bf16 teacher under the current student dtype "
                         "(the `teacher_dtype: bfloat16` config knob)")
    args = ap.parse_args()
    watchdog_reexec(timeout_s=1800)
    import jax
    import jax.numpy as jnp
    import optax

    from fewshot_vit_tpu.core import models
    from fewshot_vit_tpu.core.rng import enable_compilation_cache
    import fewshot_vit_tpu.models  # noqa: F401
    import fewshot_vit_tpu.heads  # noqa: F401
    from fewshot_vit_tpu.data.augment import make_dual_view_fn
    from fewshot_vit_tpu.ops.token_label import (
        generate_soft_label,
        soft_target_cross_entropy,
    )
    from fewshot_vit_tpu.train.state import TrainState
    from fewshot_vit_tpu.train.steps import make_sun_step

    enable_compilation_cache()
    B, n_classes, N_STEPS = 512, 64, 10
    rng_np = np.random.default_rng(0)
    images = jax.device_put(
        rng_np.integers(0, 256, (B, 84, 84, 3), dtype=np.uint8))
    labels = jax.device_put(
        rng_np.integers(0, n_classes, (B,), dtype=np.int64).astype(np.int32))
    tx = optax.adamw(1e-3)
    dv = make_dual_view_fn()

    kw = {"dtype": jnp.bfloat16} if args.bf16 else {}
    student = models.make("token-label", encoder="visformer_micro_80",
                          classifier_args={"n_classes": n_classes}, **kw)
    t_kw = {"dtype": jnp.bfloat16} if (args.bf16 or args.teacher_bf16) else {}
    teacher = models.make("token-label", encoder="visformer_micro_80",
                          classifier_args={"n_classes": n_classes}, **t_kw)
    with jax.default_device(jax.devices("cpu")[0]):
        sv = student.init(jax.random.key(1), jnp.zeros((1, 80, 80, 3)))
    sv = jax.device_put(sv)
    state = TrainState.create(sv, tx)
    tvars = {"params": sv["params"]}
    if sv.get("batch_stats"):
        tvars["batch_stats"] = sv["batch_stats"]

    def timed(name, body):
        """body(acc, key) -> acc; scan N_STEPS in one program, min-of-repeats."""
        keys = jax.random.split(jax.random.key(0), N_STEPS)

        @jax.jit
        def program(keys):
            acc, _ = jax.lax.scan(
                lambda a, k: (body(a, k), None), jnp.float32(0.0), keys)
            return acc

        np.asarray(program(keys))
        np.asarray(program(keys))
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(program(keys))
            times.append((time.perf_counter() - t0) / N_STEPS)
        t = min(times)
        print(f"{name:28s}: {t*1e3:7.1f} ms/step   "
              + " ".join(f"{x*1e3:.0f}" for x in times), flush=True)
        return t

    def aug(a, k):
        strong, weak = dv(images, jax.random.fold_in(k, 7))
        return a + jnp.float32(jnp.mean(strong) + jnp.mean(weak))

    def teacher_fwd(a, k):
        strong, weak = dv(images, jax.random.fold_in(k, 7))
        y_token_t, _, _ = teacher.apply(tvars, weak, train=False,
                                        is_teacher=True)
        return a + jnp.float32(jnp.mean(strong)) + jnp.mean(
            y_token_t.astype(jnp.float32))

    def soft_label(a, k):
        strong, weak = dv(images, jax.random.fold_in(k, 7))
        y_token_t, _, _ = teacher.apply(tvars, weak, train=False,
                                        is_teacher=True)
        b, h, w, c = y_token_t.shape
        soft = generate_soft_label(
            y_token_t.reshape(b, h * w, c).astype(jnp.float32))
        return a + jnp.float32(jnp.mean(strong)) + jnp.mean(soft)

    def student_fwd(a, k):
        strong, weak = dv(images, jax.random.fold_in(k, 7))
        y_token_t, _, _ = teacher.apply(tvars, weak, train=False,
                                        is_teacher=True)
        b, h, w, c = y_token_t.shape
        soft = generate_soft_label(
            y_token_t.reshape(b, h * w, c).astype(jnp.float32))
        (y_token, y, _), _ = student.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            strong, train=True, mutable=["batch_stats"],
            rngs={"droppath": k, "dropout": jax.random.fold_in(k, 1)})
        cls_loss = optax.softmax_cross_entropy_with_integer_labels(
            y.astype(jnp.float32), labels).mean()
        token_loss = soft_target_cross_entropy(
            y_token.reshape(b, h * w, c + 1).astype(jnp.float32), soft)
        return a + cls_loss + token_loss

    t_aug = timed("dual-view aug", aug)
    t_teacher = timed("+ teacher fwd", teacher_fwd)
    t_soft = timed("+ soft labels", soft_label)
    t_fwd = timed("+ student fwd (no grad)", student_fwd)

    sun = make_sun_step(student, teacher, tx, dual_view_fn=dv, jit=False)

    def full(carry, k):
        s, acc = carry
        s, m = sun(s, tvars, images, images, labels, k)
        return (s, acc + m["loss"]), None

    keys = jax.random.split(jax.random.key(0), N_STEPS)

    @jax.jit
    def full_program(state, keys):
        (s, acc), _ = jax.lax.scan(full, (state, jnp.float32(0.0)), keys)
        return acc

    np.asarray(full_program(state, keys))
    np.asarray(full_program(state, keys))
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        np.asarray(full_program(state, keys))
        times.append((time.perf_counter() - t0) / N_STEPS)
    t_full = min(times)
    print(f"{'full step (fwd+bwd+adamw)':28s}: {t_full*1e3:7.1f} ms/step   "
          + " ".join(f"{x*1e3:.0f}" for x in times), flush=True)

    print("\nattribution (successive diffs):")
    print(f"  dual-view augmentation : {t_aug*1e3:7.1f} ms")
    print(f"  teacher forward        : {(t_teacher-t_aug)*1e3:7.1f} ms")
    print(f"  soft-label generation  : {(t_soft-t_teacher)*1e3:7.1f} ms")
    print(f"  student fwd            : {(t_fwd-t_soft)*1e3:7.1f} ms")
    print(f"  backward + optimizer   : {(t_full-t_fwd)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()

"""Profile the device-side augmentation pipeline component by component.

Times each stage of the phase-1 ``cropaug`` pipeline (and the SUN dual-view)
on the real TPU at batch 512, 84x84 uint8 inputs -> 80x80, steady-state,
forced by host fetch of a reduced scalar.

Run: python tools/aug_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fewshot_vit_tpu.data import augment as A
from fewshot_vit_tpu.data.transforms import MEAN, STD

B, H, W, OUT = 512, 84, 84, 80


def bench(name, fn, *args, iters=20):
    # force a host fetch of an in-program scalar: on this box
    # block_until_ready does not wait for the axon relay (see perf_probe.py)
    f = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), 0.0))
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = f(*args)
    np.asarray(s)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:28s} {dt:8.2f} ms  ({B / dt * 1000:8.0f} img/s)")
    return dt


def main():
    from fewshot_vit_tpu.core.watchdog import watchdog_reexec
    watchdog_reexec(timeout_s=1800)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))
    x80 = jnp.asarray(rng.random((B, OUT, OUT, 3), dtype=np.float32) * 255)
    key = jax.random.key(0)

    bench("rrc", lambda k, im: A.random_resized_crop(k, im, OUT), key, imgs)
    bench("flip", A.horizontal_flip, key, x80)
    bench("randaugment(2 layers)", A.rand_augment, key, x80)
    bench("erasing", A.random_erasing, key, x80)
    bench("normalize", lambda x: A._normalize_255(x, MEAN, STD), x80)
    fn = A.make_cropaug_fn()
    bench("FULL cropaug", fn, imgs, key)
    dv = A.make_dual_view_fn()
    bench("FULL dual-view", dv, imgs, key)
    # individual RA branches (forced op index)
    for i, name in enumerate(A._RA_OPS):
        mag = jnp.full((B,), 9.0)
        sign = jnp.ones((B,))
        bench(f"  RA[{name}]",
              lambda x, m, s, i=i: A._ra_apply(jnp.asarray(i), x, m, s),
              x80, mag, sign)
    bench("color_jitter", A.color_jitter, key, x80)
    bench("gaussian_blur", A.gaussian_blur, key, x80)
    bench("equalize", A.equalize, x80)


if __name__ == "__main__":
    main()

"""SUN-D patch pipelines: fcn / grid / sampling (device-side).

Re-design of ``meta_tuning_sun_d/Models/dataloader/*/{fcn,grid,sampling}``
(the reference vendors 15 near-identical dataset x mode loader classes; here
each mode is ONE batched jnp function applied to any dataset):

  * ``fcn``: the plain image — nodes come from the encoder's dense map;
  * ``grid``: an image pyramid of overlapping grid cells — for each g in
    ``patch_list`` (default (2, 3)), g*g cells whose size is scaled by
    ``ratio`` around the cell center (train: ratio ~ U[1, 3); eval: fixed
    ``patch_ratio`` 2), each resized to the model size -> 4+9=13 patches
    (``grid/mini_imagenet.py:78-148``);
  * ``sampling``: ``num_patch`` (9) independent RandomResizedCrops
    (``sampling/mini_imagenet.py:52-58``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .augment import random_resized_crop


def _grid_boxes(size: int, num_grid: int, ratio) -> Tuple[jax.Array, jax.Array]:
    """Start/end coordinates of ``num_grid`` enlarged cells along one axis
    (reference ``get_grid_location``): cell centers at raw-grid centers,
    extent = (size/num_grid) * ratio, clipped to the image."""
    raw = size / num_grid
    centers = raw / 2 + raw * jnp.arange(num_grid, dtype=jnp.float32)
    half = (raw * ratio) / 2.0
    lo = jnp.maximum(0.0, centers - half)
    hi = jnp.minimum(float(size), centers + half)
    return lo, hi


def grid_patches(
    images: jax.Array,
    patch_list: Sequence[int] = (2, 3),
    ratio=2.0,
    out_size: int = 80,
) -> jax.Array:
    """(B, H, W, 3) uint8/float -> (B, sum(g^2), out, out, 3) float [0,255].

    ``ratio`` may be a traced scalar (train-time random U[1,3))."""
    b, h, w = images.shape[:3]
    imgs = images.astype(jnp.float32)
    patches = []
    for g in patch_list:
        lo_y, hi_y = _grid_boxes(h, g, ratio)
        lo_x, hi_x = _grid_boxes(w, g, ratio)
        for i in range(g):
            for j in range(g):
                y0, y1 = lo_y[i], hi_y[i]
                x0, x1 = lo_x[j], hi_x[j]
                sy = out_size / (y1 - y0)
                sx = out_size / (x1 - x0)

                def crop(im, sy=sy, sx=sx, y0=y0, x0=x0):
                    return jax.image.scale_and_translate(
                        im, (out_size, out_size, 3), (0, 1),
                        jnp.stack([sy, sx]), jnp.stack([-y0 * sy, -x0 * sx]),
                        method="bilinear",
                    )

                patches.append(jax.vmap(crop)(imgs))
    return jnp.stack(patches, axis=1)


def sampling_patches(
    key: jax.Array,
    images: jax.Array,
    num_patch: int = 9,
    out_size: int = 80,
    scale: Tuple[float, float] = (0.08, 1.0),
) -> jax.Array:
    """(B, H, W, 3) -> (B, num_patch, out, out, 3): independent RRC crops."""
    keys = jax.random.split(key, num_patch)
    patches = [random_resized_crop(k, images, out_size, scale=scale) for k in keys]
    return jnp.stack(patches, axis=1)

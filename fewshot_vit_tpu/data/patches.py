"""SUN-D patch pipelines: fcn / grid / sampling (device-side).

Re-design of ``meta_tuning_sun_d/Models/dataloader/*/{fcn,grid,sampling}``
(the reference vendors 15 near-identical dataset x mode loader classes; here
each mode is ONE batched jnp function applied to any dataset):

  * ``fcn``: the plain image — nodes come from the encoder's dense map;
  * ``grid``: an image pyramid of overlapping grid cells — for each g in
    ``patch_list`` (default (2, 3)), g*g cells whose size is scaled by
    ``ratio`` around the cell center (train: ratio ~ U[1, 3) drawn fresh PER
    IMAGE and PER PYRAMID LEVEL, exactly like the reference's ``get_pyramid``
    which calls ``1+2*random.random()`` once per ``__getitem__`` per level;
    eval: fixed ``patch_ratio`` 2), each resized to the model size ->
    4+9=13 patches (``grid/mini_imagenet.py:78-148``);
  * ``sampling``: ``num_patch`` (9) independent RandomResizedCrops
    (``sampling/mini_imagenet.py:52-58``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .augment import random_resized_crop


def draw_grid_ratios(key: jax.Array, batch: int, n_levels: int) -> jax.Array:
    """Train-time grid ratios, one iid U[1, 3) draw per (image, level) —
    the reference's ``grid_ratio = 1+2*random.random()`` inside
    ``get_pyramid`` (``grid/mini_imagenet.py:104-110``), which runs once per
    image per pyramid level."""
    return 1.0 + 2.0 * jax.random.uniform(key, (batch, n_levels))


def _grid_boxes_exact(size: int, num_grid: int, ratio: float):
    """Host-side float64/int replica of the reference ``get_grid_location``
    (``grid/mini_imagenet.py:78-98``) for a STATIC ratio (the eval path's
    fixed ``patch_ratio``). Bit-exact including the boundary cases where
    ``size/g*ratio`` lands on an integer (e.g. 80/3*1.8 -> 48), which a
    float32 reproduction truncates one low. Returns (lo, hi) numpy (g,)."""
    import numpy as np

    raw = int(size / num_grid)
    enlarged = int(size / num_grid * ratio)
    half = enlarged // 2
    centers = raw // 2 + raw * np.arange(num_grid)
    lo = np.maximum(0, centers - half).astype(np.float32)
    hi = np.minimum(size, centers + half).astype(np.float32)
    return lo, hi


def _grid_boxes(size: int, num_grid: int, ratio) -> Tuple[jax.Array, jax.Array]:
    """Start/end coordinates of ``num_grid`` enlarged cells along one axis,
    reproducing the reference ``get_grid_location`` INTEGER arithmetic
    (``grid/mini_imagenet.py:78-98``): raw cell = int(size/g),
    enlarged = int(size/g*ratio), centers at raw//2 + raw*i, box =
    (max(0, c - enlarged//2), min(size, c + enlarged//2)).

    ``ratio`` may be a scalar or a traced array (leading per-image dims);
    the integer truncations become ``jnp.floor`` (all quantities >= 0) in
    float32 — exact except when ``size/g*ratio`` lands within f32 rounding
    of an integer, a measure-zero event for the train-time U[1,3) draws
    this traced path serves (static eval ratios take ``_grid_boxes_exact``).
    Returns (lo, hi) shaped ``ratio.shape + (num_grid,)``.
    """
    raw = int(size / num_grid)
    ratio = jnp.asarray(ratio, jnp.float32)
    enlarged = jnp.floor(size / num_grid * ratio)
    half = jnp.floor(enlarged / 2.0)
    centers = (raw // 2 + raw * jnp.arange(num_grid)).astype(jnp.float32)
    lo = jnp.maximum(0.0, centers - half[..., None])
    hi = jnp.minimum(float(size), centers + half[..., None])
    return lo, hi


def grid_patches(
    images: jax.Array,
    patch_list: Sequence[int] = (2, 3),
    ratio=2.0,
    out_size: int = 80,
) -> jax.Array:
    """(B, H, W, 3) uint8/float -> (B, sum(g^2), out, out, 3) float [0,255].

    ``ratio``: a scalar (eval: fixed ``patch_ratio`` for every image/level) or
    a (B, len(patch_list)) array (train: per-image, per-level U[1,3) draws
    from ``draw_grid_ratios``); either may be traced."""
    b, h, w = images.shape[:3]
    imgs = images.astype(jnp.float32)
    # static scalar ratio (eval's fixed patch_ratio): exact host integer math
    static_ratio = float(ratio) if isinstance(ratio, (int, float)) else None
    if static_ratio is None:
        ratio = jnp.asarray(ratio, jnp.float32)
        if ratio.ndim == 0:
            ratio = jnp.broadcast_to(ratio, (b, len(patch_list)))
        if ratio.shape != (b, len(patch_list)):
            raise ValueError(
                f"ratio shape {ratio.shape} != ({b}, {len(patch_list)}) (B, n_levels)"
            )

    def crop(im, sy, sx, y0, x0):
        return jax.image.scale_and_translate(
            im, (out_size, out_size, 3), (0, 1),
            jnp.stack([sy, sx]), jnp.stack([-y0 * sy, -x0 * sx]),
            method="bilinear",
        )

    patches = []
    for li, g in enumerate(patch_list):
        if static_ratio is not None:
            ly, hy = _grid_boxes_exact(h, g, static_ratio)  # (g,)
            lx, hx = _grid_boxes_exact(w, g, static_ratio)
            lo_y, hi_y = (jnp.broadcast_to(jnp.asarray(a), (b, g)) for a in (ly, hy))
            lo_x, hi_x = (jnp.broadcast_to(jnp.asarray(a), (b, g)) for a in (lx, hx))
        else:
            r = ratio[:, li]  # (B,)
            lo_y, hi_y = _grid_boxes(h, g, r)  # (B, g)
            lo_x, hi_x = _grid_boxes(w, g, r)
        for i in range(g):
            for j in range(g):
                y0, y1 = lo_y[:, i], hi_y[:, i]
                x0, x1 = lo_x[:, j], hi_x[:, j]
                sy = out_size / (y1 - y0)
                sx = out_size / (x1 - x0)
                patches.append(jax.vmap(crop)(imgs, sy, sx, y0, x0))
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

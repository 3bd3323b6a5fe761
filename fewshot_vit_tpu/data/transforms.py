"""Image transforms, split host/device the TPU way.

Host side (one-time, at dataset load): decode + deterministic geometry
(the reference eval protocol Resize(88,88) -> CenterCrop(80), PIL bicubic —
``test_phase/datasets/mini_imagenet.py:51-52``). Images are then held as uint8
(N, 80, 80, 3) arrays.

Device side (inside the jitted step): uint8 -> float normalize with ImageNet
stats, plus the stochastic augmentation pipeline (see ``augment.py``). Feeding
uint8 to the device cuts host->device bandwidth 4x vs float32.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# ImageNet normalization (reference ``datasets/mini_imagenet.py:151-152``)
MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)
# CIFAR-FS stats (reference ``datasets/cifar_fs.py:138-139``)
CIFAR_MEAN = np.array([0.5071, 0.4867, 0.4408], np.float32)
CIFAR_STD = np.array([0.2675, 0.2565, 0.2761], np.float32)


def normalize(x: jax.Array, mean=MEAN, std=STD, dtype=jnp.float32) -> jax.Array:
    """uint8 (..., H, W, 3) -> normalized float (device-side, fuses into jit)."""
    x = x.astype(dtype) / jnp.asarray(255.0, dtype)
    return (x - jnp.asarray(mean, dtype)) / jnp.asarray(std, dtype)


def denormalize(x: jax.Array, mean=MEAN, std=STD) -> jax.Array:
    """Inverse of ``normalize`` (reference ``convert_raw``)."""
    return x * jnp.asarray(std, x.dtype) + jnp.asarray(mean, x.dtype)


def resize_center_crop(img_np: np.ndarray, resize: int = 88, crop: int = 80) -> np.ndarray:
    """Host-side eval geometry: PIL bicubic Resize((r,r)) + CenterCrop(c).

    Bit-compatible with the reference eval pipeline (torchvision Resize uses
    PIL bicubic for PIL inputs).
    """
    from PIL import Image

    im = Image.fromarray(img_np).resize((resize, resize), Image.BICUBIC)
    left = (resize - crop) // 2
    return np.asarray(im.crop((left, left, left + crop, left + crop)), np.uint8)


def resize_short(img_np: np.ndarray, size: int = 80) -> np.ndarray:
    """Host-side Resize(size) (short side), PIL bicubic... reference train-phase
    default transform is Resize(image_size) on square inputs -> exact (s,s)."""
    from PIL import Image

    im = Image.fromarray(img_np)
    w, h = im.size
    if w <= h:
        new = (size, max(1, round(h * size / w)))
    else:
        new = (max(1, round(w * size / h)), size)
    return np.asarray(im.resize(new, Image.BICUBIC), np.uint8)

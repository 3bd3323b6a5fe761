"""Device-side image augmentation (pure JAX, fuses into the jitted train step).

Re-designs the reference's host-side PIL/timm pipelines
(``sun_meta_training/datasets/mini_imagenet.py:78-124``) as batched TPU ops:

  * ``random_resized_crop`` — RandomResizedCropAndInterpolation(80,
    scale=(0.08,1), ratio=(3/4,4/3)), bilinear on device (PIL uses bicubic;
    the resampling filter is a statistical, not semantic, difference);
  * ``rand_augment`` — timm ``rand-m9-mstd0.5-inc1``: 2 ops/image from the
    15-op increasing-severity set, magnitude ~ N(9, 0.5) in [0,10], each op
    applied with prob 0.5;
  * ``color_jitter / gaussian_blur / solarize / grayscale`` — the strong-view
    extras (``build_transform_strong_part``);
  * ``random_erasing`` — timm 'pixel' mode on the normalized tensor;
  * ``make_dual_view_fn`` — the SUN location-aware dual view: ONE crop, weak
    view = crop(+flip+randaug p=0.2), strong view derived FROM the weak view
    (``mini_imagenet.py:194-204``) so spatial alignment with the teacher holds;
  * ``make_cropaug_fn`` — timm ``create_transform`` equivalent for phase-1
    (RRC + flip + RandAugment + random erasing).

All ops take uint8-or-float images in [0,255], are vmapped over the batch with
per-image keys, use only static shapes, and end with normalization — so the
whole pipeline compiles into the training program (the reference burns 8 host
worker processes per loader on this; here it rides the VPU).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import MEAN, STD

# PIL-style luminance (ITU-R 601-2)
_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)
# timm fill color for geometric ops: round(255 * IMAGENET_MEAN)
_FILL = jnp.array([124.0, 116.0, 104.0], jnp.float32)


def _gray(x: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 1) luminance."""
    return jnp.sum(x * _LUMA, axis=-1, keepdims=True)


def _blend(a: jax.Array, b: jax.Array, factor: jax.Array) -> jax.Array:
    """PIL ImageEnhance: b + factor * (a - b), clipped to [0, 255]."""
    return jnp.clip(b + factor * (a - b), 0.0, 255.0)


# --- geometric ----------------------------------------------------------------


def _row_shift_bilinear(x: jax.Array, t: jax.Array,
                        max_shift: Optional[float] = None) -> jax.Array:
    """1-D bilinear resample of every row: ``out[b,h,j] = x[b,h, j + t[b,h]]``.

    The TPU-native core of the affine ops. A generic 2-D gather serializes on
    TPU (measured 133 ms for a batch-512 rotate, ~20-40 ms even as per-row
    dynamic-slice DMAs); but every RandAugment affine is, per row, a *constant*
    source shift — so the resample is a banded 0/1 selection matrix applied on
    the MXU (~3 ms). Exactness: the selection matrix is 0/1 (exact in the
    MXU's bf16 operand format) and the image rides in as a hi+lo bf16 split,
    so the fp32 result is exact to ~2^-18 * 255 ~= 1e-3 gray levels. The two
    bilinear taps are one matmul over channel-stacked shifted copies.
    Edge semantics are PIL's (Geometry.c): a sample is INSIDE iff its center
    +0.5 lies in [0, W); inside samples' bilinear taps CLAMP to the border
    pixel (no fill bleed), outside samples take the timm fill color outright.

    ``max_shift`` (static) bounds |t| and sets the edge-pad width — callers
    that know their shift range (all the RandAugment ops do) shrink the
    selection matrix, the dominant HBM transient, by 2-3x. Default pads the
    full W-1: shifts that large produce an (almost) all-fill image anyway.
    """
    b, h, w, c = x.shape
    pad = w if max_shift is None else min(int(math.ceil(max_shift)) + 1, w)
    x = x.astype(jnp.float32)
    # PIL inside test, from the UNCLIPPED shift (clipping below never binds
    # for callers that pass a true max_shift; this keeps the mask exact)
    sx = t[..., None] + jnp.arange(w, dtype=jnp.float32)  # (B, H, W)
    inside = (sx + 0.5 >= 0.0) & (sx + 0.5 < w)
    # edge-replicate padding = PIL's tap clamping at the border
    edge_l = jnp.broadcast_to(x[:, :, :1], (b, h, pad, c))
    edge_r = jnp.broadcast_to(x[:, :, -1:], (b, h, pad, c))
    xp = jnp.concatenate([edge_l, x, edge_r], axis=2)  # (B, H, W+2*pad, C)
    t = jnp.clip(t, -(pad - 1.0), pad - 1.0)
    k = jnp.floor(t)
    f = (t - k)[..., None, None]
    start = k.astype(jnp.int32) + pad  # in [1, 2*pad-1]; start + W <= W+2*pad-1

    # P[b,h,j,s] = [s == start + j] — the integer-shift selection matrix
    cols = jnp.arange(w + 2 * pad, dtype=jnp.int32)
    rows_j = jnp.arange(w, dtype=jnp.int32)
    P = ((start[..., None, None] + rows_j[:, None]) == cols).astype(jnp.bfloat16)

    # channel-stack: [hi(x), lo(x), hi(x>>1), lo(x>>1)] so one matmul yields
    # both taps; xp1[s] = xp[s+1] (tap start+j+1 <= W+2*pad-2, dup never hit)
    xp1 = jnp.concatenate([xp[:, :, 1:], xp[:, :, -1:]], axis=2)
    hi = xp.astype(jnp.bfloat16)
    lo = (xp - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    hi1 = xp1.astype(jnp.bfloat16)
    lo1 = (xp1 - hi1.astype(jnp.float32)).astype(jnp.bfloat16)
    xc = jnp.concatenate([hi, lo, hi1, lo1], axis=-1)  # (B, H, 3W, 4C)

    g = jnp.einsum("bhjs,bhsc->bhjc", P, xc,
                   preferred_element_type=jnp.float32)  # (B, H, W, 4C)
    g0 = g[..., :c] + g[..., c:2 * c]
    g1 = g[..., 2 * c:3 * c] + g[..., 3 * c:]
    out = (1.0 - f) * g0 + f * g1
    fill = jnp.asarray(_FILL, jnp.float32).reshape((1,) * 3 + (c,))
    return jnp.where(inside[..., None], out, fill)


def _col_shift_bilinear(x: jax.Array, t: jax.Array,
                        max_shift: Optional[float] = None) -> jax.Array:
    """Column counterpart of `_row_shift_bilinear`: ``out[b,i,j] = x[b, i + t[b,j], j]``."""
    return jnp.swapaxes(
        _row_shift_bilinear(jnp.swapaxes(x, 1, 2), t, max_shift), 1, 2)


def _centered(n: int) -> jax.Array:
    return jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0


def rotate(x: jax.Array, degrees: jax.Array) -> jax.Array:
    """(B,H,W,3), per-image degrees (counter-clockwise, PIL convention).

    TPU-native decomposition: exact quarter-turns (flips/transposes) plus a
    Paeth 3-shear factorization of the residual (|r| <= 45 deg), each shear
    one `_row_shift_bilinear` MXU pass. Multiples of 90 deg are exact;
    arbitrary angles use
    three bilinear taps instead of PIL's single 2-D bilinear resample (a
    documented deviation — same affine map, marginally softer interpolation).
    Requires H == W (true everywhere in this framework).
    """
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    x = x.astype(jnp.float32)
    # PIL rotates counter-clockwise for positive angles; the shear/quarter-turn
    # decomposition below is expressed for clockwise-positive, so negate here
    # (verified against PIL.Image.rotate in tests/test_augment.py)
    degrees = -degrees
    q = jnp.round(degrees / 90.0)
    r = jnp.deg2rad(degrees - 90.0 * q)  # residual in [-45, 45] deg
    qm = jnp.mod(q, 4.0)[:, None, None, None]
    # quarter turns of a square image (q counts clockwise after the negation
    # above, so qm==3 is the PIL rotate(90) CCW turn — PIL-exact, tested)
    r90 = jnp.swapaxes(x, 1, 2)[:, :, ::-1, :]  # clockwise 90
    r180 = x[:, ::-1, ::-1, :]
    r270 = jnp.swapaxes(x, 1, 2)[:, ::-1, :, :]  # clockwise 270 = PIL +90
    out = jnp.where(qm == 1.0, r90, x)
    out = jnp.where(qm == 2.0, r180, out)
    out = jnp.where(qm == 3.0, r270, out)
    # Paeth: inverse map Minv(r) = Sx(alpha) . Sy(beta) . Sx(alpha),
    # alpha = tan(r/2), beta = -sin(r); first pass composes leftmost.
    alpha = jnp.tan(r / 2.0)
    beta = -jnp.sin(r)
    ys, xs = _centered(h), _centered(w)
    # static shift bounds at |r| = 45 deg: tan(22.5)*(h-1)/2 and sin(45)*(w-1)/2
    ms_a = 0.4143 * (h - 1) / 2.0
    ms_b = 0.7072 * (w - 1) / 2.0
    out = _row_shift_bilinear(out, alpha[:, None] * ys[None, :], ms_a)
    out = _col_shift_bilinear(out, beta[:, None] * xs[None, :], ms_b)
    out = _row_shift_bilinear(out, alpha[:, None] * ys[None, :], ms_a)
    return out


def shear(x: jax.Array, fx: jax.Array, fy: jax.Array,
          max_factor: float = 0.31) -> jax.Array:
    """PIL affine shear, anchored at the top-left ORIGIN like timm's
    ``img.transform(AFFINE, (1, f, 0, 0, 1, 0))``: output row y samples input
    column x + f*(y+0.5) (PIL maps pixel centers), so the top row is (almost)
    fixed and displacement grows one-sided down the image (a centered anchor
    would halve the displacement range — a distribution the reference
    pipeline never produces). PIL-golden-tested. Applied as an
    x-pass then a y-pass; for single-axis shears — the only form RandAugment
    uses — this equals the joint 2-D bilinear resample exactly (the bilinear
    kernel is separable). ``max_factor`` (static) bounds |fx|,|fy|;
    RandAugment's ceiling is 0.3."""
    h, w = x.shape[1], x.shape[2]
    # PIL samples output pixel centers: row y's shift is f*(y + 0.5)
    rows = jnp.arange(h, dtype=jnp.float32) + 0.5
    cols = jnp.arange(w, dtype=jnp.float32) + 0.5
    out = _row_shift_bilinear(x, fx[:, None] * rows[None, :],
                              max_factor * h)
    return _col_shift_bilinear(out, fy[:, None] * cols[None, :],
                               max_factor * w)


def translate(x: jax.Array, tx: jax.Array, ty: jax.Array,
              max_frac: float = 0.46) -> jax.Array:
    """Relative translation (fraction of size), per-image. Separable x/y
    passes — exactly the 2-D bilinear resample (separable kernel, uniform
    shift). ``max_frac`` (static) bounds |tx|,|ty|; RandAugment's ceiling is
    0.45."""
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    out = _row_shift_bilinear(x, jnp.broadcast_to((tx * w)[:, None], (b, h)),
                              max_frac * w)
    return _col_shift_bilinear(out, jnp.broadcast_to((ty * h)[:, None], (b, w)),
                               max_frac * h)


def random_resized_crop(
    key: jax.Array,
    images: jax.Array,
    out_size: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> jax.Array:
    """torchvision RandomResizedCrop semantics, batched, bilinear resample.

    Samples area in ``scale``x(image area) and log-uniform aspect in ``ratio``;
    falls back to a center-style clamp when the box does not fit (the 10-try
    PIL loop is replaced by clamping — same distribution in the common case).
    Returns float (B, out, out, 3) in [0, 255].
    """
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k1, (b,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        k2, (b,), minval=math.log(ratio[0]), maxval=math.log(ratio[1])
    )
    r = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * r), 1.0, w)
    ch = jnp.clip(jnp.sqrt(area / r), 1.0, h)
    x0 = jax.random.uniform(k3, (b,)) * (w - cw)
    y0 = jax.random.uniform(k4, (b,)) * (h - ch)

    imgs = images.astype(jnp.float32)

    def one(im, x0i, y0i, cwi, chi):
        # scale_and_translate: out = in * scale + translation (in output coords)
        sx = out_size / cwi
        sy = out_size / chi
        return jax.image.scale_and_translate(
            im,
            (out_size, out_size, 3),
            (0, 1),
            jnp.stack([sy, sx]),
            jnp.stack([-y0i * sy, -x0i * sx]),
            method="bilinear",
        )

    return jax.vmap(one)(imgs, x0, y0, cw, ch)


def horizontal_flip(key: jax.Array, x: jax.Array, p: float = 0.5) -> jax.Array:
    flip = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
    return jnp.where(flip, x[:, :, ::-1, :], x)


# --- pixel ops (PIL-compatible where exactness is possible) -------------------


def invert(x: jax.Array) -> jax.Array:
    return 255.0 - x


def solarize(x: jax.Array, thresh: jax.Array) -> jax.Array:
    t = jnp.asarray(thresh)
    t = t.reshape((-1,) + (1,) * (x.ndim - 1)) if t.ndim else t
    return jnp.where(x >= t, 255.0 - x, x)


def solarize_add(x: jax.Array, add: jax.Array, thresh: float = 128.0) -> jax.Array:
    a = jnp.asarray(add).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.where(x < thresh, jnp.clip(x + a, 0, 255), x)


def posterize(x: jax.Array, bits: jax.Array) -> jax.Array:
    """Keep ``bits`` significant bits per channel (PIL ImageOps.posterize)."""
    b = jnp.asarray(bits).reshape((-1,) + (1,) * (x.ndim - 1))
    shift = (2.0 ** (8 - b)).astype(jnp.float32)
    return jnp.floor(jnp.clip(x, 0, 255) / shift) * shift


def autocontrast(x: jax.Array) -> jax.Array:
    """Per-image, per-channel histogram stretch (PIL autocontrast, cutoff 0)."""
    mn = jnp.min(x, axis=(1, 2), keepdims=True)
    mx = jnp.max(x, axis=(1, 2), keepdims=True)
    scale = 255.0 / jnp.maximum(mx - mn, 1e-6)
    out = (x - mn) * scale
    return jnp.where(mx > mn, jnp.clip(out, 0, 255), x)


def equalize(x: jax.Array) -> jax.Array:
    """PIL ImageOps.equalize, per image and channel, on rounded uint8 values."""
    xi = jnp.clip(jnp.round(x), 0, 255).astype(jnp.int32)  # (B,H,W,3)
    b, h, w, c = xi.shape
    flat = xi.reshape(b, h * w, c)
    # MXU outer-product histogram: split v = 16*hi + lo, then
    # hist[v] = sum_p [hi_p==hi][lo_p==lo] is a (P,16)^T @ (P,16) contraction
    # per (image, channel). Exact (counts < 2^24 accumulate exactly in the
    # fp32 MXU accumulator). Measured 170 -> ~4 ms at batch 512 vs the fused
    # one-hot VPU reduce (and 350 ms for a segment_sum scatter).
    hi = jax.nn.one_hot(flat // 16, 16, dtype=jnp.bfloat16)  # (B,HW,C,16)
    lo = jax.nn.one_hot(flat % 16, 16, dtype=jnp.bfloat16)
    hist2d = jnp.einsum("bpci,bpcj->bcij", hi, lo,
                        preferred_element_type=jnp.float32)
    hist = hist2d.reshape(b, c, 256)  # (B,C,256)

    # PIL: step = (pixels - last nonzero bin count) // 255 — exact int32 math
    # (an fp32 divide here can round 6375/255 to 24.999998 and floor to 24)
    histi = jnp.round(hist).astype(jnp.int32)
    idx = jnp.arange(256, dtype=jnp.int32)
    last_nz = jnp.argmax(jnp.where(histi > 0, idx, -1), axis=-1)  # (B,3)
    last_count = jnp.take_along_axis(histi, last_nz[..., None], axis=-1)[..., 0]
    step = (h * w - last_count) // 255  # (B,3) int32

    csum_excl = jnp.cumsum(histi, axis=-1) - histi
    lut = (csum_excl + (step // 2)[..., None]) // jnp.maximum(step[..., None], 1)
    lut = jnp.clip(lut, 0, 255).astype(jnp.float32)

    # LUT application re-uses the same one-hots: out[p] = lut[v_p] =
    # hi_p^T . LUT2D . lo_p — a (P,16)x(16,16) MXU contraction plus a 16-wide
    # VPU reduce, instead of a per-pixel 256-entry table gather (which
    # serializes on TPU just like the histogram scatter does).
    lut2d = lut.reshape(b, c, 16, 16)
    tmp = jnp.einsum("bpci,bcij->bpcj", hi, lut2d,
                     preferred_element_type=jnp.float32)  # (B,HW,C,16)
    out = jnp.sum(tmp * lo.astype(jnp.float32), axis=-1)  # (B,HW,C)
    out = out.reshape(b, h, w, c)
    return jnp.where(step[:, None, None, :] > 0, out, x)


def brightness(x: jax.Array, factor: jax.Array) -> jax.Array:
    f = jnp.asarray(factor).reshape((-1,) + (1,) * (x.ndim - 1))
    return _blend(x, jnp.zeros_like(x), f)


def contrast(x: jax.Array, factor: jax.Array) -> jax.Array:
    """PIL Contrast: blend with the mean of the grayscale image."""
    f = jnp.asarray(factor).reshape((-1,) + (1,) * (x.ndim - 1))
    # PIL computes mean of the L image rounded; keep float mean (negligible)
    mean = jnp.mean(_gray(x), axis=(1, 2, 3), keepdims=True)
    return _blend(x, jnp.broadcast_to(mean, x.shape), f)


def saturation(x: jax.Array, factor: jax.Array) -> jax.Array:
    """PIL Color: blend with the grayscale image."""
    f = jnp.asarray(factor).reshape((-1,) + (1,) * (x.ndim - 1))
    g = jnp.broadcast_to(_gray(x), x.shape)
    return _blend(x, g, f)


def sharpness(x: jax.Array, factor: jax.Array) -> jax.Array:
    """PIL Sharpness: blend with SMOOTH-filtered image (interior only)."""
    f = jnp.asarray(factor).reshape((-1,) + (1,) * (x.ndim - 1))
    kernel = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    # depthwise 3x3, same padding
    k4 = kernel[:, :, None, None] * jnp.eye(3)[None, None]
    sm = jax.lax.conv_general_dilated(
        x, k4, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=1,
    )
    # PIL leaves the 1-px border unsmoothed
    h, w = x.shape[1], x.shape[2]
    border = jnp.zeros((h, w, 1), bool).at[1:-1, 1:-1].set(True)
    sm = jnp.where(border, sm, x)
    return _blend(x, sm, f)


def grayscale(x: jax.Array) -> jax.Array:
    return jnp.broadcast_to(jnp.round(_gray(x)), x.shape)


def gaussian_blur(key: jax.Array, x: jax.Array, p: float = 0.5,
                  radius_min: float = 0.1, radius_max: float = 2.0) -> jax.Array:
    """Per-image gaussian blur with random sigma, applied with prob p
    (reference GaussianBlur, ``mini_imagenet.py:44-62``). Separable, K=9."""
    b = x.shape[0]
    k1, k2 = jax.random.split(key)
    apply = jax.random.bernoulli(k1, p, (b,))
    sigma = jax.random.uniform(k2, (b,), minval=radius_min, maxval=radius_max)
    offsets = jnp.arange(-4, 5, dtype=jnp.float32)  # K=9
    w = jnp.exp(-(offsets[None, :] ** 2) / (2.0 * sigma[:, None] ** 2))
    w = w / jnp.sum(w, axis=1, keepdims=True)  # (B, 9)

    def blur1d(img, weights, axis):
        pad = [(0, 0)] * img.ndim
        pad[axis] = (4, 4)
        padded = jnp.pad(img, pad, mode="edge")
        out = jnp.zeros_like(img)
        for i in range(9):
            sl = [slice(None)] * img.ndim
            sl[axis] = slice(i, i + img.shape[axis])
            out = out + weights[i] * padded[tuple(sl)]
        return out

    def one(img, weights):
        return blur1d(blur1d(img, weights, 0), weights, 1)

    blurred = jax.vmap(one)(x, w)
    return jnp.where(apply[:, None, None, None], blurred, x)


def random_grayscale(key: jax.Array, x: jax.Array, p: float = 0.2) -> jax.Array:
    apply = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
    return jnp.where(apply, grayscale(x), x)


def random_solarize(key: jax.Array, x: jax.Array, p: float = 0.5,
                    thresh: float = 128.0) -> jax.Array:
    apply = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
    return jnp.where(apply, solarize(x, thresh), x)


def color_jitter(key: jax.Array, x: jax.Array, b: float = 0.4, c: float = 0.4,
                 s: float = 0.4) -> jax.Array:
    """torchvision ColorJitter(brightness, contrast, saturation) — factors
    uniform in [1-v, 1+v], applied in random order per batch."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = x.shape[0]
    fb = jax.random.uniform(k1, (n,), minval=1 - b, maxval=1 + b)
    fc = jax.random.uniform(k2, (n,), minval=1 - c, maxval=1 + c)
    fs = jax.random.uniform(k3, (n,), minval=1 - s, maxval=1 + s)
    fns = [
        lambda y: brightness(y, fb),
        lambda y: contrast(y, fc),
        lambda y: saturation(y, fs),
    ]
    perms = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]
    which = jax.random.randint(k4, (), 0, 6)

    def apply_perm(p):
        def f(y):
            for i in p:
                y = fns[i](y)
            return y
        return f

    return jax.lax.switch(which, [apply_perm(p) for p in perms], x)


def random_erasing(
    key: jax.Array,
    x_norm: jax.Array,
    p: float = 0.25,
    area: Tuple[float, float] = (0.02, 1.0 / 3.0),
    ratio_min: float = 0.3,
) -> jax.Array:
    """timm RandomErasing 'pixel' mode: rectangle filled with N(0,1), applied
    on the NORMALIZED tensor (``random_erasing.py`` semantics)."""
    b, h, w, c = x_norm.shape
    ks = jax.random.split(key, 6)
    apply = jax.random.bernoulli(ks[0], p, (b,))
    target = jax.random.uniform(ks[1], (b,), minval=area[0], maxval=area[1]) * h * w
    log_r = jax.random.uniform(
        ks[2], (b,), minval=math.log(ratio_min), maxval=math.log(1.0 / ratio_min)
    )
    r = jnp.exp(log_r)
    eh = jnp.clip(jnp.round(jnp.sqrt(target * r)), 1, h - 1)
    ew = jnp.clip(jnp.round(jnp.sqrt(target / r)), 1, w - 1)
    y0 = (jax.random.uniform(ks[3], (b,)) * (h - eh)).astype(jnp.int32)
    x0 = (jax.random.uniform(ks[4], (b,)) * (w - ew)).astype(jnp.int32)
    noise = jax.random.normal(ks[5], x_norm.shape, x_norm.dtype)

    gy = jnp.arange(h)[None, :, None]
    gx = jnp.arange(w)[None, None, :]
    inside = (
        (gy >= y0[:, None, None]) & (gy < (y0 + eh.astype(jnp.int32))[:, None, None])
        & (gx >= x0[:, None, None]) & (gx < (x0 + ew.astype(jnp.int32))[:, None, None])
    )
    mask = (inside & apply[:, None, None])[..., None]
    return jnp.where(mask, noise, x_norm)


# --- RandAugment ---------------------------------------------------------------

# the 'inc1' increasing-severity op set of timm rand-m9-mstd0.5-inc1
_RA_OPS = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize", "Solarize",
    "SolarizeAdd", "Color", "Contrast", "Brightness", "Sharpness",
    "ShearX", "ShearY", "TranslateX", "TranslateY",
]


def _ra_apply(op_idx: jax.Array, x: jax.Array, mag: jax.Array,
              sign: jax.Array) -> jax.Array:
    """Apply one RandAugment op to the whole batch (per-image mag/sign)."""
    b = x.shape[0]
    frac = mag / 10.0

    def enhance_factor():
        # increasing variants: 1 +- 0.9 * frac
        return 1.0 + sign * 0.9 * frac

    branches = [
        lambda y: autocontrast(y),
        lambda y: equalize(y),
        lambda y: invert(y),
        lambda y: rotate(y, sign * 30.0 * frac),
        # PosterizeIncreasing: keep 4 - int(4*frac) bits — severity RISES with
        # magnitude (timm _posterize_increasing_level_to_arg; at m=9 this
        # keeps 1 bit, not ~8 = identity)
        lambda y: posterize(y, 4.0 - jnp.floor(4.0 * frac)),
        # SolarizeIncreasing: threshold 256 - int(256*frac)
        lambda y: solarize(y, 256.0 - jnp.floor(256.0 * frac)),
        lambda y: solarize_add(y, jnp.floor(110.0 * frac)),
        lambda y: saturation(y, enhance_factor()),
        lambda y: contrast(y, enhance_factor()),
        lambda y: brightness(y, enhance_factor()),
        lambda y: sharpness(y, enhance_factor()),
        lambda y: shear(y, sign * 0.3 * frac, jnp.zeros_like(sign)),
        lambda y: shear(y, jnp.zeros_like(sign), sign * 0.3 * frac),
        lambda y: translate(y, sign * 0.45 * frac, jnp.zeros_like(sign)),
        lambda y: translate(y, jnp.zeros_like(sign), sign * 0.45 * frac),
    ]
    return jax.lax.switch(op_idx, branches, x)


def rand_augment(
    key: jax.Array,
    x: jax.Array,
    num_ops: int = 2,
    magnitude: float = 9.0,
    mstd: float = 0.5,
    op_prob: float = 0.5,
) -> jax.Array:
    """timm ``rand-m9-mstd0.5-inc1``. One op index is drawn per LAYER for the
    whole batch (keeps lax.switch scalar — per-image op choice would need a
    vmapped switch over 15 full-image branches); magnitude/sign/apply are
    per-image. Over many steps the per-image op marginal matches."""
    for layer in range(num_ops):
        key, k_op, k_mag, k_sign, k_apply = jax.random.split(key, 5)
        op_idx = jax.random.randint(k_op, (), 0, len(_RA_OPS))
        b = x.shape[0]
        mag = jnp.clip(
            magnitude + mstd * jax.random.normal(k_mag, (b,)), 0.0, 10.0
        )
        sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (b,)), 1.0, -1.0)
        out = _ra_apply(op_idx, x, mag, sign)
        apply = jax.random.bernoulli(k_apply, op_prob, (b, 1, 1, 1))
        x = jnp.where(apply, out, x)
    return x


# --- composed pipelines ---------------------------------------------------------


def weak_augment(key: jax.Array, images_u8: jax.Array, out_size: int = 80,
                 randaug_p: float = 0.2) -> jax.Array:
    """Reference ``build_transform_weak``: RRC + flip + RandAugment(p=0.2).
    Returns float [0,255]."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = random_resized_crop(k1, images_u8, out_size)
    x = horizontal_flip(k2, x)
    do_ra = jax.random.bernoulli(k3, randaug_p, (x.shape[0], 1, 1, 1))
    x_ra = rand_augment(k4, x)
    return jnp.where(do_ra, x_ra, x)


def strong_from_weak(key: jax.Array, weak: jax.Array,
                     strong_prob: float = 0.5) -> jax.Array:
    """Reference strong view (``mini_imagenet.py:194-203``): with prob
    ``strong_prob`` apply ColorJitter+Blur+Solarize+Grayscale to the WEAK view
    (keeping spatial alignment); erasing happens post-normalize."""
    ks = jax.random.split(key, 5)
    x = color_jitter(ks[0], weak)
    x = gaussian_blur(ks[1], x, p=0.5)
    x = random_solarize(ks[2], x, p=0.5)
    x = random_grayscale(ks[3], x, p=0.2)
    apply = jax.random.bernoulli(ks[4], strong_prob, (weak.shape[0], 1, 1, 1))
    return jnp.where(apply, x, weak)


def _normalize_255(x: jax.Array, mean, std) -> jax.Array:
    return (x / 255.0 - jnp.asarray(mean, x.dtype)) / jnp.asarray(std, x.dtype)


def make_dual_view_fn(mean=MEAN, std=STD, out_size: int = 80,
                      strong_prob: float = 0.5, erase_p: float = 0.25) -> Callable:
    """(images_u8, rng) -> (strong_normalized, weak_normalized) for SUN."""

    def fn(images_u8, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        weak = weak_augment(k1, images_u8, out_size)
        strong = strong_from_weak(k2, weak, strong_prob)
        weak_n = _normalize_255(weak, mean, std)
        strong_n = random_erasing(k3, _normalize_255(strong, mean, std), p=erase_p)
        return strong_n, weak_n

    return fn


def make_cropaug_fn(mean=MEAN, std=STD, out_size: int = 80,
                    erase_p: float = 0.25) -> Callable:
    """timm ``create_transform(..., auto_augment='rand-m9-mstd0.5-inc1',
    re_prob=0.25)`` equivalent (phase-1 'cropaug'): RRC + flip + RandAugment
    (always) + normalize + random erasing."""

    def fn(images_u8, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        x = random_resized_crop(k1, images_u8, out_size)
        x = horizontal_flip(k2, x)
        x = rand_augment(k3, x)
        return random_erasing(k4, _normalize_255(x, mean, std), p=erase_p)

    return fn

"""Augmentation ops: PIL golden tests for pixel ops, statistical/contract
tests for geometry and composed pipelines."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image, ImageEnhance, ImageOps

from fewshot_vit_tpu.data import augment as A


def rand_img(seed=0, n=2, size=32):
    return np.random.default_rng(seed).integers(0, 256, (n, size, size, 3)).astype(np.uint8)


def as_f32(u8):
    return jnp.asarray(u8, jnp.float32)


class TestPixelOpsGolden:
    """Exact (or near-exact) matches vs PIL on uint8 inputs."""

    def _pil_batch(self, u8, fn):
        return np.stack([np.asarray(fn(Image.fromarray(im)), np.uint8) for im in u8])

    def test_invert(self):
        u8 = rand_img(1)
        got = np.asarray(A.invert(as_f32(u8)))
        want = self._pil_batch(u8, ImageOps.invert)
        np.testing.assert_array_equal(got.astype(np.uint8), want)

    def test_solarize(self):
        u8 = rand_img(2)
        got = np.asarray(A.solarize(as_f32(u8), 128.0)).astype(np.uint8)
        want = self._pil_batch(u8, lambda im: ImageOps.solarize(im, 128))
        np.testing.assert_array_equal(got, want)

    def test_posterize(self):
        u8 = rand_img(3)
        got = np.asarray(A.posterize(as_f32(u8), jnp.array([3.0, 5.0]))).astype(np.uint8)
        want = np.stack([
            np.asarray(ImageOps.posterize(Image.fromarray(u8[0]), 3)),
            np.asarray(ImageOps.posterize(Image.fromarray(u8[1]), 5)),
        ])
        np.testing.assert_array_equal(got, want)

    def test_inc1_severity_args(self):
        """timm inc1 level->arg math through _ra_apply: severity INCREASES
        with magnitude. PosterizeIncreasing keeps 4 - int(4*frac) bits (1 bit
        at m=9, NOT ~8 = identity); SolarizeIncreasing thresholds at
        256 - int(256*frac); SolarizeAdd adds int(110*frac). Reference: timm
        auto_augment.py _posterize/_solarize_increasing_level_to_arg."""
        u8 = rand_img(31, n=2, size=8)
        x = as_f32(u8)
        mag = jnp.full((2,), 9.0)
        sign = jnp.ones((2,))
        got = np.asarray(A._ra_apply(jnp.asarray(4), x, mag, sign)).astype(np.uint8)
        want = self._pil_batch(
            u8, lambda im: ImageOps.posterize(im, 4 - int(0.9 * 4)))
        np.testing.assert_array_equal(got, want)
        got = np.asarray(A._ra_apply(jnp.asarray(5), x, mag, sign)).astype(np.uint8)
        want = self._pil_batch(
            u8, lambda im: ImageOps.solarize(im, 256 - int(0.9 * 256)))
        np.testing.assert_array_equal(got, want)
        got = np.asarray(A._ra_apply(jnp.asarray(6), x, mag, sign)).astype(np.uint8)
        add = int(0.9 * 110)
        want = np.where(u8 < 128, np.minimum(u8.astype(np.int32) + add, 255),
                        u8).astype(np.uint8)
        np.testing.assert_array_equal(got, want)

    def test_autocontrast(self):
        u8 = rand_img(4)
        got = np.asarray(A.autocontrast(as_f32(u8)))
        want = self._pil_batch(u8, ImageOps.autocontrast).astype(np.float32)
        # PIL uses integer LUT rounding; allow 1-level difference
        assert np.abs(got - want).max() <= 1.0 + 1e-5

    def test_equalize(self):
        u8 = rand_img(5)
        got = np.asarray(A.equalize(as_f32(u8)))
        want = self._pil_batch(u8, ImageOps.equalize).astype(np.float32)
        np.testing.assert_array_equal(got.astype(np.uint8), want.astype(np.uint8))

    def test_grayscale(self):
        u8 = rand_img(6)
        got = np.asarray(A.grayscale(as_f32(u8)))
        want = np.stack([
            np.asarray(Image.fromarray(im).convert("L"), np.float32)[..., None].repeat(3, -1)
            for im in u8
        ])
        assert np.abs(got - want).max() <= 1.0

    def test_brightness_contrast_saturation(self):
        u8 = rand_img(7)
        for name, jfn, pfn in [
            ("bright", A.brightness, ImageEnhance.Brightness),
            ("contrast", A.contrast, ImageEnhance.Contrast),
            ("sat", A.saturation, ImageEnhance.Color),
        ]:
            got = np.asarray(jfn(as_f32(u8), jnp.array([0.6, 1.4])))
            want = np.stack([
                np.asarray(pfn(Image.fromarray(u8[0])).enhance(0.6), np.float32),
                np.asarray(pfn(Image.fromarray(u8[1])).enhance(1.4), np.float32),
            ])
            assert np.abs(got - want).max() <= 2.0, name

    def test_sharpness_interior(self):
        u8 = rand_img(8)
        got = np.asarray(A.sharpness(as_f32(u8), jnp.array([0.5, 1.5])))
        want = np.stack([
            np.asarray(ImageEnhance.Sharpness(Image.fromarray(u8[0])).enhance(0.5), np.float32),
            np.asarray(ImageEnhance.Sharpness(Image.fromarray(u8[1])).enhance(1.5), np.float32),
        ])
        # border handling matches PIL (unsmoothed); rounding differences <= 2
        assert np.abs(got - want).max() <= 2.0


class TestGeometry:
    def test_rotate_identity(self):
        u8 = rand_img(9)
        out = np.asarray(A.rotate(as_f32(u8), jnp.zeros(2)))
        np.testing.assert_allclose(out, u8.astype(np.float32), atol=1e-3)

    def test_rotate_180_matches_flip(self):
        u8 = rand_img(10, size=31)  # odd size -> exact center
        out = np.asarray(A.rotate(as_f32(u8), jnp.full(2, 180.0)))
        want = u8[:, ::-1, ::-1, :].astype(np.float32)
        assert np.abs(out - want).max() <= 1e-2

    def test_rotate_quarter_turns_match_pil_ccw(self):
        """Positive angles rotate counter-clockwise, PIL convention — exact
        for multiples of 90 deg."""
        from PIL import Image

        u8 = rand_img(21, size=32)
        for deg in (90.0, 270.0):
            out = np.asarray(A.rotate(as_f32(u8), jnp.full(2, deg)))
            want = np.stack(
                [np.asarray(Image.fromarray(im).rotate(deg)) for im in u8]
            ).astype(np.float32)
            np.testing.assert_allclose(out, want, atol=1e-3)

    def test_translate_shifts(self):
        u8 = rand_img(11)
        out = np.asarray(A.translate(as_f32(u8), jnp.array([0.25, 0.0]), jnp.zeros(2)))
        # PIL affine semantics: positive tx shifts CONTENT left by 8 px
        np.testing.assert_allclose(out[0, :, :-8], u8[0, :, 8:].astype(np.float32), atol=1e-3)
        np.testing.assert_allclose(out[1], u8[1].astype(np.float32), atol=1e-3)

    def test_shear_translate_match_reference_bilinear(self):
        """Fractional shears/translates vs an independent numpy mirror of the
        inverse-map bilinear resample with timm's exact AFFINE matrices —
        shear is anchored at the top-left ORIGIN (PIL transform semantics,
        timm auto_augment shear_x/y), translate is a uniform shift. Anchors
        the row-DMA implementation."""
        fill = np.array([124.0, 116.0, 104.0], np.float32)

        def np_affine(img, inv):
            # PIL Image.transform(AFFINE) semantics: output pixel (j, i)
            # samples the input at (a*(j+.5)+b*(i+.5)+c-.5, ...) — pixel
            # centers; a sample is inside iff its center+0.5 is in [0, size);
            # inside taps CLAMP to the border, outside pixels take the fill.
            h, w = img.shape[:2]
            out = np.zeros((h, w, 3), np.float32)
            for i in range(h):
                for j in range(w):
                    sx = inv[0][0] * (j + .5) + inv[0][1] * (i + .5) + inv[0][2] - .5
                    sy = inv[1][0] * (j + .5) + inv[1][1] * (i + .5) + inv[1][2] - .5
                    if not (0 <= sx + .5 < w and 0 <= sy + .5 < h):
                        out[i, j] = fill
                        continue
                    x0, y0 = int(np.floor(sx)), int(np.floor(sy))
                    dx, dy = sx - x0, sy - y0
                    acc = np.zeros(3, np.float32)
                    for yy, wy in ((y0, 1 - dy), (y0 + 1, dy)):
                        for xx, wx in ((x0, 1 - dx), (x0 + 1, dx)):
                            v = img[min(max(yy, 0), h - 1), min(max(xx, 0), w - 1)]
                            acc += np.float32(wy * wx) * v
                    out[i, j] = acc
            return out

        u8 = rand_img(17, n=1, size=16)
        img = u8[0].astype(np.float32)
        # timm shear_x: transform(AFFINE, (1, factor, 0, 0, 1, 0))
        got = np.asarray(A.shear(as_f32(u8), jnp.array([0.23]), jnp.zeros(1)))[0]
        want = np_affine(img, [[1.0, 0.23, 0.0], [0.0, 1.0, 0.0]])
        assert np.abs(got - want).max() <= 1e-2
        # timm shear_y: transform(AFFINE, (1, 0, 0, factor, 1, 0))
        got = np.asarray(A.shear(as_f32(u8), jnp.zeros(1), jnp.array([-0.17])))[0]
        want = np_affine(img, [[1.0, 0.0, 0.0], [-0.17, 1.0, 0.0]])
        assert np.abs(got - want).max() <= 1e-2
        got = np.asarray(A.translate(as_f32(u8), jnp.array([0.13]), jnp.zeros(1)))[0]
        want = np_affine(img, [[1.0, 0.0, 0.13 * 16], [0.0, 1.0, 0.0]])
        assert np.abs(got - want).max() <= 1e-2
        got = np.asarray(A.translate(as_f32(u8), jnp.zeros(1), jnp.array([-0.29])))[0]
        want = np_affine(img, [[1.0, 0.0, 0.0], [0.0, 1.0, -0.29 * 16]])
        assert np.abs(got - want).max() <= 1e-2

    def test_shear_matches_pil_transform(self):
        """Direct PIL golden: A.shear vs PIL Image.transform with the exact
        matrices timm's shear_x/shear_y pass — catches any anchor-convention
        drift the numpy mirror could share with the implementation."""
        u8 = rand_img(23, n=1, size=20)
        im = Image.fromarray(u8[0])
        fill = (124, 116, 104)
        for fx, fy, mat in [(0.3, 0.0, (1, 0.3, 0, 0, 1, 0)),
                            (-0.22, 0.0, (1, -0.22, 0, 0, 1, 0)),
                            (0.0, 0.27, (1, 0, 0, 0.27, 1, 0))]:
            got = np.asarray(
                A.shear(as_f32(u8), jnp.array([fx]), jnp.array([fy])))[0]
            want = np.asarray(
                im.transform(im.size, Image.AFFINE, mat,
                             resample=Image.BILINEAR, fillcolor=fill)
            ).astype(np.float32)
            # PIL quantizes to uint8 and uses fixed-point taps: 1.5 levels
            assert np.abs(got - want).max() <= 1.5, (fx, fy)

    def test_rotate_small_angle_vs_reference(self):
        """Paeth 3-shear rotation vs the direct 2-D bilinear resample on a
        smooth gradient image: interior agreement within interpolation slack."""
        h = w = 33
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([yy * 3, xx * 3, (yy + xx) * 1.5], -1)
        rad = np.deg2rad(17.0)  # inverse map of a +17 deg CCW (PIL) rotation
        c, s = np.cos(rad), np.sin(rad)
        got = np.asarray(A.rotate(jnp.asarray(img[None]), jnp.array([17.0])))[0]

        def np_rot(img, inv):
            out = np.zeros_like(img)
            fill = np.array([124.0, 116.0, 104.0], np.float32)
            for i in range(h):
                for j in range(w):
                    gx, gy = j - (w - 1) / 2, i - (h - 1) / 2
                    sx = inv[0][0] * gx + inv[0][1] * gy + (w - 1) / 2
                    sy = inv[1][0] * gx + inv[1][1] * gy + (h - 1) / 2
                    x0, y0 = int(np.floor(sx)), int(np.floor(sy))
                    dx, dy = sx - x0, sy - y0
                    acc = np.zeros(3, np.float32)
                    for yv, wy in ((y0, 1 - dy), (y0 + 1, dy)):
                        for xv, wx in ((x0, 1 - dx), (x0 + 1, dx)):
                            v = img[yv, xv] if (0 <= yv < h and 0 <= xv < w) else fill
                            acc += np.float32(wy * wx) * v
                    out[i, j] = acc
            return out

        want = np_rot(img, [[c, -s], [s, c]])
        # compare away from the fill boundary (different pass-wise fill blending)
        m = slice(8, -8)
        assert np.abs(got[m, m] - want[m, m]).max() <= 1.0

    def test_rrc_shape_and_range(self):
        u8 = rand_img(12, n=8, size=84)
        out = np.asarray(A.random_resized_crop(jax.random.key(0), jnp.asarray(u8), 80))
        assert out.shape == (8, 80, 80, 3)
        assert out.min() >= 0 and out.max() <= 255
        # full-image crop recovers resized original approximately: not asserted
        # (stochastic); determinism per key:
        out2 = np.asarray(A.random_resized_crop(jax.random.key(0), jnp.asarray(u8), 80))
        np.testing.assert_array_equal(out, out2)


class TestComposedPipelines:
    def test_dual_view_contract(self):
        u8 = jnp.asarray(rand_img(13, n=16, size=84))
        fn = A.make_dual_view_fn()
        strong, weak = jax.jit(fn)(u8, jax.random.key(0))
        assert strong.shape == (16, 80, 80, 3) and weak.shape == (16, 80, 80, 3)
        assert np.isfinite(np.asarray(strong)).all()
        # normalized scale: roughly zero-centered
        assert abs(float(jnp.mean(weak))) < 2.0
        # strong differs from weak for some images (jitter/blur applied)
        assert float(jnp.abs(strong - weak).max()) > 0.01

    def test_dual_view_spatial_alignment(self):
        """Strong view must derive from the SAME crop as the weak view:
        with erasing off, gray-ify strong and compare structure via
        correlation with weak luminance."""
        # keep pixels < 128 so solarize (threshold 128) is a no-op: the test
        # isolates geometric alignment, which value-inverting ops would mask
        u8 = jnp.asarray(
            (np.random.default_rng(14).integers(0, 120, (8, 84, 84, 3))).astype(np.uint8)
        )
        fn = A.make_dual_view_fn(erase_p=0.0)
        strong, weak = fn(u8, jax.random.key(3))
        s = np.asarray(strong).mean(-1).reshape(8, -1)
        w = np.asarray(weak).mean(-1).reshape(8, -1)
        cs = np.array([abs(np.corrcoef(s[i], w[i])[0, 1]) for i in range(8)])
        # pixel-wise strong ops keep the weak crop's structure; brightness
        # pushing pixels past the solarize threshold can dent |corr| for an
        # image, so assert robust aggregates rather than per-image floors
        assert cs.mean() > 0.6 and cs.min() > 0.2, cs

    def test_cropaug_contract(self):
        u8 = jnp.asarray(rand_img(15, n=8, size=84))
        fn = A.make_cropaug_fn()
        out = jax.jit(fn)(u8, jax.random.key(1))
        assert out.shape == (8, 80, 80, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_rand_augment_runs_all_ops(self):
        """Drive every RandAugment branch explicitly."""
        u8 = as_f32(rand_img(16, n=2))
        for i in range(15):
            out = A._ra_apply(jnp.asarray(i), u8, jnp.array([9.0, 5.0]), jnp.array([1.0, -1.0]))
            assert np.isfinite(np.asarray(out)).all(), A._RA_OPS[i]
            assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 255.0, A._RA_OPS[i]

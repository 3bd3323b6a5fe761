"""Entry-point smoke: every CLI must at least import and print --help
(guards the module wiring without paying any compile cost)."""

import subprocess
import sys

import numpy as np
import pytest

CLIS = [
    "fewshot_vit_tpu.train.pretrain",
    "fewshot_vit_tpu.train.sun",
    "fewshot_vit_tpu.train.meta_tune",
    "fewshot_vit_tpu.train.meta_tune_emd",
    "fewshot_vit_tpu.eval.run",
    "fewshot_vit_tpu.eval.run_emd",
    "fewshot_vit_tpu.eval.visualize",
]


@pytest.mark.parametrize("module", CLIS)
def test_cli_help(module):
    out = subprocess.run(
        [sys.executable, "-m", module, "--help"],
        capture_output=True, text=True, timeout=240,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": ":".join(sys.path), "HOME": "/root"},
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "--config" in out.stdout


def test_config_matrix_names_resolve():
    """Every shipped YAML must parse and reference only registered model /
    encoder / dataset names (guards the config matrix against registry drift)."""
    import glob
    import os

    from fewshot_vit_tpu.core import load_config
    import fewshot_vit_tpu.models  # noqa: F401
    import fewshot_vit_tpu.heads  # noqa: F401
    import fewshot_vit_tpu.data.datasets  # noqa: F401
    from fewshot_vit_tpu.core.registry import models, datasets

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    files = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert len(files) >= 30
    for f in files:
        cfg = load_config(f)
        enc = cfg.get("model_args.encoder") or cfg.get("encoder")
        if enc:
            assert enc in models, (f, enc)
        if cfg.get("model"):
            assert cfg.get("model") in models, (f, cfg.get("model"))
        for k in ("train_dataset", "val_dataset", "fs_dataset", "tval_dataset", "dataset"):
            if cfg.get(k):
                assert cfg.get(k) in datasets, (f, cfg.get(k))


class TestGridGeometryGolden:
    """Grid crop boxes must match the reference get_grid_location algorithm
    (meta_tuning_sun_d/.../grid/mini_imagenet.py:78-98)."""

    @staticmethod
    def _reference_locations(size, ratio, num_grid):
        raw = int(size / num_grid)
        enlarged = int(size / num_grid * ratio)
        center = raw // 2
        out = []
        for _ in range(num_grid):
            out.append((max(0, center - enlarged // 2),
                        min(size, center + enlarged // 2)))
            center += raw
        return out

    def test_boxes_match_reference_exactly(self):
        """The static-ratio (eval) path computes boxes in host float64/int,
        so edges are EXACT for any ratio — INCLUDING the boundary cases
        where size/g*ratio lands on an integer (80/3*1.8 = 48, 80/3*1.05,
        80/3*2.1, 80/2*2.7 ...), which a float32 floor truncates one low."""
        from fewshot_vit_tpu.data.patches import _grid_boxes_exact

        for size, ratio, g in [(80, 2.0, 2), (80, 2.0, 3), (84, 1.5, 3),
                               (80, 1.37, 2), (80, 2.93, 3),
                               # f32-boundary ratios (true product integral)
                               (80, 1.05, 3), (80, 1.8, 3), (80, 2.1, 3),
                               (80, 2.85, 3), (80, 2.7, 2)]:
            lo, hi = _grid_boxes_exact(size, g, ratio)
            want = self._reference_locations(size, ratio, g)
            for i, (wl, wh) in enumerate(want):
                assert float(lo[i]) == wl, (size, ratio, g, i)
                assert float(hi[i]) == wh, (size, ratio, g, i)

    def test_grid_patches_static_ratio_uses_exact_boxes(self):
        """grid_patches with a Python-float ratio (the eval path) must route
        through the exact host boxes: at a boundary ratio the f32 path's
        off-by-one box would shift the resampled patch measurably."""
        import jax
        import jax.numpy as jnp

        from fewshot_vit_tpu.data.patches import (
            _grid_boxes_exact, grid_patches,
        )

        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.integers(0, 256, (2, 80, 80, 3)), jnp.uint8)
        got = grid_patches(imgs, patch_list=[3], ratio=1.8, out_size=16)
        lo, hi = _grid_boxes_exact(80, 3, 1.8)
        # reproduce patch (0,0) directly from the exact box via the same
        # scale_and_translate crop
        y0, y1 = float(lo[0]), float(hi[0])
        s = 16 / (y1 - y0)
        want = jax.image.scale_and_translate(
            imgs[0].astype(jnp.float32), (16, 16, 3), (0, 1),
            jnp.asarray([s, s]), jnp.asarray([-y0 * s, -y0 * s]),
            method="bilinear")
        np.testing.assert_allclose(np.asarray(got[0, 0]), np.asarray(want),
                                   rtol=1e-5, atol=1e-3)


class TestConfigOverrides:
    def test_dotted_override_through_scalar_is_pointed(self):
        """A CLI override typo descending through a scalar must fail with a
        clear message, not an opaque TypeError."""
        import pytest as _pytest

        from fewshot_vit_tpu.core.config import Config

        cfg = Config({"lr": 0.1, "model_args": {"encoder": "resnet12"}})
        with _pytest.raises(ValueError, match="scalar"):
            cfg.updated({"lr.min": 1e-5})
        # normal nested override still works
        out = cfg.updated({"model_args.encoder": "resnet18", "opt.name": "sgd"})
        assert out.get("model_args.encoder") == "resnet18"
        assert out.get("opt.name") == "sgd"

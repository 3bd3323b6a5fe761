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
        """Integer truncation semantics are reproduced via jnp.floor, so box
        edges are EXACT for any ratio — including non-divisible grids (80/3)
        and fractional train-time ratios."""
        from fewshot_vit_tpu.data.patches import _grid_boxes

        for size, ratio, g in [(80, 2.0, 2), (80, 2.0, 3), (84, 1.5, 3),
                               (80, 1.37, 2), (80, 2.93, 3)]:
            lo, hi = _grid_boxes(size, g, ratio)
            want = self._reference_locations(size, ratio, g)
            for i, (wl, wh) in enumerate(want):
                assert float(lo[i]) == wl, (size, ratio, g, i)
                assert float(hi[i]) == wh, (size, ratio, g, i)

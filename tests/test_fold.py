"""Frozen-BN folding (models/fold.py): exactness + structure tests.

The fold must be an *identity transform* of the eval-mode forward: the
reference's LeViT ships the same idea as ``.fuse()``
(``sun_meta_training/models/levit.py:150-172``); here it is a weight-level
transform over the whole visformer so the eval path traces with no BN between
matmuls. Exactness is the whole point — these tests compare folded vs
unfolded forwards on non-trivial running stats (fresh-init stats of mean 0 /
var 1 would make BN nearly a no-op and hide sign/offset bugs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.core import models
import fewshot_vit_tpu.models  # noqa: F401
import fewshot_vit_tpu.heads  # noqa: F401
from fewshot_vit_tpu.models.fold import fold_visformer, fold_encoder_in_head


def _randomized_stats(variables, seed=3):
    """Give every BN non-trivial running stats and affine params."""
    rng = np.random.default_rng(seed)

    def rand_stats(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        a = np.asarray(leaf)
        if name == "mean":
            return jnp.asarray(rng.normal(0.0, 0.5, a.shape).astype(np.float32))
        if name == "var":
            return jnp.asarray(rng.uniform(0.25, 4.0, a.shape).astype(np.float32))
        return leaf

    def rand_bn_params(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        if ("bn" in keys or any(k.startswith("bn") or k.endswith("_bn") for k in keys)):
            a = np.asarray(leaf)
            if keys[-1] == "scale":
                return jnp.asarray(rng.uniform(0.5, 1.5, a.shape).astype(np.float32))
            if keys[-1] == "bias":
                return jnp.asarray(rng.normal(0.0, 0.3, a.shape).astype(np.float32))
        return leaf

    variables = dict(variables)
    if "batch_stats" in variables:
        variables["batch_stats"] = jax.tree_util.tree_map_with_path(
            rand_stats, variables["batch_stats"])
    if "params" in variables:
        variables["params"] = jax.tree_util.tree_map_with_path(
            rand_bn_params, variables["params"])
    return variables


def _tree_paths(tree):
    return {
        tuple(getattr(p, "key", str(p)) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


@pytest.mark.parametrize("name", ["visformer_micro_80", "net5_80"])
def test_fold_is_exact(name):
    """Folded forward == unfolded eval forward, on randomized running stats.

    net5_80 exercises the extra branches: embed_norm=False (patch embeds pass
    through) and stage-1 attention (norm1 fold into qkv at head_dim_ratio 0.5).
    """
    m = models.make(name)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 80, 80, 3)).astype(np.float32))
    variables = _randomized_stats(m.init(jax.random.key(0), x, train=False))

    def tame_qkv(path, leaf):
        # fresh-init activations explode with depth (net5: ~3e4 by stage 3),
        # saturating attention softmax into an argmax whose ties flip under
        # the folded matmul's different rounding — chaos, not a fold property
        # (same taming as test_registry_parity, measured smooth at 0.02)
        keys = [getattr(p, "key", str(p)) for p in path]
        return leaf * 0.02 if "qkv" in keys else leaf

    variables = dict(variables)
    variables["params"] = jax.tree_util.tree_map_with_path(
        tame_qkv, variables["params"])

    dense_u, pooled_u = m.apply(variables, x, train=False)

    folded_vars = fold_visformer(jax.tree_util.tree_map(np.asarray, variables))
    mf = models.make(name, fold_bn=True)
    # the folded tree must be exactly what a fold_bn=True init expects
    ref_struct = _tree_paths(mf.init(jax.random.key(1), x, train=False))
    assert _tree_paths(folded_vars) == ref_struct

    dense_f, pooled_f = mf.apply(folded_vars, x, train=False)
    scale = float(np.abs(np.asarray(dense_u)).max())
    np.testing.assert_allclose(
        np.asarray(dense_f), np.asarray(dense_u), rtol=1e-5, atol=1e-5 * scale)
    np.testing.assert_allclose(
        np.asarray(pooled_f), np.asarray(pooled_u), rtol=1e-5, atol=1e-5 * scale)


def test_fold_levit_is_exact():
    """LeViT fold (the reference's own .fuse semantics, levit.py:150-196):
    folded forward == unfolded eval forward, and NO batch_stats survive
    (LeViT is fully post-norm — every BN has an adjacent matmul)."""
    from fewshot_vit_tpu.models.fold import fold_levit

    m = models.make("levit_micro_80")
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 80, 80, 3)).astype(np.float32))
    variables = _randomized_stats(m.init(jax.random.key(0), x, train=False))
    dense_u, pooled_u = m.apply(variables, x, train=False)

    folded_vars = fold_levit(jax.tree_util.tree_map(np.asarray, variables))
    assert "batch_stats" not in folded_vars
    mf = models.make("levit_micro_80", fold_bn=True)
    ref_struct = _tree_paths(mf.init(jax.random.key(1), x, train=False))
    assert _tree_paths(folded_vars) == ref_struct

    dense_f, pooled_f = mf.apply(folded_vars, x, train=False)
    scale = float(np.abs(np.asarray(dense_u)).max())
    np.testing.assert_allclose(
        np.asarray(dense_f), np.asarray(dense_u), rtol=1e-5, atol=1e-5 * scale)
    np.testing.assert_allclose(
        np.asarray(pooled_f), np.asarray(pooled_u), rtol=1e-5, atol=1e-5 * scale)


def test_fold_levit_head_level():
    """fold_encoder_in_head dispatches on Levit too (same head API)."""
    head = models.make("meta-baseline", encoder="levit_micro_80")
    xs = jnp.asarray(
        np.random.default_rng(6).normal(size=(1, 3, 1, 80, 80, 3)).astype(np.float32))
    xq = jnp.asarray(
        np.random.default_rng(7).normal(size=(1, 6, 80, 80, 3)).astype(np.float32))
    variables = head.init(jax.random.key(0), xs, xq)
    variables = {
        "params": variables["params"],
        "batch_stats": _randomized_stats(
            {"batch_stats": variables["batch_stats"]})["batch_stats"],
    }
    logits_u = head.apply(variables, xs, xq)
    fhead, fvars = fold_encoder_in_head(
        head, jax.tree_util.tree_map(np.asarray, variables))
    assert "batch_stats" not in fvars or "encoder" not in fvars["batch_stats"]
    logits_f = fhead.apply(fvars, xs, xq)
    np.testing.assert_allclose(
        np.asarray(logits_f), np.asarray(logits_u), rtol=1e-4, atol=1e-4)


def test_fold_removes_bn_params():
    m = models.make("visformer_micro_80")
    x = jnp.zeros((1, 80, 80, 3))
    v = m.init(jax.random.key(0), x, train=False)
    fv = fold_visformer(jax.tree_util.tree_map(np.asarray, v))
    paths = _tree_paths(fv)
    # only the final output norm survives in either collection
    bn_left = {p for p in paths if "bn" in "/".join(p) or "norm" in "/".join(p)}
    assert all(p[1] == "norm" for p in bn_left), sorted(bn_left)
    assert ("batch_stats", "norm", "bn", "mean") in paths


def test_fold_head_level():
    """fold_encoder_in_head on a MetaBaseline: identical episodic logits."""
    head = models.make("meta-baseline", encoder="visformer_micro_80")
    xs = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 5, 1, 80, 80, 3)).astype(np.float32))
    xq = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 10, 80, 80, 3)).astype(np.float32))
    variables = head.init(jax.random.key(0), xs, xq)
    variables = {
        "params": variables["params"],
        "batch_stats": _randomized_stats(
            {"batch_stats": variables["batch_stats"]})["batch_stats"],
    }
    logits_u = head.apply(variables, xs, xq)

    fhead, fvars = fold_encoder_in_head(
        head, jax.tree_util.tree_map(np.asarray, variables))
    logits_f = fhead.apply(fvars, xs, xq)
    np.testing.assert_allclose(
        np.asarray(logits_f), np.asarray(logits_u), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fold_cli_flag_identical_accuracy(tmp_path):
    """eval.run --fold-bn: same measured accuracy as the unfolded run on the
    same config/seed (the user-facing wiring of the fold transform)."""
    import os
    import re
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "dataset: synthetic\n"
        "dataset_args: {n_classes: 8, n_per_class: 20, image_size: 80}\n"
        "encoder: visformer_micro_80\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join([repo] + [p for p in sys.path if p])
    env.setdefault("JAX_PLATFORMS", "cpu")

    def run(extra):
        out = subprocess.run(
            [sys.executable, "-m", "fewshot_vit_tpu.eval.run", "--config",
             str(cfg), "--shot", "1", "--episodes", "8", *extra],
            capture_output=True, text=True, timeout=1200, cwd=repo, env=env)
        assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
        m = re.search(r"acc=([0-9.]+) \+- ([0-9.]+)", out.stdout)
        assert m, out.stdout
        return float(m.group(1))

    acc_u = run([])
    acc_f = run(["--fold-bn"])
    # fresh-init mean-0/var-1 stats make the transform numerically benign;
    # any wiring bug (wrong module structure, dropped params) would move
    # accuracy far beyond rounding
    assert abs(acc_u - acc_f) < 0.5, (acc_u, acc_f)


def test_fold_resnet12_is_exact():
    """ResNet-12 fold: every residual block is the ConvStem pattern; folded
    forward == unfolded eval forward, no batch_stats survive."""
    from fewshot_vit_tpu.models.fold import fold_resnet12

    m = models.make("resnet12-wide")
    x = jnp.asarray(
        np.random.default_rng(8).normal(size=(2, 80, 80, 3)).astype(np.float32))
    variables = _randomized_stats(m.init(jax.random.key(0), x, train=False))
    dense_u, pooled_u = m.apply(variables, x, train=False)

    folded_vars = fold_resnet12(jax.tree_util.tree_map(np.asarray, variables))
    assert "batch_stats" not in folded_vars
    mf = models.make("resnet12-wide", fold_bn=True)
    ref_struct = _tree_paths(mf.init(jax.random.key(1), x, train=False))
    assert _tree_paths(folded_vars) == ref_struct

    dense_f, pooled_f = mf.apply(folded_vars, x, train=False)
    scale = float(np.abs(np.asarray(dense_u)).max())
    np.testing.assert_allclose(
        np.asarray(dense_f), np.asarray(dense_u), rtol=1e-5, atol=1e-5 * scale)
    np.testing.assert_allclose(
        np.asarray(pooled_f), np.asarray(pooled_u), rtol=1e-5, atol=1e-5 * scale)


def test_fold_unsupported_encoder_raises():
    head = models.make("meta-baseline", encoder="convnet4")
    xs = jnp.zeros((1, 5, 1, 80, 80, 3))
    xq = jnp.zeros((1, 5, 80, 80, 3))
    v = head.init(jax.random.key(0), xs, xq)
    with pytest.raises(NotImplementedError):
        fold_encoder_in_head(head, v)

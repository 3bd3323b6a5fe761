"""int8 quantized eval path (models/quant.py): structure, exactness of the
weight grid, and end-metric preservation on the synthetic protocol.

Real-data accuracy cannot be validated on this box; these tests gate what
CAN be proven: the quantized variables exactly match a
``fold_bn=True, quant_int8=True`` init's structure, per-channel weight
dequantization is within one grid step, and 5-way episodic accuracy on a
separable synthetic dataset is preserved within noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.core import models, datasets
import fewshot_vit_tpu.models  # noqa: F401
import fewshot_vit_tpu.heads  # noqa: F401
import fewshot_vit_tpu.data.datasets  # noqa: F401
from fewshot_vit_tpu.models.fold import fold_visformer
from fewshot_vit_tpu.models.quant import (
    dynamic_quant,
    quantize_encoder_in_head,
    quantize_kernel,
    quantize_visformer,
)

from .test_fold import _randomized_stats, _tree_paths


def test_dynamic_quant_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(0, 3.0, (64, 33)))
    q, s = dynamic_quant(x)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q, np.float32) * float(s) - np.asarray(x))
    assert err.max() <= float(s) * 0.5 + 1e-6  # within half a grid step
    # symmetric: exact zero maps to exact zero (conv padding exactness)
    qz, _ = dynamic_quant(x.at[0, 0].set(0.0))
    assert int(qz[0, 0]) == 0


def test_quantize_kernel_per_channel():
    k = np.random.default_rng(1).normal(0, 1, (3, 3, 8, 16)).astype(np.float32)
    k[..., 3] *= 50.0  # one hot channel must not crush the others' grid
    qk, ws = quantize_kernel(k)
    deq = qk.astype(np.float32) * ws
    err = np.abs(deq - k)
    assert (err <= ws * 0.5 + 1e-6).all()
    assert ws.shape == (16,)


@pytest.mark.slow
def test_quant_structure_matches_init():
    m = models.make("visformer_micro_80")
    x = jnp.zeros((1, 80, 80, 3))
    v = m.init(jax.random.key(0), x, train=False)
    qv = quantize_visformer(fold_visformer(jax.tree_util.tree_map(np.asarray, v)))
    mq = models.make("visformer_micro_80", fold_bn=True, quant_int8=True)
    ref = _tree_paths(mq.init(jax.random.key(1), x, train=False))
    assert _tree_paths(qv) == ref
    # int8 kernels, f32 scales
    leaves = jax.tree_util.tree_leaves_with_path(qv["params"])
    kinds = {np.asarray(l).dtype.name
             for p, l in leaves if p[-1].key == "kernel"}
    assert kinds == {"int8"}


@pytest.mark.slow
def test_episodic_accuracy_preserved():
    """End metric: 5-way 1-shot accuracy on a separable synthetic dataset,
    fp32 head vs int8 head on the SAME episodes."""
    from fewshot_vit_tpu.eval.episodic import evaluate

    ds = datasets.make("synthetic", n_classes=10, n_per_class=20,
                       image_size=80, seed=0)
    head = models.make("meta-baseline", encoder="visformer_micro_80")
    xs = jnp.zeros((1, 5, 1, 80, 80, 3), jnp.float32)
    xq = jnp.zeros((1, 10, 80, 80, 3), jnp.float32)
    variables = head.init(jax.random.key(0), xs, xq)
    variables = {
        "params": variables["params"],
        "batch_stats": _randomized_stats(
            {"batch_stats": variables["batch_stats"]})["batch_stats"],
    }
    acc_f, _, _ = evaluate(head, variables, ds, n_episodes=16, shot=1,
                           query=10, ep_per_batch=8, seed=7)
    qhead, qvars = quantize_encoder_in_head(
        head, jax.tree_util.tree_map(np.asarray, variables))
    acc_q, _, _ = evaluate(qhead, qvars, ds, n_episodes=16, shot=1,
                           query=10, ep_per_batch=8, seed=7)
    assert acc_f > 0.7, acc_f  # the protocol is non-degenerate
    assert abs(acc_f - acc_q) < 0.08, (acc_f, acc_q)

    # static calibrated scales: same gate, and the graph carries the
    # baked 'ascale' params (quant_int8="static")
    from fewshot_vit_tpu.data.transforms import normalize

    calib = normalize(jnp.asarray(ds.images[:64]), ds.mean, ds.std)
    shead, svars = quantize_encoder_in_head(
        head, jax.tree_util.tree_map(np.asarray, variables),
        calib_images=calib)
    assert shead.encoder.quant_int8 == "static"
    paths = _tree_paths(svars["params"]["encoder"])
    assert any(p[-1] == "ascale" for p in paths)
    acc_s, _, _ = evaluate(shead, svars, ds, n_episodes=16, shot=1,
                           query=10, ep_per_batch=8, seed=7)
    assert abs(acc_f - acc_s) < 0.08, (acc_f, acc_s)


def test_quant_requires_fold():
    m = models.make("visformer_micro_80", quant_int8=True)  # no fold_bn
    with pytest.raises(ValueError, match="fold_bn"):
        m.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)), train=False)


def test_quant_unsupported_encoder_raises():
    head = models.make("meta-baseline", encoder="levit_micro_80")
    xs = jnp.zeros((1, 2, 1, 80, 80, 3))
    xq = jnp.zeros((1, 2, 80, 80, 3))
    v = head.init(jax.random.key(0), xs, xq)
    with pytest.raises(NotImplementedError, match="int8"):
        quantize_encoder_in_head(head, v)
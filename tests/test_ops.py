"""Unit + golden tests for the pure ops layer.

Golden expectations are computed with independent numpy implementations mirroring
the reference's documented semantics (SURVEY.md §2.1/§2.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.ops import (
    compute_logits,
    compute_acc,
    generate_soft_label,
    l2_normalize,
    make_nk_label,
    mean_confidence_interval,
    soft_target_cross_entropy,
    split_shot_query,
)
from fewshot_vit_tpu.ops.metric import per_episode_acc, roc_auc


class TestComputeLogits:
    def test_dot_2d(self):
        rng = np.random.default_rng(0)
        f = rng.normal(size=(7, 16)).astype(np.float32)
        p = rng.normal(size=(5, 16)).astype(np.float32)
        out = compute_logits(jnp.array(f), jnp.array(p), metric="dot", temp=2.0)
        np.testing.assert_allclose(np.asarray(out), 2.0 * f @ p.T, rtol=1e-5)

    def test_cos_matches_manual(self):
        rng = np.random.default_rng(1)
        f = rng.normal(size=(4, 8)).astype(np.float32)
        p = rng.normal(size=(3, 8)).astype(np.float32)
        fn = f / np.linalg.norm(f, axis=-1, keepdims=True)
        pn = p / np.linalg.norm(p, axis=-1, keepdims=True)
        out = compute_logits(jnp.array(f), jnp.array(p), metric="cos", temp=10.0)
        np.testing.assert_allclose(np.asarray(out), 10.0 * fn @ pn.T, rtol=1e-5)

    def test_sqr(self):
        rng = np.random.default_rng(2)
        f = rng.normal(size=(4, 8)).astype(np.float32)
        p = rng.normal(size=(3, 8)).astype(np.float32)
        expected = -((f[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        out = compute_logits(jnp.array(f), jnp.array(p), metric="sqr")
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)

    def test_batched_3d(self):
        rng = np.random.default_rng(3)
        f = rng.normal(size=(2, 4, 8)).astype(np.float32)
        p = rng.normal(size=(2, 3, 8)).astype(np.float32)
        out = compute_logits(jnp.array(f), jnp.array(p), metric="dot")
        expected = np.einsum("bqc,bnc->bqn", f, p)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)

    def test_l2_normalize_zero_safe(self):
        z = l2_normalize(jnp.zeros((2, 4)))
        assert np.all(np.isfinite(np.asarray(z)))


class TestEpisodes:
    def test_split_shot_query_order(self):
        # sampler emission order: episode-major, class-major, item-minor
        way, shot, query, ep = 3, 2, 4, 2
        n = ep * way * (shot + query)
        data = jnp.arange(n).reshape(n, 1, 1, 1)
        xs, xq = split_shot_query(data, way, shot, query, ep)
        assert xs.shape == (ep, way, shot, 1, 1, 1)
        assert xq.shape == (ep, way * query, 1, 1, 1)
        # episode 0, class 1 items are indices [6..11]; shots = first 2
        assert np.asarray(xs)[0, 1].reshape(-1).tolist() == [6, 7]
        # flattened query keeps way-major order: class-1 queries at rows 4..7
        assert np.asarray(xq)[0].reshape(-1).tolist()[4:8] == [8, 9, 10, 11]

    def test_make_nk_label(self):
        lab = make_nk_label(3, 2, ep_per_batch=2)
        assert lab.shape == (2, 6)
        assert np.asarray(lab)[0].tolist() == [0, 0, 1, 1, 2, 2]
        assert np.asarray(lab)[1].tolist() == [0, 0, 1, 1, 2, 2]


class TestSoftLabel:
    def _reference_numpy(self, logits, smoothing, k, bp):
        """Independent numpy mirror of offline.py:57-76 semantics."""
        b, t, c = logits.shape
        off = smoothing / c
        on = 1 - smoothing + off
        out = np.full((b, t, c + 1), off, np.float32)
        sal = logits.max(-1)  # (b, t)
        for i in range(b):
            keep = np.argsort(-sal[i], kind="stable")[: t - bp]
            fg = np.zeros(t, bool)
            fg[keep] = True
            for j in range(t):
                if fg[j]:
                    topk = np.argsort(-logits[i, j], kind="stable")[:k]
                    out[i, j, topk] = on
                else:
                    out[i, j, c] = on
        return out

    def test_matches_reference_semantics(self):
        rng = np.random.default_rng(7)
        logits = rng.normal(size=(2, 25, 12)).astype(np.float32)
        got = np.asarray(generate_soft_label(jnp.array(logits), 0.1, k=5, bg_tokens=10))
        want = self._reference_numpy(logits, 0.1, 5, 10)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_rows_sum(self):
        # each row: off*(c+1) + k*(on-off) for fg; off*(c+1)+(on-off) for bg
        logits = jnp.array(np.random.default_rng(8).normal(size=(1, 25, 64)), jnp.float32)
        sl = np.asarray(generate_soft_label(logits, 0.1, k=5, bg_tokens=10))
        c = 64
        off = 0.1 / c
        on = 1 - 0.1 + off
        fg_sum = off * (c + 1) + 5 * (on - off)
        bg_sum = off * (c + 1) + (on - off)
        sums = sl.sum(-1)
        assert np.all(
            np.isclose(sums, fg_sum, atol=1e-5) | np.isclose(sums, bg_sum, atol=1e-5)
        )
        assert np.isclose(sums, bg_sum, atol=1e-5).sum() == 10

    @pytest.mark.slow
    def test_reference_bg_label_defect_proof(self):
        """Executed proof of the reference defect this port fixes by evident
        intent: ``offline.py:71`` fills ``bg_map`` with ``c`` where ``c`` is
        ``logits_max.size(1)`` — which is **1** after ``max(dim=1,
        keepdim=True)`` (:61-62) — so background tokens are scattered onto
        REAL CLASS 1, not the background class ``n_classes`` that the
        (C+1)-wide label space (:73-74) and the ``n_classes+1``
        ``classifier_local`` allocation (token_label.py:43) exist for. Our
        ``generate_soft_label`` labels them class C; the only difference from
        the real reference output is exactly that one index per bg row."""
        from . import ref_loader

        if not ref_loader.available():
            pytest.skip("reference/torch not available")
        import torch

        off = ref_loader.load_sun_offline()
        rng = np.random.default_rng(11)
        c, k, bp = 12, 5, 10
        logits_nhwc = rng.normal(size=(2, 5, 5, c)).astype(np.float32)
        # the reference's :69 ``.view`` only works on NCHW tensors whose
        # storage is NHWC — exactly what TokenLabelOffline.forward produces
        # (token_label.py:50-56 permutes a channels-last classifier output)
        ref = off.generate_softlabel(
            torch.from_numpy(logits_nhwc).permute(0, 3, 1, 2), k=k, bp=bp,
            device="cpu").numpy()  # (2*25, c+1)
        on_count = (ref > 0.5).sum(1)
        bg_rows = on_count == 1  # fg rows carry k=5 on-values
        assert bg_rows.sum() == 2 * bp
        # the defect, by execution: every bg row's on-value sits at index 1
        assert (ref[bg_rows].argmax(1) == 1).all()
        assert not (ref[bg_rows].argmax(1) == c).any()
        # our output == the reference with ONLY that index moved to class C
        off_v, on_v = 0.1 / c, 1 - 0.1 + 0.1 / c
        fixed = ref.copy()
        fixed[bg_rows, 1] = off_v
        fixed[bg_rows, c] = on_v
        ours = np.asarray(generate_soft_label(
            jnp.asarray(logits_nhwc.reshape(2, 25, c)),
            0.1, k=k, bg_tokens=bp)).reshape(-1, c + 1)
        np.testing.assert_allclose(ours, fixed, atol=1e-6)

    def test_soft_ce(self):
        rng = np.random.default_rng(9)
        x = rng.normal(size=(6, 5)).astype(np.float32)
        tgt = rng.dirichlet(np.ones(5), size=6).astype(np.float32)
        got = float(soft_target_cross_entropy(jnp.array(x), jnp.array(tgt)))
        lse = np.log(np.exp(x).sum(-1, keepdims=True))
        want = float(np.mean(np.sum(-tgt * (x - lse), -1)))
        assert abs(got - want) < 1e-5


class TestStats:
    def test_compute_acc(self):
        logits = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
        label = jnp.array([0, 1, 1])
        assert float(compute_acc(logits, label)) == pytest.approx(2 / 3)

    def test_per_episode_acc(self):
        logits = jnp.array([[[1.0, 0.0], [0.0, 1.0]], [[1.0, 0.0], [1.0, 0.0]]])
        label = jnp.array([[0, 1], [1, 1]])
        acc = np.asarray(per_episode_acc(logits, label))
        np.testing.assert_allclose(acc, [1.0, 0.0])

    def test_ci_matches_scipy_direct(self):
        from scipy import stats

        rng = np.random.default_rng(11)
        a = rng.uniform(0.5, 0.9, size=200)
        m, h = mean_confidence_interval(a)
        assert m == pytest.approx(a.mean())
        se = stats.sem(a)
        assert h == pytest.approx(se * stats.t.ppf(0.975, 199))

    def test_roc_auc(self):
        scores = np.array([0.1, 0.4, 0.35, 0.8])
        labels = np.array([0, 0, 1, 1])
        # sklearn.roc_auc_score gives 0.75 for this classic example
        assert roc_auc(scores, labels) == pytest.approx(0.75)


class TestNpRngStreams:
    def test_epoch_streams_independent_and_epoch0_stable(self):
        """np_rng(seed, epoch): epochs must be INDEPENDENT Philox keys, not
        counter offsets (counter=e vs e+1 is the same stream shifted by one
        4-value block — adjacent epochs shared ~99.6% of draws). Epoch 0 must
        stay bit-identical to Philox(key=seed) for golden stability."""
        import numpy as np

        from fewshot_vit_tpu.core.rng import np_rng

        a = np_rng(12345, 0).integers(0, 2**63, 100)
        b = np.random.Generator(np.random.Philox(key=12345)).integers(0, 2**63, 100)
        np.testing.assert_array_equal(a, b)
        e0 = set(np_rng(7, 3).integers(0, 2**63, 1000).tolist())
        e1 = set(np_rng(7, 4).integers(0, 2**63, 1000).tolist())
        assert not (e0 & e1)

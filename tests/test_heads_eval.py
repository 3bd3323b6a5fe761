"""Heads + episodic eval engine tests (tiny encoder for speed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from fewshot_vit_tpu.core import models, datasets
import fewshot_vit_tpu.models  # noqa: F401
import fewshot_vit_tpu.heads  # noqa: F401
import fewshot_vit_tpu.data.datasets  # noqa: F401
from fewshot_vit_tpu.data.sampler import EpisodeSampler
from fewshot_vit_tpu.core import rng as rng_mod
from fewshot_vit_tpu.eval.episodic import (
    encode_dataset,
    evaluate,
    evaluate_cached,
    sub_variables,
)
from fewshot_vit_tpu.heads import MetaBaseline, TokenLabel, TokenLabelEpisodic
from fewshot_vit_tpu.ops.metric import compute_logits

from . import ref_loader


class IdentityEncoder(nn.Module):
    """Pass-through (dense=input NHWC, pooled=spatial mean) — lets head math
    be compared module-vs-module with a torch twin, no weights involved."""

    @nn.compact
    def __call__(self, x, train=False):
        return x, jnp.mean(x, axis=(1, 2))

    @property
    def out_dim(self):
        return 3


class TinyEncoder(nn.Module):
    """Minimal (dense, pooled) encoder for fast tests."""

    dim: int = 16
    dtype: type | None = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.dim, (3, 3), strides=4, dtype=self.dtype, name="conv")(x)
        x = nn.avg_pool(x, (2, 2), (2, 2))
        return x, jnp.mean(x, axis=(1, 2))

    @property
    def out_dim(self):
        return self.dim


class TestMetaBaseline:
    def test_logits_match_manual(self):
        enc = TinyEncoder()
        head = MetaBaseline(encoder=enc)
        e, way, shot, q = 2, 5, 3, 10
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.normal(size=(e, way, shot, 16, 16, 3)), jnp.float32)
        xq = jnp.asarray(rng.normal(size=(e, q, 16, 16, 3)), jnp.float32)
        variables = head.init(jax.random.key(0), xs, xq)
        logits = head.apply(variables, xs, xq)
        assert logits.shape == (e, q, way)

        # manual: encode separately, mean-protos, cosine @ temp
        _, ps = enc.apply({"params": variables["params"]["encoder"]}, xs.reshape(-1, 16, 16, 3))
        _, pq = enc.apply({"params": variables["params"]["encoder"]}, xq.reshape(-1, 16, 16, 3))
        proto = ps.reshape(e, way, shot, -1).mean(2)
        want = compute_logits(pq.reshape(e, q, -1), proto, "cos", 10.0)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_registry_ctor_with_visformer(self):
        head = models.make("meta-baseline", encoder="visformer_micro_80")
        assert isinstance(head, MetaBaseline)
        assert head.encoder.out_dim == 512


class TestTokenLabel:
    def test_student_teacher_routing(self):
        head = TokenLabel(encoder=TinyEncoder(), n_classes=7)
        x = jnp.zeros((2, 16, 16, 3))
        variables = head.init(jax.random.key(0), x)
        yt, y, pooled = head.apply(variables, x)
        assert yt.shape == (2, 2, 2, 8)  # C+1 local classes
        assert y.shape == (2, 7)
        yt_t, y_t, _ = head.apply(variables, x, is_teacher=True)
        assert yt_t.shape == (2, 2, 2, 7)  # teacher uses global C-way classifier

    def test_episodic_head_shapes(self):
        head = TokenLabelEpisodic(encoder=TinyEncoder())
        xs = jnp.zeros((2, 5, 1, 16, 16, 3))
        xq = jnp.zeros((2, 15, 16, 16, 3))
        variables = head.init(jax.random.key(0), xs, xq)
        local, cls = head.apply(variables, xs, xq)
        assert local.shape == (2, 15, 5)
        assert cls.shape == (2, 15, 5)

    def test_local_logits_match_numpy_mirror(self):
        """Golden anchor for the local top-1 matching branch (the reference's
        code at sun_meta_training/models/token_label.py:89 is broken dead
        research — see the head docstring — so the *intended* math is pinned
        against an independent numpy mirror): per query patch, best cosine
        over ALL support patches of a class, averaged over query patches."""
        rng = np.random.default_rng(5)
        e, way, shot, q, hw = 2, 3, 2, 4, 4
        xs = rng.normal(size=(e, way, shot, hw, hw, 3)).astype(np.float32)
        xq = rng.normal(size=(e, q, hw, hw, 3)).astype(np.float32)

        head = TokenLabelEpisodic(encoder=IdentityEncoder())
        v = head.init(jax.random.key(0), jnp.asarray(xs), jnp.asarray(xq))
        local, cls = head.apply(v, jnp.asarray(xs), jnp.asarray(xq))

        def norm(a):
            return a / np.linalg.norm(a, axis=-1, keepdims=True)

        t = hw * hw
        feat_s = xs.reshape(e, way, shot * t, 3)
        feat_q = xq.reshape(e, q, t, 3)
        want_local = np.zeros((e, q, way), np.float32)
        for ei in range(e):
            for qi in range(q):
                for ni in range(way):
                    sims = norm(feat_q[ei, qi]) @ norm(feat_s[ei, ni]).T
                    want_local[ei, qi, ni] = sims.max(-1).mean()
        np.testing.assert_allclose(np.asarray(local), want_local,
                                   rtol=1e-5, atol=1e-5)
        # cls branch mirror: cosine of pooled query vs shot-mean prototype, x10
        pooled_s = xs.mean((3, 4)).mean(2)  # (E, way, 3)
        pooled_q = xq.mean((2, 3))  # (E, q, 3)
        want_cls = 10.0 * np.einsum(
            "eqc,ewc->eqw", norm(pooled_q), norm(pooled_s))
        np.testing.assert_allclose(np.asarray(cls), want_cls, rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    @pytest.mark.skipif(not ref_loader.available(),
                        reason="reference/torch not available")
    def test_cls_logits_match_reference_cls_path(self):
        """Anchor the cls-logits branch against the reference's OWN code.

        The full reference forward (sun_meta_training/models/token_label.py:
        74-106) cannot run for ANY input rank: the local branch (:89-95) only
        typechecks with a 5-dim flat query while the cls reshape (:103)
        assumes a 6-dim (b, way, q_per) query — verified by execution. The
        cls-path lines themselves (:98-106: shot-mean -> F.normalize -> the
        reference's utils.compute_logits, metric='dot', temp=10) are
        well-defined at the rank they assume, so they are executed verbatim
        here and compared to our head (VERDICT r2 #10)."""
        import torch
        import torch.nn.functional as F

        tp = ref_loader.load_test_phase()  # the reference utils.compute_logits

        rng = np.random.default_rng(6)
        e, way, shot, qper, hw = 2, 3, 2, 4, 4
        xs = rng.normal(size=(e, way, shot, hw, hw, 3)).astype(np.float32)
        xq = rng.normal(size=(e, way, qper, hw, hw, 3)).astype(np.float32)

        # reference cls path (token_label.py:85,96-106) with the identity
        # encoder's pooled features (spatial mean)
        with torch.no_grad():
            ps = torch.from_numpy(xs.mean((3, 4)))  # (e, way, shot, c)
            pq = torch.from_numpy(xq.mean((3, 4)))  # (e, way, qper, c)
            x_shot = ps.mean(dim=-2)  # :98
            x_query = pq.reshape(pq.size(0), pq.size(1) * pq.size(2), -1)  # :103
            x_shot = F.normalize(x_shot, dim=-1)  # :100
            x_query = F.normalize(x_query, dim=-1)  # :101
            want_cls = tp.utils.compute_logits(
                x_query, x_shot, metric="dot", temp=10.0)  # :104-105

        head = TokenLabelEpisodic(encoder=IdentityEncoder())
        xq_flat = jnp.asarray(xq.reshape(e, way * qper, hw, hw, 3))
        v = head.init(jax.random.key(0), jnp.asarray(xs), xq_flat)
        _, cls = head.apply(v, jnp.asarray(xs), xq_flat)
        np.testing.assert_allclose(np.asarray(cls), want_cls.numpy(),
                                   rtol=1e-4, atol=1e-5)


class TestSampler:
    def test_structure_and_determinism(self):
        labels = np.repeat(np.arange(10), 30)
        s = EpisodeSampler(labels, n_batch=4, n_way=5, n_per=4, ep_per_batch=3)
        b1 = s.batch(rng_mod.np_rng(7))
        b2 = s.batch(rng_mod.np_rng(7))
        np.testing.assert_array_equal(b1, b2)
        eps = b1.reshape(3, 5, 4)
        for e in range(3):
            cls = labels[eps[e, :, 0]]
            assert len(set(cls.tolist())) == 5  # distinct classes
            for c in range(5):
                assert (labels[eps[e, c]] == cls[c]).all()  # class-major rows
                assert len(set(eps[e, c].tolist())) == 4  # distinct items

    def test_validates_inputs(self):
        labels = np.repeat(np.arange(3), 5)
        with pytest.raises(ValueError):
            EpisodeSampler(labels, 1, n_way=4, n_per=2)
        with pytest.raises(ValueError):
            EpisodeSampler(labels, 1, n_way=2, n_per=9)


class TestEvalEngine:
    @pytest.fixture(scope="class")
    def setup(self):
        ds = datasets.make("synthetic", n_classes=12, n_per_class=25, image_size=16)
        enc = TinyEncoder()
        head = MetaBaseline(encoder=enc, temp_learnable=False)
        xs = jnp.zeros((1, 5, 1, 16, 16, 3))
        xq = jnp.zeros((1, 15, 16, 16, 3))
        variables = head.init(jax.random.key(0), xs, xq)
        return ds, enc, head, variables

    def test_full_eval_above_chance(self, setup):
        ds, enc, head, variables = setup
        acc, ci, accs = evaluate(
            head, variables, ds, n_episodes=16, way=5, shot=1, query=15,
            ep_per_batch=4, seed=3,
        )
        assert accs.shape == (16,)
        assert acc > 0.4  # synthetic classes are nearly separable; chance = 0.2
        assert ci >= 0

    def test_cached_equals_full(self, setup):
        """Deterministic transform => cached-features eval must reproduce the
        full-protocol accuracies exactly (same seed => same episodes)."""
        ds, enc, head, variables = setup
        _, _, accs_full = evaluate(
            head, variables, ds, n_episodes=12, way=5, shot=2, query=7,
            ep_per_batch=4, seed=11,
        )
        enc_vars = sub_variables(variables, "encoder")
        _, _, accs_cached = evaluate_cached(
            enc, enc_vars, ds, n_episodes=12, way=5, shot=2, query=7,
            ep_per_batch=4, seed=11,
        )
        np.testing.assert_allclose(accs_full, accs_cached, atol=1e-6)

    def test_encode_dataset_pads_correctly(self, setup):
        ds, enc, head, variables = setup
        enc_vars = sub_variables(variables, "encoder")
        feats = encode_dataset(enc, enc_vars, ds, batch_size=64)
        assert feats.shape == (len(ds), 16)


class TestShardedEval:
    def test_mesh_eval_matches_single(self, devices8):
        """Episode-parallel eval over an 8-device data mesh must reproduce the
        single-device accuracies exactly."""
        from fewshot_vit_tpu.core import datasets as dataset_registry
        from fewshot_vit_tpu.parallel import make_mesh

        ds = dataset_registry.make("synthetic", n_classes=12, n_per_class=25, image_size=16)
        head = MetaBaseline(encoder=TinyEncoder(), temp_learnable=False)
        xs = jnp.zeros((1, 5, 1, 16, 16, 3))
        xq = jnp.zeros((1, 15, 16, 16, 3))
        variables = head.init(jax.random.key(0), xs, xq)

        _, _, accs_single = evaluate(
            head, variables, ds, n_episodes=16, way=5, shot=1, query=15,
            ep_per_batch=8, seed=7,
        )
        mesh = make_mesh({"data": 8}, devices8)
        _, _, accs_mesh = evaluate(
            head, variables, ds, n_episodes=16, way=5, shot=1, query=15,
            ep_per_batch=8, seed=7, mesh=mesh,
        )
        np.testing.assert_allclose(accs_single, accs_mesh, atol=1e-6)


class TestEvalRunCacheBound:
    def test_lru_is_bounded_and_reuses_hits(self):
        """The jitted-program cache must stay bounded (entries pin models and
        compiled executables) while still returning the same callable for a
        repeated (model, config) so per-epoch eval never recompiles."""
        from fewshot_vit_tpu.eval import episodic as ep

        head = MetaBaseline(encoder=TinyEncoder(), temp_learnable=False)
        first = ep._eval_run_fn(head, 5, 1, 15, 4, (0.5,), (0.5,))
        assert ep._eval_run_fn(head, 5, 1, 15, 4, (0.5,), (0.5,)) is first
        for q in range(2, 2 + ep._EVAL_RUN_CACHE_MAX + 3):
            ep._eval_run_fn(head, 5, 1, q, 4, (0.5,), (0.5,))
        assert len(ep._EVAL_RUN_CACHE) <= ep._EVAL_RUN_CACHE_MAX

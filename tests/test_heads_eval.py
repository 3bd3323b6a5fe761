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

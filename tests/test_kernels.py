"""Pallas kernels: correctness vs XLA references (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.kernels.attention import attention_core, fused_mhsa
from fewshot_vit_tpu.kernels.sinkhorn import sinkhorn_pallas
from fewshot_vit_tpu.ops.emd import normalize_weights, sinkhorn


class TestSinkhornKernel:
    def test_matches_xla_sinkhorn(self):
        rng = np.random.default_rng(0)
        b, n = 12, 25
        cost = jnp.asarray(rng.uniform(0, 1, (b, n, n)), jnp.float32)
        w1 = normalize_weights(jnp.asarray(rng.uniform(0, 1, (b, n)), jnp.float32))
        w2 = normalize_weights(jnp.asarray(rng.uniform(0, 1, (b, n)), jnp.float32))
        want = np.asarray(sinkhorn(cost, w1, w2, reg=0.05, iters=50))
        got = np.asarray(
            sinkhorn_pallas(cost, w1, w2, reg=0.05, iters=50, block_b=8, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_padding_path(self):
        rng = np.random.default_rng(1)
        b, n = 5, 9  # not a multiple of block_b
        cost = jnp.asarray(rng.uniform(0, 1, (b, n, n)), jnp.float32)
        w1 = normalize_weights(jnp.asarray(rng.uniform(0, 1, (b, n)), jnp.float32))
        w2 = normalize_weights(jnp.asarray(rng.uniform(0, 1, (b, n)), jnp.float32))
        got = np.asarray(sinkhorn_pallas(cost, w1, w2, iters=30, block_b=4, interpret=True))
        want = np.asarray(sinkhorn(cost, w1, w2, iters=30))
        assert got.shape == (b, n, n)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestSolverDispatch:
    def test_head_sinkhorn_pallas_matches_xla(self, monkeypatch):
        """solver='sinkhorn_pallas' routes emd_logits through the kernel and
        agrees with the XLA scan path."""
        import fewshot_vit_tpu.kernels.sinkhorn as ks
        from fewshot_vit_tpu.heads.deepemd import emd_logits

        orig = ks.sinkhorn_pallas
        monkeypatch.setattr(
            ks, "sinkhorn_pallas",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}),
        )
        rng = np.random.default_rng(4)
        proto = jnp.asarray(rng.normal(size=(3, 25, 16)), jnp.float32)
        query = jnp.asarray(rng.normal(size=(6, 25, 16)), jnp.float32)
        got = np.asarray(emd_logits(proto, query, solver_impl="pallas"))
        want = np.asarray(emd_logits(proto, query))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestAttentionKernel:
    def test_matches_xla_attention(self):
        rng = np.random.default_rng(2)
        b, h, t, hd = 3, 6, 100, 42  # visformer stage-2 geometry
        q, k, v = (jnp.asarray(rng.normal(size=(b, h, t, hd)), jnp.float32) for _ in range(3))
        scale = hd ** -0.5
        got = np.asarray(fused_mhsa(q, k, v, scale, interpret=True))
        attn = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale, -1)
        want = np.asarray(jnp.einsum("bhqk,bhkd->bhqd", attn, v))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_attention_core_fallback_on_cpu(self):
        # on CPU attention_core must take the XLA path and agree with einsum
        rng = np.random.default_rng(3)
        b, t, h, hd = 2, 25, 4, 16
        q, k, v = (jnp.asarray(rng.normal(size=(b, t, h, hd)), jnp.float32) for _ in range(3))
        out = attention_core(q, k, v, hd ** -0.5, use_pallas=True)
        attn = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd ** -0.5, -1)
        want = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)

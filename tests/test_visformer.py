"""Visformer: shape/contract unit tests + numerical parity vs the reference torch model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.core import models
import fewshot_vit_tpu.models  # noqa: F401 — registers encoders
from fewshot_vit_tpu.checkpoint.torch_convert import convert_visformer

from . import ref_loader


def _init(model, img=80):
    return model.init(jax.random.key(0), jnp.zeros((1, img, img, 3)), train=False)


class TestShapes:
    def test_micro_contract(self):
        model = models.make("visformer_micro_80")
        assert model.out_dim == 512
        variables = _init(model)
        dense, pooled = model.apply(
            variables, jnp.zeros((2, 80, 80, 3)), train=False
        )
        assert dense.shape == (2, 5, 5, 512)
        assert pooled.shape == (2, 512)

    def test_train_mode_mutates_batch_stats(self):
        model = models.make("visformer_micro_80", drop_path_rate=0.1)
        variables = _init(model)
        (dense, pooled), mutated = model.apply(
            variables,
            jnp.ones((2, 80, 80, 3)),
            train=True,
            mutable=["batch_stats"],
            rngs={"droppath": jax.random.key(1)},
        )
        assert "batch_stats" in mutated
        # running stats must actually move
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        )

    def test_param_count_micro(self):
        variables = _init(models.make("visformer_micro_80"))
        n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"]))
        # reference __main__ (visformer.py:502-511) reports ~12.4M for this config;
        # exact value asserted in the parity test below; sanity band here
        assert 5e6 < n < 20e6


@pytest.mark.slow
@pytest.mark.skipif(not ref_loader.available(), reason="reference/torch not available")
class TestTorchParity:
    @pytest.fixture(scope="class")
    def torch_net(self):
        import torch

        ref = ref_loader.load_ref_model_module("sun_meta_training", "visformer")
        torch.manual_seed(0)
        net = ref.visformer_small_80()  # registered as visformer_micro_80
        net.eval()
        return net

    def test_param_count_matches(self, torch_net):
        n_torch = sum(p.numel() for p in torch_net.parameters())
        variables = _init(models.make("visformer_micro_80"))
        n_flax = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"])
        )
        assert n_flax == n_torch

    def test_logit_parity(self, torch_net):
        import torch

        sd = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
        model = models.make("visformer_micro_80")
        variables = jax.tree_util.tree_map(np.asarray, _init(model))
        converted = convert_visformer(variables, sd)

        rng = np.random.default_rng(42)
        x = rng.normal(size=(2, 3, 80, 80)).astype(np.float32)
        with torch.no_grad():
            dense_t, pooled_t = torch_net(torch.from_numpy(x))
        dense_j, pooled_j = model.apply(
            converted, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
        )
        # measured fp32 accumulation noise: max_abs ~7e-4 on activations of
        # scale ~34 (2e-5 relative); atol dominates for near-zero elements
        np.testing.assert_allclose(
            np.asarray(pooled_j), pooled_t.numpy(), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(dense_j).transpose(0, 3, 1, 2), dense_t.numpy(),
            rtol=2e-3, atol=2e-3,
        )

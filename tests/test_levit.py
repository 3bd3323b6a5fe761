"""LeViT: contract + torch parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.core import models
import fewshot_vit_tpu.models  # noqa: F401
from fewshot_vit_tpu.checkpoint.torch_convert import convert_by_rule, levit_key

from . import ref_loader


class TestContract:
    def test_shapes(self):
        m = models.make("levit_micro_80")
        assert m.out_dim == 512
        v = m.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)), train=False)
        d, p = m.apply(v, jnp.zeros((2, 80, 80, 3)), train=False)
        assert d.shape == (2, 5, 5, 512)
        assert p.shape == (2, 512)


@pytest.mark.slow
@pytest.mark.skipif(not ref_loader.available(), reason="reference/torch not available")
class TestTorchParity:
    def test_levit_micro(self):
        import torch
        from . import timm_shim

        timm_shim.install()
        ref = ref_loader.load_ref_model_module("sun_meta_training", "levit")
        torch.manual_seed(0)
        net = ref.levit_micro_80().eval()
        m = models.make("levit_micro_80")
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        v0 = jax.tree_util.tree_map(
            np.asarray,
            m.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)), train=False),
        )
        cv = convert_by_rule(v0, sd, levit_key)
        n_torch = sum(p.numel() for p in net.parameters())
        n_flax = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v0["params"]))
        assert n_flax == n_torch

        x = np.random.default_rng(0).normal(size=(2, 3, 80, 80)).astype(np.float32)
        with torch.no_grad():
            dense_t, pooled_t = net(torch.from_numpy(x))
        dense_j, pooled_j = m.apply(cv, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        np.testing.assert_allclose(np.asarray(pooled_j), pooled_t.numpy(), rtol=2e-3, atol=2e-3)
        # reference reshapes (B, N, C) -> view(B,H,W,C).permute -> NCHW map
        np.testing.assert_allclose(
            np.asarray(dense_j).transpose(0, 3, 1, 2), dense_t.numpy(),
            rtol=2e-3, atol=2e-3,
        )

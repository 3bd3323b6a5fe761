"""Swin: contract + torch parity (via the timm shim)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.core import models
import fewshot_vit_tpu.models  # noqa: F401
from fewshot_vit_tpu.checkpoint.torch_convert import convert_by_rule, swin_key

from . import ref_loader


class TestContracts:
    def test_nano_shapes(self):
        m = models.make("swin_nano_patch4_window5_80")
        assert m.out_dim == 512
        v = m.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)), train=False)
        d, p = m.apply(v, jnp.zeros((2, 96, 96, 3)), train=False)
        assert d.shape == (2, 3, 3, 512)
        assert p.shape == (2, 512)

    def test_resembed_shapes(self):
        m = models.make("swin_micro_resembed_80")
        assert m.out_dim == 576
        v = m.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)), train=False)
        d, p = m.apply(v, jnp.zeros((2, 80, 80, 3)), train=False)
        assert d.shape == (2, 5, 5, 576)
        assert p.shape == (2, 576)


@pytest.mark.slow
@pytest.mark.skipif(not ref_loader.available(), reason="reference/torch not available")
class TestTorchParity:
    def _parity(self, torch_net, flax_model, img, tol=2e-3, dense_is_seq=True):
        import torch

        torch_net.eval()
        sd = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
        v0 = jax.tree_util.tree_map(
            np.asarray,
            flax_model.init(jax.random.key(0), jnp.zeros((1, img, img, 3)), train=False),
        )
        cv = convert_by_rule(v0, sd, swin_key)
        n_torch = sum(p.numel() for p in torch_net.parameters())
        n_flax = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v0["params"]))
        assert n_flax == n_torch

        x = np.random.default_rng(0).normal(size=(2, 3, img, img)).astype(np.float32)
        with torch.no_grad():
            dense_t, pooled_t = torch_net(torch.from_numpy(x))
        dense_j, pooled_j = flax_model.apply(
            cv, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
        )
        np.testing.assert_allclose(
            np.asarray(pooled_j), pooled_t.numpy(), rtol=tol, atol=tol
        )
        b = dense_j.shape[0]
        if dense_is_seq:  # reference plain-swin returns (B, L, C)
            got = np.asarray(dense_j).reshape(b, -1, dense_j.shape[-1])
            np.testing.assert_allclose(got, dense_t.numpy(), rtol=tol, atol=tol)
        else:  # 3conv copy returns an NCHW map
            np.testing.assert_allclose(
                np.asarray(dense_j).transpose(0, 3, 1, 2), dense_t.numpy(),
                rtol=tol, atol=tol,
            )

    def test_swin_nano(self):
        import torch
        from . import timm_shim

        timm_shim.install()
        ref = ref_loader.load_ref_model_module("sun_meta_training", "swin_transformer")
        torch.manual_seed(0)
        net = ref.swin_nano_patch4_window5_80()
        self._parity(net, models.make("swin_nano_patch4_window5_80"), 96)

    def test_swin_micro_resembed(self):
        import torch
        from . import timm_shim

        timm_shim.install()
        ref = ref_loader.load_ref_model_module("sun_meta_training", "swin_3conv")
        torch.manual_seed(1)
        net = ref.swin_micro_v2_80()
        self._parity(net, models.make("swin_micro_resembed_80"), 80, dense_is_seq=False)

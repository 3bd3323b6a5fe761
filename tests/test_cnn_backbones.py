"""CNN backbones: contract + numerical parity vs the reference torch models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.core import models
import fewshot_vit_tpu.models  # noqa: F401
from fewshot_vit_tpu.checkpoint.torch_convert import (
    convert_by_rule,
    convnet4_key,
    resnet_key,
)

from . import ref_loader


def _init(model, img=80):
    return model.init(jax.random.key(0), jnp.zeros((1, img, img, 3)), train=False)


class TestContracts:
    @pytest.mark.parametrize(
        "name,out_dim,dense",
        [
            ("resnet12", 512, (2, 5, 5, 512)),
            ("resnet12-wide", 640, (2, 5, 5, 640)),
            ("resnet18", 512, (2, 3, 3, 512)),
            ("resnet50", 2048, (2, 3, 3, 2048)),
            ("convnet4", 1600, (2, 5, 5, 64)),
        ],
    )
    def test_shapes(self, name, out_dim, dense):
        m = models.make(name)
        assert m.out_dim == out_dim
        v = _init(m)
        d, p = m.apply(v, jnp.zeros((2, 80, 80, 3)), train=False)
        assert d.shape == dense
        assert p.shape == (2, out_dim)


@pytest.mark.slow
@pytest.mark.skipif(not ref_loader.available(), reason="reference/torch not available")
class TestTorchParity:
    def _parity(self, torch_net, flax_model, key_fn, img=80, tol=2e-3,
                pooled_only=False):
        import torch

        torch_net.eval()
        sd = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
        v0 = jax.tree_util.tree_map(np.asarray, _init(flax_model, img))
        cv = convert_by_rule(v0, sd, key_fn)
        n_torch = sum(p.numel() for p in torch_net.parameters())
        n_flax = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v0["params"]))
        assert n_flax == n_torch

        x = np.random.default_rng(0).normal(size=(2, 3, img, img)).astype(np.float32)
        with torch.no_grad():
            ref_out = torch_net(torch.from_numpy(x))
        out = flax_model.apply(cv, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        if pooled_only:
            np.testing.assert_allclose(
                np.asarray(out[1]), ref_out.numpy(), rtol=tol, atol=tol
            )
        else:
            dense_t, pooled_t = ref_out
            np.testing.assert_allclose(
                np.asarray(out[1]), pooled_t.numpy(), rtol=tol, atol=tol
            )
            np.testing.assert_allclose(
                np.asarray(out[0]).transpose(0, 3, 1, 2), dense_t.numpy(),
                rtol=tol, atol=tol,
            )

    def test_resnet12(self):
        import torch

        ref = ref_loader.load_ref_model_module("sun_meta_training", "resnet12")
        torch.manual_seed(0)
        self._parity(ref.resnet12(), models.make("resnet12"), resnet_key)

    def test_resnet18(self):
        import torch

        ref = ref_loader.load_ref_model_module("sun_meta_training", "resnet")
        torch.manual_seed(1)
        self._parity(ref.resnet18(), models.make("resnet18"), resnet_key)

    def test_resnet50(self):
        import torch

        ref = ref_loader.load_ref_model_module("sun_meta_training", "resnet")
        torch.manual_seed(2)
        self._parity(ref.resnet50(), models.make("resnet50"), resnet_key, tol=5e-3)

    def test_convnet4(self):
        import torch

        ref = ref_loader.load_ref_model_module("sun_meta_training", "convnet4")
        torch.manual_seed(3)
        self._parity(ref.ConvNet4(), models.make("convnet4"), convnet4_key,
                     pooled_only=True)


@pytest.mark.slow
@pytest.mark.skipif(not ref_loader.available(), reason="reference/torch not available")
class TestDeiTParity:
    def test_deit_nano_84(self):
        import torch
        from . import timm_shim

        timm_shim.install()
        from fewshot_vit_tpu.checkpoint.torch_convert import deit_key

        ref = ref_loader.load_ref_model_module("sun_meta_training", "deit")
        torch.manual_seed(4)
        net = ref.deit_nano_patch6_84().eval()
        m = models.make("deit_nano_patch6_84")
        assert m.out_dim == 224
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        v0 = jax.tree_util.tree_map(np.asarray, _init(m, 84))
        from fewshot_vit_tpu.checkpoint.torch_convert import convert_by_rule

        cv = convert_by_rule(v0, sd, deit_key)
        x = np.random.default_rng(1).normal(size=(2, 3, 84, 84)).astype(np.float32)
        with torch.no_grad():
            dense_t, cls_t = net(torch.from_numpy(x))
        dense_j, cls_j = m.apply(cv, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(dense_j).transpose(0, 3, 1, 2), dense_t.numpy(), rtol=2e-3, atol=2e-3
        )

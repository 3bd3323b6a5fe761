"""Registered research-variant encoders: torch parity + contracts.

Covers the five reference-registered variants the round-1 review flagged:
nest_micro_v2_gpsa, nest_micro_v2_rel_80, nest_micro_resembed_ada_80,
swin_micro_v2_resembed_ada_80, resnet12-drop.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.core import models
import fewshot_vit_tpu.models  # noqa: F401
from fewshot_vit_tpu.checkpoint.torch_convert import (
    convert_by_rule,
    nest_key,
    resnet12_drop_key,
    swin_key,
)

from . import ref_loader


def _init(model, img=80):
    return model.init(jax.random.key(0), jnp.zeros((1, img, img, 3)), train=False)


class TestContracts:
    @pytest.mark.parametrize(
        "name,out_dim,dense_hw",
        [("nest_micro_v2_gpsa", 512, 5), ("nest_micro_v2_rel_80", 512, 5),
         ("nest_micro_resembed_ada_80", 512, 5),
         ("swin_micro_v2_resembed_ada_80", 576, 5), ("resnet12-drop", 640, 10)],
    )
    def test_shapes(self, name, out_dim, dense_hw):
        m = models.make(name)
        assert m.out_dim == out_dim
        v = _init(m)
        d, p = m.apply(v, jnp.zeros((2, 80, 80, 3)), train=False)
        assert d.shape[0] == 2 and d.shape[-1] == out_dim
        assert d.shape[1] == dense_hw
        assert p.shape == (2, out_dim)

    def test_dropblock_active_in_train(self):
        m = models.make("resnet12-drop")
        v = _init(m)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 80, 80, 3)),
                        jnp.float32)
        # push the seen-batch counter far enough that gamma > 0
        bs = v["batch_stats"]
        bs = jax.tree_util.tree_map(
            lambda a: jnp.full_like(a, 40000.0) if a.ndim == 0 else a, bs)
        variables = {"params": v["params"], "batch_stats": bs}
        (d1, _), _ = m.apply(variables, x, train=True,
                             rngs={"dropout": jax.random.key(1)},
                             mutable=["batch_stats"])
        (d2, _), _ = m.apply(variables, x, train=True,
                             rngs={"dropout": jax.random.key(2)},
                             mutable=["batch_stats"])
        assert not np.allclose(np.asarray(d1), np.asarray(d2))  # stochastic
        d3, _ = m.apply(variables, x, train=False)
        d4, _ = m.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(d3), np.asarray(d4))


@pytest.mark.slow
@pytest.mark.skipif(not ref_loader.available(), reason="reference/torch not available")
class TestTorchParity:
    def _convert(self, torch_net, flax_model, key_fn):
        torch_net.eval()
        sd = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
        v0 = jax.tree_util.tree_map(np.asarray, _init(flax_model))
        return convert_by_rule(v0, sd, key_fn)

    def _pooled_parity(self, torch_net, flax_model, key_fn, tol=2e-3):
        import torch

        cv = self._convert(torch_net, flax_model, key_fn)
        x = np.random.default_rng(0).normal(size=(2, 3, 80, 80)).astype(np.float32)
        with torch.no_grad():
            pooled_t = torch_net(torch.from_numpy(x))
        if isinstance(pooled_t, tuple):
            pooled_t = pooled_t[-1]
        _, pooled_j = flax_model.apply(
            cv, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
        )
        np.testing.assert_allclose(
            np.asarray(pooled_j), pooled_t.numpy().reshape(2, -1),
            rtol=tol, atol=tol,
        )

    def test_nest_gpsa(self):
        import torch
        from . import timm_shim

        timm_shim.install()
        ref = ref_loader.load_ref_model_module("meta_tuning_sun_m", "nest_gpsa")
        torch.manual_seed(0)
        self._pooled_parity(ref.nest_micro_v2_80(), models.make("nest_micro_v2_gpsa"),
                            nest_key)

    def test_nest_rel(self):
        import torch
        from . import timm_shim

        timm_shim.install()
        ref = ref_loader.load_ref_model_module("meta_tuning_sun_m", "nest_rel")
        torch.manual_seed(1)
        self._pooled_parity(ref.nest_micro_v2_80(), models.make("nest_micro_v2_rel_80"),
                            nest_key)

    def test_nest_resembed_ada_is_resembed(self):
        """The reference 'ada' variant's adapool is commented out of its own
        forward — it must equal the plain resembed model."""
        import torch
        from . import timm_shim

        timm_shim.install()
        ref = ref_loader.load_ref_model_module("meta_tuning_sun_m", "nest_adapool")
        torch.manual_seed(2)
        self._pooled_parity(ref.nest_micro_80(),
                            models.make("nest_micro_resembed_ada_80"), nest_key)

    def test_swin_adapool(self):
        import torch
        from . import timm_shim

        timm_shim.install()
        ref = ref_loader.load_ref_model_module("meta_tuning_sun_m", "swin_3conv_adapool")
        torch.manual_seed(3)
        self._pooled_parity(ref.swin_micro_v2_80(drop_path_rate=0.0),
                            models.make("swin_micro_v2_resembed_ada_80"),
                            swin_key)

    def test_resnet12_drop(self):
        import torch
        from . import timm_shim

        timm_shim.install()
        ref = ref_loader.load_ref_model_module("sun_meta_training", "resnet_drop")
        torch.manual_seed(4)
        net = ref.resnet12(drop_block=True)
        flax_model = models.make("resnet12-drop")
        cv = self._convert(net, flax_model, resnet12_drop_key)
        net.eval()
        x = np.random.default_rng(0).normal(size=(2, 3, 80, 80)).astype(np.float32)
        with torch.no_grad():
            dense_t, pooled_t = net(torch.from_numpy(x))
        dense_j, pooled_j = flax_model.apply(
            cv, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
        )
        np.testing.assert_allclose(np.asarray(pooled_j), pooled_t.numpy(),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dense_j).transpose(0, 3, 1, 2),
                                   dense_t.numpy(), rtol=2e-3, atol=2e-3)

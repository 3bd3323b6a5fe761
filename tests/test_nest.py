"""NesT: contract tests + torch parity (via the timm shim)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.core import models
import fewshot_vit_tpu.models  # noqa: F401
from fewshot_vit_tpu.checkpoint.torch_convert import convert_by_rule, nest_key
from fewshot_vit_tpu.models.nest import blockify, deblockify

from . import ref_loader


def _init(model, img=80):
    return model.init(jax.random.key(0), jnp.zeros((1, img, img, 3)), train=False)


class TestBlockify:
    def test_roundtrip(self):
        x = jnp.arange(2 * 20 * 20 * 3, dtype=jnp.float32).reshape(2, 20, 20, 3)
        b = blockify(x, 5)
        assert b.shape == (2, 16, 25, 3)
        np.testing.assert_array_equal(np.asarray(deblockify(b, 5)), np.asarray(x))


class TestContracts:
    @pytest.mark.parametrize(
        "name,out_dim",
        [("nest_nano_80", 384), ("nest_micro_80", 512),
         ("nest_micro_resembed_80", 512), ("nest_12m_v3", 512)],
    )
    def test_shapes(self, name, out_dim):
        m = models.make(name)
        assert m.out_dim == out_dim
        v = _init(m)
        d, p = m.apply(v, jnp.zeros((2, 80, 80, 3)), train=False)
        assert d.shape == (2, 5, 5, out_dim)
        assert p.shape == (2, out_dim)

    def test_resembed_2x_shapes(self):
        # last level at 2x resolution: dense map stays 10x10
        m = models.make("nest_micro_resembed_2x_80")
        assert m.out_dim == 512
        v = _init(m)
        d, p = m.apply(v, jnp.zeros((2, 80, 80, 3)), train=False)
        assert d.shape == (2, 10, 10, 512)
        assert p.shape == (2, 512)


@pytest.mark.slow
@pytest.mark.skipif(not ref_loader.available(), reason="reference/torch not available")
class TestTorchParity:
    def _parity(self, torch_net, flax_model, tol=2e-3):
        import torch

        torch_net.eval()
        sd = {k: v.detach().numpy() for k, v in torch_net.state_dict().items()}
        v0 = jax.tree_util.tree_map(np.asarray, _init(flax_model))
        cv = convert_by_rule(v0, sd, nest_key)
        n_torch = sum(p.numel() for p in torch_net.parameters())
        n_flax = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v0["params"]))
        assert n_flax == n_torch

        x = np.random.default_rng(0).normal(size=(2, 3, 80, 80)).astype(np.float32)
        with torch.no_grad():
            dense_t, pooled_t = torch_net(torch.from_numpy(x))
        dense_j, pooled_j = flax_model.apply(
            cv, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
        )
        np.testing.assert_allclose(
            np.asarray(pooled_j), pooled_t.numpy().reshape(2, -1), rtol=tol, atol=tol
        )
        np.testing.assert_allclose(
            np.asarray(dense_j).transpose(0, 3, 1, 2), dense_t.numpy(),
            rtol=tol, atol=tol,
        )

    def test_nest_nano(self):
        import torch
        from . import timm_shim

        timm_shim.install()
        ref = ref_loader.load_ref_model_module("sun_meta_training", "nest")
        torch.manual_seed(0)
        self._parity(ref.nest_nano_80(), models.make("nest_nano_80"))

    def test_nest_micro_resembed(self):
        import torch
        from . import timm_shim

        timm_shim.install()
        ref = ref_loader.load_ref_model_module("sun_meta_training", "nest_resembed")
        torch.manual_seed(1)
        self._parity(
            ref.nest_micro_80(), models.make("nest_micro_resembed_80")
        )

    def test_resembed_2x_reference_is_broken(self):
        """The reference 2x ctor sizes the last level for 2x blocks
        (block_size*2, seq_length*4) but never passes its own
        ``downsample=False`` flag (``nest_resembed_2x.py:378-382`` vs
        ``:259-266``), so after the always-on stride-2 pool the 5x5 map
        cannot be blockified at block_size 10 — the forward fails at ANY
        image size (the pooled edge is always block_size/2). This is the
        waiver evidence for porting the intent instead of the code."""
        import torch
        from . import timm_shim

        timm_shim.install()
        ref = ref_loader.load_ref_model_module(
            "sun_meta_training", "nest_resembed_2x")
        net = ref.nest_micro_80()
        net.eval()
        with pytest.raises(AssertionError):
            with torch.no_grad():
                net(torch.randn(1, 3, 80, 80))

    def test_nest_micro_resembed_2x_intent(self):
        """Parity against the reference 2x model with its own
        ``downsample=False`` branch actually applied to the last level —
        the one-line wiring its ctor evidently intends (the pos embed is
        already sized (1, 1, 100, C) for the undownsampled 10x10 block)."""
        import torch
        from . import timm_shim

        timm_shim.install()
        ref = ref_loader.load_ref_model_module(
            "sun_meta_training", "nest_resembed_2x")
        torch.manual_seed(3)
        net = ref.nest_micro_80()
        from functools import partial

        net.levels[2].pool = ref.ConvPool(
            384, 512, norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
            downsample=False,
        )
        self._parity(net, models.make("nest_micro_resembed_2x_80"))

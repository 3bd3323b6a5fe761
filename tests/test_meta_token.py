"""Parity tests for the meta-token episodic heads vs the reference's
``sun_meta_training/models/meta_token.py`` (runnable-but-unreferenced research
code; its only in-repo test was the ``check.py:83-91`` shape check, which these
tests subsume with full numerical parity)."""

import numpy as np
import pytest

from . import ref_loader

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fewshot_vit_tpu.heads.meta_token import (  # noqa: E402
    MetaToken,
    MetaTokenV2,
    MetaTokenV3,
)

pytestmark = pytest.mark.skipif(
    not ref_loader.available(), reason="/root/reference or torch not available"
)

E, WAY, SHOT, Q, HW_SIDE, C = 2, 3, 2, 2, 8, 6


class _TinyJaxEncoder:
    """Param-free twin of the test's torch encoder: 4x4 avg-pool, channels
    doubled by negation. dense (B, 2, 2, 6), pooled (B, 6)."""

    def __call__(self, x, train=False):
        from flax import linen as nn

        d = nn.avg_pool(x, (4, 4), strides=(4, 4))
        dense = jnp.concatenate([d, -d], axis=-1)
        return dense, dense.mean(axis=(1, 2))


def _ref_setup():
    import torch
    import torch.nn.functional as F

    mod, registry = ref_loader.load_meta_token()

    class TinyRefEncoder(torch.nn.Module):
        out_dim = C

        def __init__(self, **kw):
            super().__init__()

        def forward(self, x):  # (B, 3, 8, 8)
            d = F.avg_pool2d(x, 4)
            dense = torch.cat([d, -d], dim=1)
            return dense, dense.mean(dim=(-2, -1))

    registry.models["tiny-ref-enc"] = TinyRefEncoder
    return mod


def _episode(seed):
    rng = np.random.default_rng(seed)
    x_shot = rng.normal(size=(E, WAY, SHOT, HW_SIDE, HW_SIDE, 3)).astype(np.float32)
    x_query = rng.normal(size=(E, WAY, Q, HW_SIDE, HW_SIDE, 3)).astype(np.float32)
    return x_shot, x_query


def _to_torch(x):
    import torch

    return torch.from_numpy(np.transpose(x, (0, 1, 2, 5, 3, 4)).copy())


def _run_ref(head, x_shot, x_query):
    import torch

    with torch.no_grad():
        logits, cls_logits = head(_to_torch(x_shot), _to_torch(x_query))
    return np.asarray(logits), np.asarray(cls_logits)


def _assert_close(a, b, tol=2e-5):
    np.testing.assert_allclose(a, b, rtol=tol, atol=tol)


class TestMetaTokenParity:
    @pytest.mark.parametrize("num_heads", [1, 3])
    def test_meta_token(self, num_heads):
        mod = _ref_setup()
        ref = mod.MetaToken("tiny-ref-enc", "linear", {"n_classes": 5},
                            num_heads=num_heads)
        x_shot, x_query = _episode(0)
        ref_logits, ref_cls = _run_ref(ref, x_shot, x_query)
        assert ref_logits.shape == (E, WAY * Q, WAY * SHOT)
        assert ref_cls.shape == (E, WAY * Q, WAY)

        head = MetaToken(encoder=_TinyJaxEncoder(), num_heads=num_heads)
        variables = head.init(jax.random.key(0), jnp.asarray(x_shot),
                              jnp.asarray(x_query))
        logits, cls_logits = head.apply(variables, jnp.asarray(x_shot),
                                        jnp.asarray(x_query))
        _assert_close(np.asarray(logits), ref_logits)
        _assert_close(np.asarray(cls_logits), ref_cls)

    def test_meta_token_v2(self):
        mod = _ref_setup()
        ref = mod.MetaTokenV2("tiny-ref-enc", "linear", {"n_classes": 5})
        x_shot, x_query = _episode(1)
        ref_logits, ref_cls = _run_ref(ref, x_shot, x_query)

        head = MetaTokenV2(encoder=_TinyJaxEncoder())
        variables = head.init(jax.random.key(0), jnp.asarray(x_shot),
                              jnp.asarray(x_query))
        logits, cls_logits = head.apply(variables, jnp.asarray(x_shot),
                                        jnp.asarray(x_query))
        _assert_close(np.asarray(logits), ref_logits)
        _assert_close(np.asarray(cls_logits), ref_cls)

    def test_meta_token_v3(self):
        mod = _ref_setup()
        ref = mod.MetaTokenV3("tiny-ref-enc", "linear", {"n_classes": 5})
        x_shot, x_query = _episode(2)
        ref_logits, ref_cls = _run_ref(ref, x_shot, x_query)
        # local logits over the SELECTED patches: (E, way*q, way*shot)
        assert ref_logits.shape == (E, WAY * Q, WAY * SHOT)

        head = MetaTokenV3(encoder=_TinyJaxEncoder())
        variables = head.init(jax.random.key(0), jnp.asarray(x_shot),
                              jnp.asarray(x_query))
        # copy the reference's q/k/v projection weights
        params = jax.tree_util.tree_map(lambda x: x, variables["params"])
        tr = ref.transformer
        for name, lin in (("q", tr.q), ("k", tr.k), ("v", tr.v)):
            params["transformer"][name]["kernel"] = jnp.asarray(
                lin.weight.detach().numpy().T)
            params["transformer"][name]["bias"] = jnp.asarray(
                lin.bias.detach().numpy())
        logits, cls_logits = head.apply({"params": params},
                                        jnp.asarray(x_shot),
                                        jnp.asarray(x_query))
        _assert_close(np.asarray(logits), ref_logits)
        _assert_close(np.asarray(cls_logits), ref_cls)

    def test_registry_make(self):
        """Heads are constructible through the registry with a real encoder."""
        from fewshot_vit_tpu.core import models
        import fewshot_vit_tpu.models  # noqa: F401
        import fewshot_vit_tpu.heads  # noqa: F401

        for name in ("meta-token", "meta-token-v2", "meta-token-v3"):
            head = models.make(name, encoder="resnet12")
            x_shot = jnp.zeros((1, 2, 1, 32, 32, 3))
            x_query = jnp.zeros((1, 2, 2, 32, 32, 3))
            variables = head.init(jax.random.key(0), x_shot, x_query)
            logits, cls_logits = head.apply(variables, x_shot, x_query)
            assert logits.shape[0] == 1 and cls_logits.shape == (1, 4, 2)


class TestGuards:
    def test_method_must_be_cos(self):
        """The factories reject non-cosine metrics instead of silently
        computing cosine (the reference crashes for metric='sqr' too)."""
        from fewshot_vit_tpu.core import models
        import fewshot_vit_tpu.heads  # noqa: F401
        import fewshot_vit_tpu.models  # noqa: F401

        for name in ("meta-token", "meta-token-v2", "meta-token-v3"):
            with pytest.raises(ValueError, match="cos"):
                models.make(name, encoder="resnet12", method="sqr")

    def test_sampling_rate_too_small_raises(self):
        """A rate keeping zero patches fails loudly, not with a 0/0."""
        from fewshot_vit_tpu.heads.meta_token import sampling_keep, sampling_pool

        token = jnp.zeros((1, 2, 1, 8))
        feature = jnp.zeros((1, 2, 1, 4, 8))
        for fn in (sampling_pool, sampling_keep):
            with pytest.raises(ValueError, match="0 patches"):
                fn(token, feature, rate=0.1)

    def test_not_standard_episodic(self):
        """Research heads mark themselves out of the standard meta-tune loop,
        and the loop's check rejects them with a pointed error."""
        from fewshot_vit_tpu.core import models
        from fewshot_vit_tpu.train.meta_tune import check_standard_episodic
        import fewshot_vit_tpu.heads  # noqa: F401
        import fewshot_vit_tpu.models  # noqa: F401

        for name in ("meta-token", "meta-token-v2", "meta-token-v3",
                     "token-label-ep", "token-label-ep-rw", "token-label-ep-cr"):
            head = models.make(name, encoder="resnet12")
            with pytest.raises(ValueError, match="episodic"):
                check_standard_episodic(head, name)
        baseline = models.make("meta-baseline", encoder="resnet12")
        check_standard_episodic(baseline, "meta-baseline")  # no raise

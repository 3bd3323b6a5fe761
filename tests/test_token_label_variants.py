"""Parity tests for the ``meta_tuning_sun_m`` episodic token-label research
variants (``models/token_label.py:164-343``): ``token-label-ep-rw``,
``token-label-ep-cr``, ``token-label-v2``.

All three are dead-broken as written (SURVEY §2.4), but each breaks by a
single mechanical defect whose intent is recoverable, so each port gets a
REAL numerical anchor against the reference's own code:

  * rw   — ctor reads undefined module globals ``dim``/``ratio``; with the
           evident values injected (encoder width; ``ratio`` as in the
           in-file ``MetaLearner``) the forward RUNS at 1-shot.
  * cr   — runs verbatim at 1-shot (its ``expand`` is 1-shot-only).
  * v2   — ctor passes a list to ``nn.Sequential``; with a varargs shim the
           module runs verbatim.

The executed-proof tests below also pin WHY the waiver was justified
(NameError / RuntimeError / TypeError on the unmodified code paths).
"""

import numpy as np
import pytest

from . import ref_loader

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fewshot_vit_tpu.heads.token_label import (  # noqa: E402
    TokenLabelEpisodicChannelAttn,
    TokenLabelEpisodicReweight,
    TokenLabelV2,
)

pytestmark = pytest.mark.skipif(
    not ref_loader.available(), reason="/root/reference or torch not available"
)

E, WAY, SHOT, Q, HW_SIDE, C = 2, 3, 1, 4, 8, 6
RATIO = 2


class _TinyJaxEncoder:
    """Param-free twin of the test's torch encoder: 4x4 avg-pool, channels
    doubled by negation. dense (B, 2, 2, 6), pooled (B, 6)."""

    out_dim = C

    def __call__(self, x, train=False):
        from flax import linen as nn

        d = nn.avg_pool(x, (4, 4), strides=(4, 4))
        dense = jnp.concatenate([d, -d], axis=-1)
        return dense, dense.mean(axis=(1, 2))


def _ref_setup():
    import torch
    import torch.nn.functional as F

    mod, registry = ref_loader.load_phase_model_module(
        "meta_tuning_sun_m", "token_label")

    class TinyRefEncoder(torch.nn.Module):
        out_dim = C

        def __init__(self, **kw):
            super().__init__()

        def forward(self, x):  # (B, 3, 8, 8)
            d = F.avg_pool2d(x, 4)
            dense = torch.cat([d, -d], dim=1)
            return dense, dense.mean(dim=(-2, -1))

    class TinyLin(torch.nn.Module):
        def __init__(self, in_dim, n_classes):
            super().__init__()
            self.linear = torch.nn.Linear(in_dim, n_classes)

        def forward(self, x):
            return self.linear(x)

    registry.models["tiny-ref-enc"] = TinyRefEncoder
    registry.models["tiny-lin"] = TinyLin
    return mod


def _episode(seed, shot=SHOT):
    rng = np.random.default_rng(seed)
    xs = rng.normal(size=(E, WAY, shot, HW_SIDE, HW_SIDE, 3)).astype(np.float32)
    xq = rng.normal(size=(E, Q, HW_SIDE, HW_SIDE, 3)).astype(np.float32)
    return xs, xq


def _to_torch(x):
    import torch

    perm = (0, 1, 2, 5, 3, 4) if x.ndim == 6 else (0, 1, 4, 2, 3)
    return torch.from_numpy(np.transpose(x, perm).copy())


def _lin_params(linear):
    return {
        "kernel": jnp.asarray(linear.weight.detach().numpy().T),
        "bias": jnp.asarray(linear.bias.detach().numpy()),
    }


def _mlp_params(seq):
    return {"fc1": _lin_params(seq[0]), "fc2": _lin_params(seq[2])}


def _assert_close(a, b, tol=2e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=tol, atol=tol)


def _make_ref(mod, name, n_classes=WAY, **extra):
    return mod.models.make(
        name, encoder="tiny-ref-enc", encoder_args={},
        classifier="tiny-lin", classifier_args={"n_classes": n_classes},
        **extra)


class TestReweight:
    def test_reference_ctor_is_broken(self):
        """Waiver evidence: the unmodified ctor reads module globals ``dim``
        and ``ratio`` that are defined nowhere (``token_label.py:174-182``)."""
        mod = _ref_setup()
        assert not hasattr(mod, "dim") and not hasattr(mod, "ratio")
        with pytest.raises(NameError):
            _make_ref(mod, "token-label-ep-rw")

    def _paired_heads(self, seed=0):
        import torch

        mod = _ref_setup()
        # evident globals: dim = encoder width; ratio as in the in-file
        # MetaLearner (:219-230) that builds the same two learner MLPs
        mod.dim, mod.ratio = C, RATIO
        try:
            torch.manual_seed(seed)
            ref = _make_ref(mod, "token-label-ep-rw")
        finally:
            del mod.dim, mod.ratio
        ref.eval()

        head = TokenLabelEpisodicReweight(encoder=_TinyJaxEncoder(), ratio=RATIO)
        xs, xq = _episode(seed)
        variables = head.init(jax.random.key(0), jnp.asarray(xs), jnp.asarray(xq))
        params = {
            "intra_task_learner": _mlp_params(ref.intra_task_learner),
            "intra_class_learner": _mlp_params(ref.intra_class_learner),
        }
        assert jax.tree.structure(variables["params"]) == jax.tree.structure(
            params)
        return ref, head, {"params": params}, xs, xq

    def test_parity_1shot(self):
        """With the evident globals injected the reference RUNS at 1-shot;
        anchor every branch:
          * ``logits``: ref's (B, Q) equals ours (B, Q, way) mean-reduced
            (the final ``.mean`` at ``:241`` is the class-collapsing bug);
          * ``cls_logits``: exact;
          * ``cls_logits_reweight``: exact — this pins the full channel+
            spatial reweighting pipeline numerically;
          * executed proof of the ``logits_reweight == logits`` copy-paste
            bug (``:243-244`` reuses the unreweighted similarities)."""
        import torch

        ref, head, variables, xs, xq = self._paired_heads(0)
        with torch.no_grad():
            r_logits, r_logits_rw, r_cls, r_cls_rw = ref(
                _to_torch(xs), _to_torch(xq))
        logits, logits_rw, cls_logits, cls_rw = head.apply(
            variables, jnp.asarray(xs), jnp.asarray(xq))

        assert logits.shape == (E, Q, WAY)
        _assert_close(jnp.mean(logits, axis=-1), r_logits.numpy())
        _assert_close(cls_logits, r_cls.numpy())
        _assert_close(cls_rw, r_cls_rw.numpy())
        # the reference's reweighted local branch is the copy-paste bug:
        np.testing.assert_array_equal(r_logits_rw.numpy(), r_logits.numpy())

    def test_reweighted_local_matches_reference_features(self):
        """``logits_reweight`` (our intent fix) == the intended reduction
        applied to the reference's OWN reweighted feature tensors, computed
        in torch by replaying ``token_label.py:210-232`` with the reference's
        own submodules."""
        import torch

        ref, head, variables, xs, xq = self._paired_heads(1)
        _, logits_rw, _, _ = head.apply(
            variables, jnp.asarray(xs), jnp.asarray(xq))

        with torch.no_grad():
            fs_img = _to_torch(xs).view(-1, 3, HW_SIDE, HW_SIDE)
            fq_img = _to_torch(xq).view(-1, 3, HW_SIDE, HW_SIDE)
            ds, _ = ref.encoder(fs_img)
            dq, _ = ref.encoder(fq_img)
            t = ds.shape[-1] * ds.shape[-2]
            fs = ds.view(E, WAY, SHOT, C, t).transpose(-1, -2)  # (E,n,k,t,c)
            fq = dq.view(E, Q, C, t).transpose(-1, -2)  # (E,q,t,c)
            w_task = ref.intra_task_learner(fs.mean(dim=(1, 2, 3)))  # (E,c)
            w_class = torch.sigmoid(
                ref.intra_class_learner(fs.mean(dim=(2, 3))))  # (E,n,c)
            fq_rw = fq[:, :, None] * w_class[:, None, :, None]
            fs_rw = fs * w_class[:, :, None, None]
            map_q = torch.sigmoid(
                torch.einsum("eqntc,ec->eqnt", fq_rw, w_task))
            map_s = torch.sigmoid(
                torch.einsum("enktc,ec->enkt", fs_rw, w_task))
            fq_rw = fq_rw * map_q[..., None]
            fs_rw = fs_rw * map_s[..., None]
            sim = torch.cosine_similarity(
                fq_rw[:, :, :, None], fs_rw[:, None], dim=-1)  # (E,q,n,k,t)
            want = sim.max(dim=-1).values.mean(dim=-1)  # (E,q,n)
        _assert_close(logits_rw, want.numpy())

    def test_kshot_runs(self):
        """The generalized port runs at 5-shot (the reference cannot)."""
        head = TokenLabelEpisodicReweight(encoder=_TinyJaxEncoder(), ratio=RATIO)
        xs, xq = _episode(2, shot=5)
        variables = head.init(jax.random.key(0), jnp.asarray(xs), jnp.asarray(xq))
        outs = head.apply(variables, jnp.asarray(xs), jnp.asarray(xq))
        for o in outs:
            assert o.shape == (E, Q, WAY)
            assert bool(jnp.isfinite(o).all())


class TestChannelAttn:
    def test_parity_1shot(self):
        """The reference forward runs verbatim at 1-shot; its (B, Q) logits
        equal ours mean-reduced over the class axis, cls branch exact."""
        import torch

        mod = _ref_setup()
        ref = _make_ref(mod, "token-label-ep-cr")
        ref.eval()
        xs, xq = _episode(3)
        with torch.no_grad():
            r_logits, r_cls = ref(_to_torch(xs), _to_torch(xq))

        head = TokenLabelEpisodicChannelAttn(encoder=_TinyJaxEncoder())
        variables = head.init(jax.random.key(0), jnp.asarray(xs), jnp.asarray(xq))
        logits, cls_logits = head.apply(variables, jnp.asarray(xs), jnp.asarray(xq))
        assert logits.shape == (E, Q, WAY)
        _assert_close(jnp.mean(logits, axis=-1), r_logits.numpy())
        _assert_close(cls_logits, r_cls.numpy())

    def test_reference_kshot_is_broken(self):
        """Waiver evidence: ``expand(-1,-1,-1,k*t,-1)`` at ``:290`` cannot
        expand a non-singleton t to k*t — RuntimeError for any shot > 1."""
        import torch

        mod = _ref_setup()
        ref = _make_ref(mod, "token-label-ep-cr")
        ref.eval()
        xs, xq = _episode(4, shot=2)
        with pytest.raises(RuntimeError):
            with torch.no_grad():
                ref(_to_torch(xs), _to_torch(xq))

    def test_kshot_runs(self):
        head = TokenLabelEpisodicChannelAttn(encoder=_TinyJaxEncoder())
        xs, xq = _episode(5, shot=2)
        variables = head.init(jax.random.key(0), jnp.asarray(xs), jnp.asarray(xq))
        logits, cls_logits = head.apply(variables, jnp.asarray(xs), jnp.asarray(xq))
        assert logits.shape == cls_logits.shape == (E, Q, WAY)
        assert bool(jnp.isfinite(logits).all())


class TestV2:
    N_CLASSES, DIM = 5, 7

    def test_reference_ctor_is_broken(self):
        """Waiver evidence: ``nn.Sequential([...])`` with a list argument
        (``token_label.py:324-336``) raises TypeError on construction."""
        mod = _ref_setup()
        with pytest.raises(TypeError):
            _make_ref(mod, "token-label-v2", dim=self.DIM)

    def test_parity(self):
        """With the one evident fix (varargs Sequential) the reference runs
        verbatim; all four outputs match exactly (token maps NHWC vs NCHW)."""
        import torch

        mod = _ref_setup()
        _Seq = torch.nn.Sequential

        class SeqList(_Seq):
            def __init__(self, *args):
                if len(args) == 1 and isinstance(args[0], list):
                    args = tuple(args[0])
                super().__init__(*args)

        torch.nn.Sequential = SeqList
        try:
            torch.manual_seed(7)
            ref = _make_ref(mod, "token-label-v2", n_classes=self.N_CLASSES,
                            dim=self.DIM)
        finally:
            torch.nn.Sequential = _Seq
        ref.eval()

        head = TokenLabelV2(encoder=_TinyJaxEncoder(),
                            n_classes=self.N_CLASSES, dim=self.DIM)
        rng = np.random.default_rng(8)
        x = rng.normal(size=(5, HW_SIDE, HW_SIDE, 3)).astype(np.float32)
        variables = head.init(jax.random.key(0), jnp.asarray(x))
        params = {
            "classifier": {"linear": _lin_params(ref.classifier.linear)},
        }
        for name, seq in (("projection", ref.projection),
                          ("classifier_local", ref.classifier_local)):
            for i in (0, 2, 4):
                params[f"{name}_{i}"] = _lin_params(seq[i])
        assert jax.tree.structure(variables["params"]) == jax.tree.structure(
            params)

        with torch.no_grad():
            r_token, r_y, r_pooled, r_proj = ref(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
        y_token, y, pooled, y_proj = head.apply({"params": params},
                                                jnp.asarray(x))
        _assert_close(jnp.transpose(y_token, (0, 3, 1, 2)), r_token.numpy())
        _assert_close(y, r_y.numpy())
        _assert_close(pooled, r_pooled.numpy())
        _assert_close(jnp.transpose(y_proj, (0, 3, 1, 2)), r_proj.numpy())


class TestRegistry:
    def test_factories(self):
        import fewshot_vit_tpu.models  # noqa: F401
        from fewshot_vit_tpu.core.registry import models as reg

        for name in ("token-label-ep-rw", "token-label-ep-cr"):
            head = reg.make(name, encoder="convnet4")
            assert head.encoder is not None
        v2 = reg.make("token-label-v2", encoder="convnet4",
                      classifier_args={"n_classes": 9}, dim=32)
        assert v2.n_classes == 9 and v2.dim == 32

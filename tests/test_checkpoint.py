"""Checkpoint subsystem: orbax round trips, save policy, torch-.pth ingestion."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.core import models
import fewshot_vit_tpu.models  # noqa: F401
import fewshot_vit_tpu.heads  # noqa: F401
from fewshot_vit_tpu.checkpoint import (
    CheckpointPolicy,
    load_reference_head_checkpoint,
    load_torch_state_dict,
    load_variables,
    save_variables,
)

from . import ref_loader
from .test_heads_eval import TinyEncoder
from fewshot_vit_tpu.heads import MetaBaseline


class TestOrbaxRoundTrip:
    def test_save_load(self, tmp_path):
        head = MetaBaseline(encoder=TinyEncoder())
        xs = jnp.zeros((1, 3, 1, 16, 16, 3))
        xq = jnp.zeros((1, 9, 16, 16, 3))
        variables = head.init(jax.random.key(0), xs, xq)
        p = str(tmp_path / "ckpt")
        save_variables(p, variables, {"model": "meta-baseline", "epoch": 3})
        restored, meta = load_variables(p, target=variables)
        assert meta["epoch"] == 3
        for a, b in zip(
            jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(restored)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_policy(self, tmp_path):
        v = {"params": {"w": jnp.ones((2, 2))}}
        pol = CheckpointPolicy(str(tmp_path), save_epoch=2)
        pol.on_epoch(1, v, {}, va=0.5)
        pol.on_epoch(2, v, {}, va=0.4)
        assert os.path.exists(tmp_path / "epoch-last")
        assert os.path.exists(tmp_path / "epoch-2")
        assert not os.path.exists(tmp_path / "epoch-1")
        _, meta = load_variables(str(tmp_path / "max-va"))
        assert meta["epoch"] == 1  # best val was epoch 1

    def test_policy_best_va_survives_resume(self, tmp_path):
        """A fresh (post-resume) policy must seed best_va from the existing
        max-va meta so a worse epoch cannot overwrite the best checkpoint."""
        v = {"params": {"w": jnp.ones((2, 2))}}
        CheckpointPolicy(str(tmp_path)).on_epoch(1, v, {}, va=0.9)
        pol2 = CheckpointPolicy(str(tmp_path))  # simulates resume
        assert pol2.best_va == pytest.approx(0.9)
        pol2.on_epoch(2, v, {}, va=0.5)
        _, meta = load_variables(str(tmp_path / "max-va"))
        assert meta["epoch"] == 1
        pol2.on_epoch(3, v, {}, va=0.95)
        _, meta = load_variables(str(tmp_path / "max-va"))
        assert meta["epoch"] == 3

    def test_policy_best_va_seeds_from_crash_window_old(self, tmp_path):
        """If only max-va.old survived an interrupted save, a fresh policy
        must still seed best_va from it — otherwise the first (worse)
        post-resume epoch overwrites the recovered best checkpoint."""
        v = {"params": {"w": jnp.ones((2, 2))}}
        CheckpointPolicy(str(tmp_path)).on_epoch(1, v, {}, va=0.9)
        os.rename(tmp_path / "max-va", tmp_path / "max-va.old")
        pol = CheckpointPolicy(str(tmp_path))
        assert pol.best_va == pytest.approx(0.9)
        pol.on_epoch(2, v, {}, va=0.5)  # must NOT become the new max-va
        _, meta = load_variables(str(tmp_path / "max-va"))
        assert meta["epoch"] == 1 and meta["val_acc"] == pytest.approx(0.9)

    def test_save_is_atomic_overwrite(self, tmp_path):
        """Overwriting a checkpoint must not leave tmp/old residue and must
        keep the new contents."""
        p = str(tmp_path / "ckpt")
        save_variables(p, {"params": {"w": jnp.zeros((2,))}}, {"epoch": 1})
        save_variables(p, {"params": {"w": jnp.ones((2,))}}, {"epoch": 2})
        restored, meta = load_variables(p)
        assert meta["epoch"] == 2
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.ones((2,)))
        assert not os.path.exists(p + ".tmp")
        assert not os.path.exists(p + ".old")

    def test_load_falls_back_to_old_after_crash_window(self, tmp_path):
        """If a crash hit between the two swap renames, only '.old' exists —
        load_variables must recover from it."""
        p = str(tmp_path / "ckpt")
        save_variables(p, {"params": {"w": jnp.ones((2,))}}, {"epoch": 7})
        os.rename(p, p + ".old")
        restored, meta = load_variables(p)
        assert meta["epoch"] == 7

    def test_old_survives_a_crash_during_the_next_save(self, tmp_path, monkeypatch):
        """After a crash between the swap renames, '.old' is the ONLY valid
        checkpoint. The next save must keep a valid checkpoint on disk at
        every moment — in particular it must NOT delete '.old' before the new
        arrays are durable (a preemption during the slow orbax write would
        otherwise lose the run's entire resume state)."""
        import fewshot_vit_tpu.checkpoint.io as io_mod

        p = str(tmp_path / "ckpt")
        save_variables(p, {"params": {"w": jnp.full((2,), 7.0)}}, {"epoch": 7})
        os.rename(p, p + ".old")  # simulate the crash window

        class _Boom(RuntimeError):
            pass

        real_ocp = io_mod._ocp()

        class _FailingCkptr:
            def save(self, *a, **k):
                raise _Boom("preempted mid-write")

        monkeypatch.setattr(
            io_mod, "_ocp",
            lambda: type("m", (), {"StandardCheckpointer": _FailingCkptr}))
        with pytest.raises(_Boom):
            save_variables(p, {"params": {"w": jnp.zeros((2,))}}, {"epoch": 8})
        monkeypatch.setattr(io_mod, "_ocp", lambda: real_ocp)
        # the pre-crash checkpoint must still be loadable
        restored, meta = load_variables(p)
        assert meta["epoch"] == 7
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]), np.full((2,), 7.0))
        # and a successful retry wins cleanly
        save_variables(p, {"params": {"w": jnp.full((2,), 8.0)}}, {"epoch": 8})
        restored, meta = load_variables(p)
        assert meta["epoch"] == 8
        assert not os.path.exists(p + ".old") and not os.path.exists(p + ".tmp")


class TestResumeEmaToggle:
    """`ema_decay` toggled between a crash-save and the resume must not break
    the restore (ADVICE r2): the shadow is re-seeded or dropped, with a note."""

    def _state(self, ema):
        import optax

        from fewshot_vit_tpu.train.state import TrainState

        v = {"params": {"w": jnp.full((2, 2), 3.0)}}
        return TrainState.create(v, optax.sgd(1e-2), ema=ema)

    def test_ema_enabled_after_save(self, tmp_path):
        from fewshot_vit_tpu.train.state import resume_train_state

        p = str(tmp_path / "resume")
        save_variables(p, self._state(ema=False), {"epoch": 4, "ema": False})
        state, meta, note = resume_train_state(p, self._state(ema=True))
        assert meta["epoch"] == 4
        assert note and "re-seeded" in note
        np.testing.assert_array_equal(
            np.asarray(state.ema_params["w"]), np.asarray(state.params["w"])
        )

    def test_ema_disabled_after_save(self, tmp_path):
        from fewshot_vit_tpu.train.state import resume_train_state

        p = str(tmp_path / "resume")
        save_variables(p, self._state(ema=True), {"epoch": 2, "ema": True})
        state, meta, note = resume_train_state(p, self._state(ema=False))
        assert state.ema_params is None
        assert note and "dropping" in note

    def test_pre_ema_checkpoint_meta_without_key(self, tmp_path):
        """Resume checkpoints written before the EMA feature have no "ema"
        meta key (and no shadow in the arrays); enabling ema_decay on the
        restart must re-seed rather than crash on a structure mismatch."""
        from fewshot_vit_tpu.train.state import resume_train_state

        p = str(tmp_path / "resume")
        save_variables(p, self._state(ema=False), {"epoch": 4})
        state, meta, note = resume_train_state(p, self._state(ema=True))
        assert meta["epoch"] == 4
        assert note and "re-seeded" in note
        np.testing.assert_array_equal(
            np.asarray(state.ema_params["w"]), np.asarray(state.params["w"])
        )

    def test_unchanged_setting_restores_plainly(self, tmp_path):
        from fewshot_vit_tpu.train.state import resume_train_state

        p = str(tmp_path / "resume")
        save_variables(p, self._state(ema=True), {"epoch": 9, "ema": True})
        state, meta, note = resume_train_state(p, self._state(ema=True))
        assert note is None and meta["epoch"] == 9
        np.testing.assert_array_equal(np.asarray(state.params["w"]),
                                      np.full((2, 2), 3.0))


class TestEncoderKeyFnRegistry:
    def test_every_registered_encoder_has_torch_key_rule(self):
        """`load_encoder: *.pth` / head-.pth ingestion dispatch the torch key
        rule by encoder name (``encoder_key_fn_for``); every encoder in the
        model registry must have an explicit entry so a new encoder cannot
        silently fall back to the visformer rule."""
        from fewshot_vit_tpu.checkpoint.torch_convert import ENCODER_KEY_FNS
        from fewshot_vit_tpu.core.registry import models as model_registry

        encoders = [
            n for n in model_registry.names()
            if model_registry.ctor(n).__module__.startswith(
                "fewshot_vit_tpu.models.")
        ]
        assert "visformer_micro_80" in encoders  # the filter found the zoo
        missing = [n for n in encoders if n not in ENCODER_KEY_FNS]
        assert not missing, f"encoders without a torch key rule: {missing}"

    def test_variant_names_dispatch_to_family_rules(self):
        """The research variants convert with their family's rule — the same
        pairing their parity tests use (tests/test_variants.py)."""
        from fewshot_vit_tpu.checkpoint import encoder_key_fn_for
        from fewshot_vit_tpu.checkpoint.torch_convert import (
            nest_key,
            resnet12_drop_key,
            swin_key,
        )

        assert encoder_key_fn_for("nest_micro_v2_gpsa") is nest_key
        assert encoder_key_fn_for("nest_micro_v2_rel_80") is nest_key
        assert encoder_key_fn_for("nest_micro_resembed_ada_80") is nest_key
        assert encoder_key_fn_for("swin_micro_v2_resembed_ada_80") is swin_key
        assert encoder_key_fn_for("resnet12-drop") is resnet12_drop_key

    def test_unknown_encoder_name_fails_loudly(self):
        """An unregistered name must raise by name here, not die later inside
        convert_by_rule with a misleading per-tensor KeyError."""
        from fewshot_vit_tpu.checkpoint import encoder_key_fn_for

        with pytest.raises(KeyError, match="no torch key rule.*not_a_model"):
            encoder_key_fn_for("not_a_model")


@pytest.mark.slow
@pytest.mark.skipif(not ref_loader.available(), reason="reference/torch not available")
class TestTorchCheckpointIngestion:
    def test_meta_baseline_pth_roundtrip(self, tmp_path):
        """Build a reference-format .pth around the torch visformer and load it
        into the flax MetaBaseline; pooled-feature parity re-checked."""
        import torch

        ref = ref_loader.load_ref_model_module("sun_meta_training", "visformer")
        torch.manual_seed(1)
        net = ref.visformer_small_80().eval()
        sd = {"encoder." + k: v for k, v in net.state_dict().items()}
        sd["temp"] = torch.tensor(10.0)
        blob = {
            "model": "meta-baseline",
            "model_args": {"encoder": "visformer_micro_80"},
            "model_sd": sd,
        }
        pth = str(tmp_path / "max-va.pth")
        torch.save(blob, pth)

        flat, meta = load_torch_state_dict(pth)
        assert meta["model"] == "meta-baseline"
        assert "encoder.stem.conv1.weight" in flat

        head = models.make("meta-baseline", encoder="visformer_micro_80")
        xs = jnp.zeros((1, 2, 1, 80, 80, 3))
        xq = jnp.zeros((1, 2, 80, 80, 3))
        variables = jax.tree_util.tree_map(
            np.asarray, head.init(jax.random.key(0), xs, xq)
        )
        converted = load_reference_head_checkpoint(pth, head, variables)
        assert float(converted["params"]["temp"]) == 10.0

        # parity through the head: cosine logits must match the torch pipeline
        rng = np.random.default_rng(0)
        xs_np = rng.normal(size=(1, 2, 1, 3, 80, 80)).astype(np.float32)
        xq_np = rng.normal(size=(1, 2, 3, 80, 80)).astype(np.float32)
        logits = head.apply(
            converted,
            jnp.asarray(xs_np.transpose(0, 1, 2, 4, 5, 3)),
            jnp.asarray(xq_np.transpose(0, 1, 3, 4, 2)),
        )
        with torch.no_grad():
            _, fs = net(torch.from_numpy(xs_np.reshape(-1, 3, 80, 80)))
            _, fq = net(torch.from_numpy(xq_np.reshape(-1, 3, 80, 80)))
        proto = fs.reshape(1, 2, 1, -1).mean(2)
        proto = torch.nn.functional.normalize(proto, dim=-1)
        q = torch.nn.functional.normalize(fq.reshape(1, 2, -1), dim=-1)
        want = 10.0 * torch.einsum("bqc,bnc->bqn", q, proto)
        np.testing.assert_allclose(
            np.asarray(logits), want.numpy(), rtol=2e-3, atol=2e-3
        )

    def test_load_encoder_pth_ignores_head_params(self, tmp_path):
        """``load_encoder: *.pth`` converts ONLY the encoder subtree: the
        reference loads the full saved model and keeps ``.encoder``, dropping
        head params (``meta_tuning_sun_m/train_meta.py:124-125``) — so a
        checkpoint carrying ``temp`` / ``classifier.*`` must load cleanly
        instead of failing the converter's unconsumed-tensor check."""
        import torch

        from fewshot_vit_tpu.eval.episodic import sub_variables
        from fewshot_vit_tpu.train.runner import load_encoder_from_checkpoint

        ref = ref_loader.load_ref_model_module("sun_meta_training", "visformer")
        torch.manual_seed(2)
        net = ref.visformer_small_80().eval()
        enc_sd = {"encoder." + k: v for k, v in net.state_dict().items()}

        head = models.make("meta-baseline", encoder="visformer_micro_80")
        variables = jax.tree_util.tree_map(
            np.asarray,
            head.init(jax.random.key(0), jnp.zeros((1, 2, 1, 80, 80, 3)),
                      jnp.zeros((1, 2, 80, 80, 3))),
        )

        # ground truth: the encoder subtree of a full-head conversion
        torch.save({"model_sd": dict(enc_sd, temp=torch.tensor(10.0))},
                   str(tmp_path / "head.pth"))
        full = load_reference_head_checkpoint(
            str(tmp_path / "head.pth"), head, variables)

        # the load_encoder source: same encoder + head params to be ignored
        sd = dict(enc_sd, temp=torch.tensor(10.0))
        sd["classifier.linear.weight"] = torch.zeros(64, 384)
        sd["classifier.linear.bias"] = torch.zeros(64)
        pth = str(tmp_path / "epoch-last.pth")
        torch.save({"model": "classifier", "model_sd": sd}, pth)

        enc_vars = load_encoder_from_checkpoint(
            pth, sub_variables(variables, "encoder"), "visformer_micro_80")
        for col in ("params", "batch_stats"):
            jax.tree_util.tree_map(
                np.testing.assert_allclose,
                enc_vars[col], full[col]["encoder"])

    def test_sun_d_params_format(self, tmp_path):
        """SUN-D checkpoints use key 'params' and 'module.' prefixes."""
        import torch

        blob = {"params": {"module.encoder.stem.conv1.weight": torch.zeros(2, 3, 3, 3)}}
        pth = str(tmp_path / "deepemd.pth")
        torch.save(blob, pth)
        flat, _ = load_torch_state_dict(pth)
        assert list(flat) == ["encoder.stem.conv1.weight"]


class TestLoadModel:
    def test_rebuild_from_meta(self, tmp_path):
        from fewshot_vit_tpu.checkpoint import load_model

        model = models.make(
            "classifier", encoder="resnet12", classifier_args={"n_classes": 7}
        )
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        p = str(tmp_path / "ck")
        save_variables(p, variables, {"model": "classifier", "encoder": "resnet12",
                                      "n_classes": 7})
        model2, restored = load_model(p)
        logits = model2.apply(restored, jnp.zeros((2, 32, 32, 3)))
        assert logits.shape == (2, 7)

    def test_missing_meta(self, tmp_path):
        from fewshot_vit_tpu.checkpoint import load_model

        p = str(tmp_path / "ck")
        save_variables(p, {"params": {"w": jnp.ones((2,))}}, {})
        with pytest.raises(ValueError, match="no 'model'"):
            load_model(p)

"""Train-step tests: learning signal, SUN loss wiring, freeze_bn, and
data+tensor-parallel execution on the emulated 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from fewshot_vit_tpu.core import models
import fewshot_vit_tpu.models  # noqa: F401
import fewshot_vit_tpu.heads  # noqa: F401
from fewshot_vit_tpu.heads import Classifier, LinearClassifier, MetaBaseline, TokenLabel
from fewshot_vit_tpu.models import Visformer
from fewshot_vit_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
from fewshot_vit_tpu.train import (
    TrainState,
    make_meta_tune_step,
    make_optimizer,
    make_pretrain_step,
    make_sun_step,
    timm_cosine_schedule,
    timm_multistep_schedule,
    multistep_schedule,
)

from .test_heads_eval import TinyEncoder


def small_batch(n=32, img=16, n_classes=6, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (n_classes, img, img, 3))
    labels = rng.integers(0, n_classes, n)
    noise = rng.integers(-30, 30, (n, img, img, 3))
    images = np.clip(base[labels] + noise, 0, 255).astype(np.uint8)
    return jnp.asarray(images), jnp.asarray(labels.astype(np.int32))


class TestSchedules:
    """Per-epoch lr sequences must equal what the reference's schedulers emit
    under its end-of-epoch ``step(epoch-1)`` discipline (train_classifier.py:206,
    train_meta_warmup.py:217); the full trajectory anchor — real timm/torch
    schedulers stepping a real optimizer — lives in test_trajectory_parity."""

    def test_timm_cosine_lagged_epochs(self):
        import math

        s = timm_cosine_schedule(1e-3, 10, epochs=10, warmup_epochs=2, warmup_lr=1e-6)
        # epoch 1 runs at the construction lr (warmup_lr_init)
        assert float(s(0)) == pytest.approx(1e-6, rel=1e-5)
        assert float(s(9)) == pytest.approx(1e-6, rel=1e-5)
        # epoch 2 at _get_lr(0) = warmup_lr_init again (the step(epoch-1) lag)
        assert float(s(10)) == pytest.approx(1e-6, rel=1e-5)
        # epoch 3 at _get_lr(1): halfway through warmup_t=2
        assert float(s(20)) == pytest.approx(1e-6 + (1e-3 - 1e-6) / 2, rel=1e-5)
        # epoch 4 at _get_lr(2): cosine at t=2 of t_initial=10 — warmup counts
        # inside the cycle, so base lr is never reached (timm warmup_prefix=False)
        want = 0.5 * 1e-3 * (1 + math.cos(math.pi * 2 / 10))
        assert float(s(30)) == pytest.approx(want, rel=1e-4)
        # constant within an epoch
        assert float(s(31)) == float(s(39))
        # the epoch_ex extra epoch (E=11) at _get_lr(9), still in-cycle
        want_ex = 0.5 * 1e-3 * (1 + math.cos(math.pi * 9 / 10))
        assert float(s(100)) == pytest.approx(want_ex, rel=1e-4)

    def test_timm_multistep_warmup(self):
        s = timm_multistep_schedule(
            1e-2, 10, epochs=8, milestones=[4], gamma=0.5,
            warmup_epochs=3, warmup_lr=1e-5,
        )
        # epochs 1-2 at warmup_lr_init (construction lr, then _get_lr(0))
        assert float(s(0)) == pytest.approx(1e-5, rel=1e-5)
        assert float(s(10)) == pytest.approx(1e-5, rel=1e-5)
        # epochs 3-4 climb the warmup; epoch 5 at _get_lr(3): t+1=4 hits the
        # milestone via bisect_right, so base*gamma — decay first used in
        # epoch milestone+1, same as plain torch MultiStepLR
        assert float(s(20)) == pytest.approx(1e-5 + (1e-2 - 1e-5) / 3, rel=1e-4)
        assert float(s(30)) == pytest.approx(1e-5 + 2 * (1e-2 - 1e-5) / 3, rel=1e-4)
        assert float(s(40)) == pytest.approx(5e-3, rel=1e-4)
        assert float(s(70)) == pytest.approx(5e-3, rel=1e-4)

    def test_torch_multistep_plain(self):
        s = multistep_schedule(1e-2, 10, milestones=[2, 4], gamma=0.1)
        assert float(s(0)) == pytest.approx(1e-2, rel=1e-5)
        assert float(s(19)) == pytest.approx(1e-2, rel=1e-5)   # epoch 2 at base
        assert float(s(20)) == pytest.approx(1e-3, rel=1e-4)   # epoch 3 decayed
        assert float(s(45)) == pytest.approx(1e-4, rel=1e-4)   # past epoch 4


class TestPretrainStep:
    def test_loss_decreases(self):
        model = Classifier(encoder=TinyEncoder(), classifier=LinearClassifier(6, name="classifier"))
        images, labels = small_batch()
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tx = make_optimizer(variables["params"], "adamw", lr=5e-3, weight_decay=0.01)
        state = TrainState.create(variables, tx)
        step = make_pretrain_step(model, tx)
        first = last = None
        for i in range(30):
            state, m = step(state, images, labels, jax.random.key(i))
            if first is None:
                first = float(m["loss"])
            last = float(m["loss"])
        assert last < first * 0.5
        assert int(state.step) == 30

    def test_ema_through_epoch_program(self):
        """`ema_decay` config path: EMA shadow updates inside the donated
        epoch-scan program. Regression: create(ema=True) must COPY params —
        aliased buffers fail donation ('donate the same buffer twice')."""
        from fewshot_vit_tpu.train.loop import batch_indices, make_pretrain_epoch

        model = Classifier(encoder=TinyEncoder(), classifier=LinearClassifier(6, name="classifier"))
        images, labels = small_batch()
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tx = make_optimizer(variables["params"], "sgd", lr=0.1)
        state = TrainState.create(variables, tx, ema=True)
        epoch = make_pretrain_epoch(model, tx, ema_decay=0.9)
        idx = jnp.asarray(batch_indices(len(images), 8, np.random.default_rng(0)))
        state, ms = epoch(state, images, labels, idx, jax.random.key(1))
        assert np.isfinite(np.asarray(ms["loss"])).all()
        p0 = jax.tree_util.tree_leaves(state.params)[0]
        e0 = jax.tree_util.tree_leaves(state.ema_params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(e0))  # EMA lags
        with pytest.raises(ValueError):
            make_pretrain_epoch(model, tx, sam_rho=0.05, ema_decay=0.9)

    def test_bf16_mixed_precision(self):
        """model_args.dtype=bfloat16: activations run bf16, params/optimizer
        state stay fp32, the loss is finite fp32, and training still learns."""
        from fewshot_vit_tpu.train.runner import model_dtype
        from fewshot_vit_tpu.core.config import Config

        assert model_dtype(Config({"model_args": {"dtype": "bf16"}})) == jnp.bfloat16
        assert model_dtype(Config({})) == jnp.float32
        with pytest.raises(ValueError):
            model_dtype(Config({"model_args": {"dtype": "fp16"}}))

        model = Classifier(
            encoder=TinyEncoder(dtype=jnp.bfloat16),
            classifier=LinearClassifier(6, dtype=jnp.bfloat16, name="classifier"),
        )
        images, labels = small_batch()
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        for leaf in jax.tree_util.tree_leaves(variables["params"]):
            assert leaf.dtype == jnp.float32  # flax: param dtype stays fp32
        tx = make_optimizer(variables["params"], "adamw", lr=5e-3, weight_decay=0.01)
        state = TrainState.create(variables, tx)
        step = make_pretrain_step(model, tx)
        first = last = None
        for i in range(30):
            state, m = step(state, images, labels, jax.random.key(i))
            if first is None:
                first = float(m["loss"])
            last = float(m["loss"])
        assert m["loss"].dtype == jnp.float32
        assert np.isfinite(last) and last < first * 0.7
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32


class TestEmdFsEval:
    def test_emd_validation_hook(self):
        """The SUN-D-style DeepEMD episodic validation used by pretrain's
        eval_emd option (reference train_pretrain.py:139-168)."""
        from fewshot_vit_tpu.core.registry import datasets as dataset_registry
        import fewshot_vit_tpu.data.datasets  # noqa: F401
        from fewshot_vit_tpu.train.runner import emd_fs_eval
        from .test_heads_eval import TinyEncoder

        ds = dataset_registry.make("synthetic", n_classes=6, n_per_class=10,
                                   image_size=16, seed=0)
        enc = TinyEncoder()
        variables = enc.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        out = emd_fs_eval(enc, variables, ds, n_episodes=8, way=4, shot=1,
                          query=3, mode="fcn")
        assert 0.0 <= out["emd_acc"] <= 1.0
        assert out["emd_acc"] > 0.25  # clustered synthetic beats chance
        # second call hits the jitted-callable cache (no recompile)
        out2 = emd_fs_eval(enc, variables, ds, n_episodes=8, way=4, shot=1,
                           query=3, mode="fcn")
        assert out2["emd_acc"] == out["emd_acc"]


class TestDistributedInit:
    def test_single_process_noop(self):
        """Without a coordinator, init_distributed is a safe no-op (multi-host
        DCN clusters pass coordinator_address/num_processes/process_id or set
        JAX_COORDINATOR_ADDRESS; see parallel/mesh.py::init_distributed)."""
        from fewshot_vit_tpu.parallel import init_distributed

        assert init_distributed() == 1
        assert init_distributed(num_processes=1) == 1


class TestSamPretrainWiring:
    """optimizer: sam reaches the two-pass step from config (VERDICT r1 #5)."""

    def test_build_optimizer_sam_uses_base(self):
        from fewshot_vit_tpu.core import Config
        from fewshot_vit_tpu.train.runner import build_optimizer

        cfg = Config({"optimizer": "sam", "max_epoch": 2,
                      "optimizer_args": {"base": "adamw", "sam_rho": 0.1, "lr": 1e-3}})
        params = {"w": jnp.ones((4, 4))}
        tx = build_optimizer(cfg, params, steps_per_epoch=10)
        state = tx.init(params)  # adamw base chain initializes
        assert state is not None

    def test_sam_epoch_trains(self):
        from fewshot_vit_tpu.train.loop import batch_indices, make_pretrain_epoch

        model = Classifier(encoder=TinyEncoder(), classifier=LinearClassifier(6, name="classifier"))
        images, labels = small_batch(n=48)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tx = make_optimizer(variables["params"], "adamw", lr=5e-3, weight_decay=0.01)
        state = TrainState.create(variables, tx)
        epoch_fn = make_pretrain_epoch(model, tx, sam_rho=0.05)
        idx = jnp.asarray(batch_indices(48, 16, np.random.default_rng(0)))
        losses = []
        for e in range(6):
            state, ms = epoch_fn(state, images, labels, idx, jax.random.key(e))
            losses.append(float(np.mean(np.asarray(ms["loss"]))))
        assert losses[-1] < losses[0] * 0.8
        assert int(state.step) == 6 * idx.shape[0]


class TestSunStep:
    def test_losses_wired(self):
        student = TokenLabel(encoder=TinyEncoder(), n_classes=6)
        teacher = TokenLabel(encoder=TinyEncoder(), n_classes=6)
        images, labels = small_batch()
        sv = student.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tv = teacher.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))
        tx = make_optimizer(sv["params"], "adamw", lr=1e-3)
        state = TrainState.create(sv, tx)
        step = make_sun_step(student, teacher, tx, soft_k=2, bg_tokens=1, token_weight=0.5)
        state, m = step(state, tv, images, images, labels, jax.random.key(2))
        assert np.isfinite(m["loss"]) and np.isfinite(m["token_loss"])
        # loss decomposition: loss == cls + 0.5 * token
        assert float(m["loss"]) == pytest.approx(
            float(m["cls_loss"]) + 0.5 * float(m["token_loss"]), rel=1e-5
        )

    def test_bf16_teacher_under_fp32_student(self):
        """`teacher_dtype: bfloat16` (train/sun.py): the frozen teacher may run
        at lower precision than the student — params are fp32 either way, so
        the same variables drive both, and the resulting soft labels/losses
        must stay close to the all-fp32 step."""
        student = TokenLabel(encoder=TinyEncoder(), n_classes=6)
        teacher32 = TokenLabel(encoder=TinyEncoder(), n_classes=6)
        teacher16 = TokenLabel(
            encoder=TinyEncoder(dtype=jnp.bfloat16), n_classes=6,
            dtype=jnp.bfloat16,
        )
        images, labels = small_batch()
        sv = student.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tv = teacher32.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))
        tx = make_optimizer(sv["params"], "adamw", lr=1e-3)

        def run(teacher):
            step = make_sun_step(student, teacher, tx, soft_k=2, bg_tokens=1,
                                 token_weight=0.5)
            # the step donates the state: give each run its own buffers
            state = TrainState.create(jax.tree_util.tree_map(jnp.copy, sv), tx)
            _, m = step(state, tv, images, images, labels, jax.random.key(2))
            return m

        m32, m16 = run(teacher32), run(teacher16)
        assert np.isfinite(m16["loss"])
        # cls loss ignores the teacher entirely -> identical
        assert float(m16["cls_loss"]) == pytest.approx(float(m32["cls_loss"]), rel=1e-6)
        # token loss sees bf16-rounded teacher logits -> close, not exact
        assert float(m16["token_loss"]) == pytest.approx(
            float(m32["token_loss"]), rel=0.05
        )

    def test_token_weight_zero_is_pure_ce(self):
        student = TokenLabel(encoder=TinyEncoder(), n_classes=6)
        teacher = TokenLabel(encoder=TinyEncoder(), n_classes=6)
        images, labels = small_batch()
        sv = student.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tv = teacher.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))
        tx = make_optimizer(sv["params"], "adamw", lr=1e-3)
        step = make_sun_step(student, teacher, tx, soft_k=2, bg_tokens=1, token_weight=0.0)
        _, m = step(TrainState.create(sv, tx), tv, images, images, labels, jax.random.key(2))
        assert float(m["loss"]) == pytest.approx(float(m["cls_loss"]), rel=1e-6)


class TestMetaTuneStep:
    def _setup(self, freeze_bn=False):
        head = MetaBaseline(encoder=TinyEncoder())
        e, way, shot, query = 2, 4, 1, 5
        rng = np.random.default_rng(3)
        base = rng.integers(0, 256, (8, 16, 16, 3))
        cls = rng.integers(0, 8, (e, way))
        shots = np.clip(base[cls][:, :, None] + rng.integers(-20, 20, (e, way, shot, 16, 16, 3)), 0, 255).astype(np.uint8)
        queries_cls = np.repeat(cls, query, axis=1)
        queries = np.clip(base[queries_cls] + rng.integers(-20, 20, (e, way * query, 16, 16, 3)), 0, 255).astype(np.uint8)
        xs, xq = jnp.asarray(shots), jnp.asarray(queries)
        variables = head.init(jax.random.key(0), xs, xq)
        tx = make_optimizer(variables["params"], "sgd", lr=1e-2)
        state = TrainState.create(variables, tx)
        step = make_meta_tune_step(head, tx, way=way, query=query, ep_per_batch=e, freeze_bn=freeze_bn)
        return state, step, xs, xq

    def test_loss_decreases(self):
        state, step, xs, xq = self._setup()
        first = last = None
        for i in range(25):
            state, m = step(state, xs, xq, jax.random.key(i))
            if first is None:
                first = float(m["loss"])
            last = float(m["loss"])
        assert last < first

    def test_freeze_bn_keeps_stats(self):
        state, step, xs, xq = self._setup(freeze_bn=True)
        new_state, _ = step(state, xs, xq, jax.random.key(0))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.batch_stats),
            jax.tree_util.tree_leaves(new_state.batch_stats),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_freeze_bn_keeps_dropout_stochastic(self):
        """The reference's utils.freeze_bn puts ONLY BN in eval under
        model.train() (meta_tuning_sun_m/train_meta.py:155-157): with
        freeze_bn the step must keep dropout/droppath stochastic while BN
        stats stay frozen — a plain train=False forward would silence both."""
        import flax.linen as nn

        from fewshot_vit_tpu.models.common import BatchNorm

        class _BnDropEnc(nn.Module):
            out_dim: int = 8

            @nn.compact
            def __call__(self, x, train=False):
                x = nn.Conv(8, (3, 3), strides=(2, 2))(x)
                x = BatchNorm()(x, train)
                x = nn.Dropout(0.5, deterministic=not train)(x)
                return x, x.mean(axis=(1, 2))

        head = MetaBaseline(encoder=_BnDropEnc())
        e, way, shot, query = 1, 3, 1, 4
        rng = np.random.default_rng(5)
        xs = jnp.asarray(rng.integers(0, 256, (e, way, shot, 16, 16, 3)), jnp.uint8)
        xq = jnp.asarray(rng.integers(0, 256, (e, way * query, 16, 16, 3)), jnp.uint8)
        variables = head.init(jax.random.key(0), xs, xq)
        tx = make_optimizer(variables["params"], "sgd", lr=0.0)  # isolate fwd
        step = make_meta_tune_step(head, tx, way=way, query=query,
                                   ep_per_batch=e, freeze_bn=True)
        fresh = lambda: TrainState.create(
            jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables), tx)
        s1, m1 = step(fresh(), xs, xq, jax.random.key(1))
        s2, m2 = step(fresh(), xs, xq, jax.random.key(2))
        # dropout active: different rng streams -> different losses
        assert float(m1["loss"]) != float(m2["loss"])
        # BN frozen: running stats untouched by either step
        for a, b in zip(jax.tree_util.tree_leaves(variables["batch_stats"]),
                        jax.tree_util.tree_leaves(s1.batch_stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestShardedStep:
    def test_dp_tp_pretrain_step(self, devices8):
        """Full pretrain step over a 4x2 (data x model) mesh with tensor-parallel
        wide kernels — the multi-chip path the driver dry-runs."""
        mesh = make_mesh({"data": 4, "model": 2}, devices8)
        enc = Visformer(
            img_size=32, init_channels=16, embed_dim=64, depth=(1, 1, 1),
            num_heads=4, attn_stage="011", spatial_conv="100",
        )
        model = Classifier(encoder=enc, classifier=LinearClassifier(6, name="classifier"))
        images, labels = small_batch(n=16, img=32)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))

        pshard = param_shardings(mesh, variables["params"], min_features=64)
        params = jax.tree_util.tree_map(jax.device_put, variables["params"], pshard)
        # at least one kernel actually tensor-sharded
        assert any(
            s.spec != jax.sharding.PartitionSpec()
            for s in jax.tree_util.tree_leaves(pshard)
        )
        tx = make_optimizer(params, "adamw", lr=1e-3)
        state = TrainState.create({"params": params, "batch_stats": variables["batch_stats"]}, tx)
        state = state.replace(
            batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
            step=jax.device_put(state.step, replicated(mesh)),
        )
        step = make_pretrain_step(model, tx)
        images = jax.device_put(images, batch_sharding(mesh, images.ndim))
        labels = jax.device_put(labels, batch_sharding(mesh, 1))
        new_state, m = step(state, images, labels, jax.random.key(1))
        assert np.isfinite(float(m["loss"]))
        # params keep their tensor sharding through the update
        qkv = new_state.params["encoder"]["stage2_0"]["attn"]["qkv"]["kernel"]
        assert "model" in str(qkv.sharding.spec)

    def test_sun_epoch_program_on_mesh(self, devices8):
        """The SUN EPOCH program (scan of steps) under the `mesh:` config
        wiring of train/sun.py: dp-sharded batches, replicated frozen teacher,
        idx sharded on its batch axis — mirrors the CLI exactly."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fewshot_vit_tpu.train.loop import batch_indices, make_sun_epoch, metrics_mean

        mesh = make_mesh({"data": 8}, devices8)
        student = TokenLabel(encoder=TinyEncoder(), n_classes=6)
        teacher = TokenLabel(encoder=TinyEncoder(), n_classes=6)
        images, labels = small_batch(n=64, img=16)
        sv = student.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tv = teacher.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))
        tx = make_optimizer(sv["params"], "adamw", lr=1e-3)
        state = TrainState.create(sv, tx)
        state = jax.device_put(state, replicated(mesh))
        tv = jax.device_put(tv, replicated(mesh))
        images = jax.device_put(images, replicated(mesh))
        labels = jax.device_put(labels, replicated(mesh))
        epoch_fn = make_sun_epoch(student, teacher, tx, soft_k=2, bg_tokens=1)

        idx = batch_indices(64, 16, np.random.default_rng(0))  # (4, 16)
        idx = jax.device_put(jnp.asarray(idx), NamedSharding(mesh, P(None, "data")))
        state, ms = epoch_fn(state, tv, images, labels, idx, jax.random.key(2))
        m = metrics_mean(ms)
        assert np.isfinite(m["loss"]) and np.isfinite(m["token_loss"])
        assert int(state.step) == 4

    def test_meta_tune_epoch_program_on_mesh(self, devices8):
        """The meta-tune EPOCH program under the `mesh:` wiring of
        train/meta_tune.py: episode-batch idx sharded on its flat axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fewshot_vit_tpu.heads import MetaBaseline
        from fewshot_vit_tpu.train.loop import make_meta_tune_epoch, metrics_mean

        mesh = make_mesh({"data": 8}, devices8)
        way, shot, query, epb = 4, 1, 3, 8
        head = MetaBaseline(encoder=TinyEncoder())
        images, labels = small_batch(n=120, img=16, n_classes=6)
        xs0 = jnp.zeros((1, way, shot, 16, 16, 3))
        xq0 = jnp.zeros((1, way * query, 16, 16, 3))
        variables = head.init(jax.random.key(0), xs0, xq0)
        tx = make_optimizer(variables["params"], "sgd", lr=1e-2)
        state = jax.device_put(TrainState.create(variables, tx), replicated(mesh))
        images = jax.device_put(images, replicated(mesh))

        from fewshot_vit_tpu.data.sampler import EpisodeSampler

        labels_np = np.asarray(labels)
        sampler = EpisodeSampler(labels_np, 3, way, shot + query, epb)
        idx = np.stack(list(sampler.epoch(np.random.default_rng(0)))).astype(np.int32)
        idx = jax.device_put(jnp.asarray(idx), NamedSharding(mesh, P(None, "data")))
        epoch_fn = make_meta_tune_epoch(head, tx, way, shot, query, epb)
        state, ms = epoch_fn(state, images, idx, jax.random.key(3))
        m = metrics_mean(ms)
        assert np.isfinite(m["loss"])
        assert int(state.step) == 3


class TestRemat:
    def test_remat_step_matches_plain(self):
        """`remat: true` recomputes the forward in backward — values, grads,
        and the updated params must be identical to the plain step."""
        images, labels = small_batch()
        model = Classifier(encoder=TinyEncoder(), classifier=LinearClassifier(6, name="classifier"))
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tx = make_optimizer(variables["params"], "sgd", lr=0.1)

        outs = {}
        for remat in (False, True):
            state = TrainState.create(
                jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables), tx)
            step = make_pretrain_step(model, tx, remat=remat)
            state, m = step(state, images, labels, jax.random.key(1))
            outs[remat] = (float(m["loss"]), jax.tree_util.tree_leaves(state.params))
        assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-6)
        for a, b in zip(outs[False][1], outs[True][1]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)

    def test_sun_remat_matches_plain(self):
        student = TokenLabel(encoder=TinyEncoder(), n_classes=6)
        images, labels = small_batch()
        sv = student.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tx = make_optimizer(sv["params"], "sgd", lr=0.1)
        tvars = {"params": sv["params"]}
        outs = {}
        for remat in (False, True):
            state = TrainState.create(
                jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), sv), tx)
            step = make_sun_step(student, student, tx, soft_k=2, bg_tokens=1,
                                 remat=remat)
            state, m = step(state, tvars, images, images, labels, jax.random.key(1))
            outs[remat] = (float(m["loss"]), jax.tree_util.tree_leaves(state.params))
        assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-6)
        for a, b in zip(outs[False][1], outs[True][1]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)

    def test_sam_remat_rejected(self):
        from fewshot_vit_tpu.train.loop import make_pretrain_epoch

        model = Classifier(encoder=TinyEncoder(), classifier=LinearClassifier(6, name="classifier"))
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tx = make_optimizer(variables["params"], "sgd", lr=0.1)
        with pytest.raises(ValueError):
            make_pretrain_epoch(model, tx, sam_rho=0.05, remat=True)


class TestEvalExactness:
    def test_batch_indices_cycles_small_n(self):
        from fewshot_vit_tpu.train.loop import batch_indices

        idx = batch_indices(10, 32, np.random.default_rng(0), drop_last=False)
        assert idx.shape == (1, 32)
        assert idx.max() < 10 and idx.min() >= 0
        assert sorted(idx.reshape(-1)[:10].tolist()) == list(range(10))

    def test_val_metrics_ignore_padding_duplicates(self):
        """drop_last=False pads the val grid by cycling the permutation; the
        CE eval must weight each real image exactly once (the reference's
        DataLoader scores a smaller final batch), so the padded duplicates
        cannot skew max-va selection."""
        from fewshot_vit_tpu.train.loop import (
            batch_indices, eval_metrics, make_eval_ce_epoch,
        )

        model = Classifier(encoder=TinyEncoder(), classifier=LinearClassifier(6, name="classifier"))
        rng = np.random.default_rng(11)
        n = 10
        images = jnp.asarray(rng.integers(0, 256, (n, 16, 16, 3)), jnp.uint8)
        labels = jnp.asarray(rng.integers(0, 6, (n,)), jnp.int32)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))

        # exact per-image reference on the unique images
        import optax
        from fewshot_vit_tpu.data.transforms import normalize

        logits = model.apply(variables, normalize(images, (0.5,) * 3, (0.5,) * 3),
                             train=False)
        want_loss = float(optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels).mean())
        want_acc = float((jnp.argmax(logits, -1) == labels).mean())

        eval_fn = make_eval_ce_epoch(model, (0.5,) * 3, (0.5,) * 3, n_valid=n)
        idx = batch_indices(n, 4, np.random.default_rng(0), drop_last=False)
        assert idx.size > n  # padding present: 12 slots for 10 images
        got = eval_metrics(eval_fn(variables, images, labels, jnp.asarray(idx)))
        assert got["loss"] == pytest.approx(want_loss, rel=1e-5)
        assert got["acc"] == pytest.approx(want_acc, abs=1e-6)


class TestFreezeBnDropEncoder:
    def test_resnet12_drop_trains_under_freeze_bn(self):
        """resnet12-drop keeps a num_batches_tracked counter in batch_stats;
        under freeze_bn (train=True forward WITHOUT mutable batch_stats) the
        write must be skipped, not crash with ModifyScopeVariableError."""
        enc = models.make("resnet12-drop", channels=(8, 8, 8, 8))
        head = MetaBaseline(encoder=enc)
        e, way, shot, query = 1, 2, 1, 2
        rng = np.random.default_rng(6)
        xs = jnp.asarray(rng.integers(0, 256, (e, way, shot, 32, 32, 3)), jnp.uint8)
        xq = jnp.asarray(rng.integers(0, 256, (e, way * query, 32, 32, 3)), jnp.uint8)
        variables = head.init(jax.random.key(0), xs, xq)
        tx = make_optimizer(variables["params"], "sgd", lr=1e-2)
        step = make_meta_tune_step(head, tx, way=way, query=query,
                                   ep_per_batch=e, freeze_bn=True)
        copy = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables)
        state, m = step(TrainState.create(copy, tx), xs, xq, jax.random.key(1))
        assert np.isfinite(float(m["loss"]))
        for a, b in zip(jax.tree_util.tree_leaves(variables["batch_stats"]),
                        jax.tree_util.tree_leaves(state.batch_stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Training-trajectory parity: the reference's REAL torch training loops vs
this framework's train programs, from converter-round-tripped identical
weights and identical batch/episode index streams.

The torch side is the reference's own model code (loaded via
``tests.ref_loader``), torch's own optimizers, and its scheduler stack —
timm's ``CosineLRScheduler`` / ``MultiStepLRScheduler`` through the faithful
``tests.timm_shim`` implementations, torch's ``MultiStepLR`` / ``StepLR``
directly — stepped exactly as each training script steps them. The loop
bodies are transcribed line-for-line from the scripts (cited per test; the
scripts themselves execute argparse/CUDA at module scope and cannot be
imported). The JAX side is the public training surface: ``build_optimizer`` /
``build_sund_optimizer`` + the phase step/epoch builders — the same calls the
train CLIs make.

Asserted per phase: the per-step loss curve AND the final parameter tree
(weights + BN running stats, compared through the torch->flax converter).
This pins the last previously-unanchored math surface — training dynamics:
optimizer semantics (coupled-L2 SGD momentum, decoupled AdamW, nesterov,
weight decay on EVERY param), schedule values + their end-of-epoch
``step(epoch-1)`` lag, loss reductions, and BN batch-stat updates. Any
wiring drift (wd masking, milestone off-by-one, warmup interpolation,
lr x bs/512 rounding) fails here (VERDICT r3, next-round item 1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from . import ref_loader

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not ref_loader.available(), reason="reference/torch not available"),
]

MEAN = np.array([0.471, 0.450, 0.403], np.float32)
STD = np.array([0.278, 0.268, 0.284], np.float32)


def class_images(n_classes, n_per_class, img, seed):
    """Clustered u8 images (same recipe as test_protocol_parity) — separable
    enough that training moves, noisy enough that losses stay informative."""
    rng = np.random.default_rng(seed)
    protos = rng.integers(70, 186, (n_classes, 1, 1, 3)).astype(np.float32)
    labels = np.repeat(np.arange(n_classes), n_per_class)
    noise = rng.normal(0.0, 70.0, (n_classes * n_per_class, img, img, 3))
    images = np.clip(protos[labels] + noise, 0, 255).astype(np.uint8)
    return images, labels.astype(np.int64)


def to_torch_batch(images_u8):
    """The loaders' ToTensor+Normalize semantics (test_few_shot.py protocol,
    pinned by test_protocol_parity)."""
    import torch

    x = torch.from_numpy(images_u8.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
    mean = torch.from_numpy(MEAN).view(1, 3, 1, 1)
    std = torch.from_numpy(STD).view(1, 3, 1, 1)
    return (x - mean) / std


def convert_full(torch_model, flax_template):
    """torch state_dict -> flax variables (params + batch_stats) through the
    production converter, with the head-wrapped key rule."""
    from fewshot_vit_tpu.checkpoint.io import head_key_fn
    from fewshot_vit_tpu.checkpoint.torch_convert import convert_by_rule, convnet4_key

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    return convert_by_rule(flax_template, sd, head_key_fn(convnet4_key))


def _patch_convnet4_view(cn4_module):
    """The reference ConvNet4.forward flattens with ``.view`` (convnet4.py:30),
    which torch 2.x rejects on the (non-contiguous) train-mode maxpool output.
    ``reshape`` is numerically identical — an environment fix, not a math
    change (same externally-injected-fix pattern as the round-3 variant
    ports)."""

    def forward(self, x):
        x = self.encoder(x)
        return x.reshape(x.shape[0], -1)

    cn4_module.ConvNet4.forward = forward


def assert_trees_close(got, want, rtol, atol, what):
    flat_g = jax.tree_util.tree_flatten_with_path(got)[0]
    flat_w = jax.tree_util.tree_leaves(want)
    assert len(flat_g) == len(flat_w)
    for (path, g), w in zip(flat_g, flat_w):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=atol,
            err_msg=f"{what}: {jax.tree_util.keystr(path)}",
        )


def assert_final_state_close(state, final, what, params_atol=2e-5):
    """Params tight by default (SGD updates scale with the gradient, so fp
    noise stays ~1e-6); AdamW callers pass a looser ``params_atol``: Adam
    NORMALIZES updates, so a parameter with ~zero gradient (conv bias feeding
    BN — the batch-mean shift cancels it exactly) turns fp-noise gradients
    into O(lr)-sized update noise; the bound is lr*steps. Exact wd/nesterov/
    masking wiring is pinned noise-free by TestOptimizerStepEquivalence.
    batch_stats looser still (running stats accumulate fp32 reduction-order
    noise ~1e-4 over tens of batches — a semantics bug like a flipped
    momentum or an unbiased/biased variance mixup shows up at >=1e-2)."""
    assert_trees_close({"params": state.params}, {"params": final["params"]},
                       rtol=5e-3, atol=params_atol, what=f"{what} params")
    if state.batch_stats:
        assert_trees_close(
            {"batch_stats": state.batch_stats},
            {"batch_stats": final["batch_stats"]},
            rtol=5e-2, atol=1e-3, what=f"{what} batch_stats",
        )


class TestOptimizerStepEquivalence:
    """Noise-free single-surface anchor: identical HAND-MADE gradients fed to
    the real torch optimizers and to the framework's optax chains, parameter
    deltas compared at 1e-6. This is what makes wd wiring sharp — over a short
    full-loop run, a masked-vs-unmasked decay drift (~lr*wd*p*steps ~ 2e-5) is
    smaller than Adam's update noise, but here it is the ONLY difference and
    fails at 1000x the tolerance. Covers: coupled-L2 SGD momentum, nesterov,
    decoupled AdamW, wd on every param (incl. 1-D), and the whole-tensor
    NaN-grad rule."""

    def _params(self):
        rng = np.random.default_rng(3)
        return {
            "w": rng.normal(size=(4, 3)).astype(np.float32),
            "b": rng.normal(size=(3,)).astype(np.float32),
        }

    def _grads(self, n):
        rng = np.random.default_rng(4)
        return [
            {"w": rng.normal(size=(4, 3)).astype(np.float32),
             "b": rng.normal(size=(3,)).astype(np.float32)}
            for _ in range(n)
        ]

    def _run_torch(self, make_opt, grads):
        import torch

        p0 = self._params()
        t = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
             for k, v in p0.items()}
        opt = make_opt([t["w"], t["b"]])
        for g in grads:
            opt.zero_grad()
            for k in t:
                t[k].grad = torch.from_numpy(g[k].copy())
            opt.step()
        return {k: v.detach().numpy() for k, v in t.items()}

    def _run_optax(self, tx, grads):
        import optax

        params = {k: jnp.asarray(v) for k, v in self._params().items()}
        opt_state = tx.init(params)
        for g in grads:
            gj = {k: jnp.asarray(v) for k, v in g.items()}
            updates, opt_state = tx.update(gj, opt_state, params)
            params = optax.apply_updates(params, updates)
        return {k: np.asarray(v) for k, v in params.items()}

    def test_sgd_coupled_wd_momentum(self):
        """SGD(momentum .9, wd on EVERY param) — utils.make_optimizer:132."""
        import torch

        from fewshot_vit_tpu.train.optim import make_optimizer

        grads = self._grads(4)
        want = self._run_torch(
            lambda ps: torch.optim.SGD(ps, 1e-2, momentum=0.9,
                                       weight_decay=5e-4), grads)
        got = self._run_optax(
            make_optimizer(self._params(), "sgd", lr=1e-2, weight_decay=5e-4),
            grads)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-7)

    def test_adamw_decoupled_wd_every_param(self):
        """AdamW(betas (0.9,0.999), eps 1e-8, wd on EVERY param incl. the 1-D
        bias) — train_classifier.py:131."""
        import torch

        from fewshot_vit_tpu.train.optim import make_optimizer

        grads = self._grads(4)
        want = self._run_torch(
            lambda ps: torch.optim.AdamW(ps, betas=(0.9, 0.999), eps=1e-8,
                                         lr=1e-3, weight_decay=0.05), grads)
        got = self._run_optax(
            make_optimizer(self._params(), "adamw", lr=1e-3,
                           weight_decay=0.05), grads)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-7)

    def test_sund_nesterov_chain_and_nan_rule(self):
        """The SUN-D chain (build_sund_optimizer): nesterov SGD(wd 5e-4) +
        detect_grad_nan's WHOLE-tensor zeroing (Models/utils.py:115-118) —
        a NaN in one element of w at step 2 must zero w's entire gradient
        (not just the element) while b's step proceeds."""
        import torch

        from fewshot_vit_tpu.core import Config
        from fewshot_vit_tpu.train.meta_tune_emd import build_sund_optimizer

        grads = self._grads(4)
        grads[1]["w"] = grads[1]["w"].copy()
        grads[1]["w"][0, 0] = np.nan

        def torch_side(ps):
            return torch.optim.SGD([{"params": ps, "lr": 5e-3}], momentum=0.9,
                                   nesterov=True, weight_decay=0.0005)

        # torch loop with the reference's detect_grad_nan applied per step
        p0 = self._params()
        t = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
             for k, v in p0.items()}
        opt = torch_side([t["w"], t["b"]])
        for g in grads:
            opt.zero_grad()
            for k in t:
                t[k].grad = torch.from_numpy(g[k].copy())
            for param in t.values():  # detect_grad_nan verbatim
                if (param.grad != param.grad).float().sum() != 0:
                    param.grad.zero_()
            opt.step()
        want = {k: v.detach().numpy() for k, v in t.items()}

        # step_size far out -> constant lr, isolating the optimizer chain
        cfg = Config({"lr": 5e-3, "step_size": 100, "gamma": 0.5,
                      "max_epoch": 4})
        got = self._run_optax(build_sund_optimizer(cfg, 1), grads)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-7)
        assert np.isfinite(got["w"]).all()


class TestPretrainTrajectory:
    """Phase 1 teacher pretraining: AdamW(lr x bs/512, wd on every param) +
    timm CosineLRScheduler, stepped ``step(epoch-1)`` at epoch end
    (sun_train_teacher/train_classifier.py:130-132,161-174,205-206)."""

    N_CLASSES, BATCH, STEPS, EPOCHS, IMG = 8, 32, 4, 4, 80
    LR, WD, WARMUP, WARMUP_LR = 4e-3, 0.05, 2, 1e-6

    def test_torch_vs_jax(self):
        import torch
        import torch.nn.functional as F

        from . import timm_shim

        timm_shim.install()
        from timm.optim import AdamW
        from timm.scheduler import CosineLRScheduler

        cn4, _ = ref_loader.load_phase_model_module("sun_train_teacher", "convnet4")
        _, registry = ref_loader.load_phase_model_module(
            "sun_train_teacher", "classifier")
        _patch_convnet4_view(cn4)

        images, labels = class_images(self.N_CLASSES, 32, self.IMG, seed=5)
        rng = np.random.default_rng(17)
        # one shuffle per epoch, like the reference's per-epoch DataLoader
        idx = np.stack([
            rng.permutation(len(images))[: self.STEPS * self.BATCH]
            for _ in range(self.EPOCHS)
        ]).reshape(self.EPOCHS, self.STEPS, self.BATCH).astype(np.int32)

        torch.manual_seed(0)
        net = registry.make(
            "classifier", encoder="convnet4", encoder_args={},
            classifier="linear-classifier",
            classifier_args={"n_classes": self.N_CLASSES},
        )

        # --- reference loop, verbatim semantics (train_classifier.py) ---
        lr = self.LR * (self.BATCH / 512)  # :130
        optimizer = AdamW(net.parameters(), betas=(0.9, 0.999), eps=1e-8,
                          lr=lr, weight_decay=self.WD)  # :131
        lr_scheduler = CosineLRScheduler(
            optimizer, warmup_lr_init=self.WARMUP_LR, t_initial=self.EPOCHS,
            cycle_decay=0.1, warmup_t=self.WARMUP)  # :132
        t_losses, t_lrs = [], []
        for epoch in range(1, self.EPOCHS + 1):
            net.train()
            t_lrs.append(optimizer.param_groups[0]["lr"])
            for step in range(self.STEPS):
                b = idx[epoch - 1, step]
                data = to_torch_batch(images[b])
                label = torch.from_numpy(labels[b])
                logits = net(data)
                loss = F.cross_entropy(logits, label)  # :166
                optimizer.zero_grad()
                loss.backward()
                optimizer.step()  # :170-172
                t_losses.append(loss.item())
            lr_scheduler.step(epoch - 1)  # :206

        # --- framework side: same weights, same batches ---
        from fewshot_vit_tpu.core import Config, models
        import fewshot_vit_tpu.models  # noqa: F401
        import fewshot_vit_tpu.heads  # noqa: F401
        from fewshot_vit_tpu.train.runner import build_optimizer
        from fewshot_vit_tpu.train.state import TrainState
        from fewshot_vit_tpu.train.steps import make_pretrain_step

        model = models.make(
            "classifier", encoder="convnet4",
            classifier="linear-classifier",
            classifier_args={"n_classes": self.N_CLASSES},
        )
        template = jax.tree_util.tree_map(
            np.asarray,
            model.init(jax.random.key(0),
                       jnp.zeros((1, self.IMG, self.IMG, 3))),
        )
        torch.manual_seed(0)
        net0 = registry.make(
            "classifier", encoder="convnet4", encoder_args={},
            classifier="linear-classifier",
            classifier_args={"n_classes": self.N_CLASSES},
        )
        variables = convert_full(net0, template)

        cfg = Config({
            "optimizer": "adamw", "max_epoch": self.EPOCHS,
            "optimizer_args": {
                "lr": self.LR, "scale_lr_by_batch": True,
                "weight_decay": self.WD, "schedule": "cosine",
                "warmup_epochs": self.WARMUP, "warmup_lr": self.WARMUP_LR,
            },
        })
        tx = build_optimizer(cfg, variables["params"], self.STEPS, self.BATCH)
        state = TrainState.create(variables, tx)
        step_fn = make_pretrain_step(model, tx, mean=MEAN, std=STD)

        images_j = jnp.asarray(images)
        labels_j = jnp.asarray(labels.astype(np.int32))
        j_losses = []
        for epoch in range(1, self.EPOCHS + 1):
            for step in range(self.STEPS):
                b = jnp.asarray(idx[epoch - 1, step])
                state, m = step_fn(state, images_j[b], labels_j[b],
                                   jax.random.key(epoch * 100 + step))
                j_losses.append(float(m["loss"]))

        # per-epoch lr table equals what the torch loop actually used
        from fewshot_vit_tpu.train.optim import timm_cosine_schedule

        s = timm_cosine_schedule(lr, self.STEPS, self.EPOCHS,
                                 self.WARMUP, self.WARMUP_LR)
        j_lrs = [float(s(e * self.STEPS)) for e in range(self.EPOCHS)]
        np.testing.assert_allclose(j_lrs, t_lrs, rtol=1e-6)

        np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3, atol=2e-4)

        final = convert_full(net, template)
        # AdamW params_atol: lr*steps/2 = 2e-3 (see assert_final_state_close)
        assert_final_state_close(state, final, "pretrain", params_atol=2e-3)


class TestMetaTuneTrajectory:
    """Phase 3a meta-tuning, both reference scripts:

    * plain: SGD(momentum .9, wd on every param) + torch MultiStepLR
      (meta_tuning_sun_m/train_meta.py:133-135 via utils.make_optimizer:128-139,
      step at :211);
    * warmup: SGD + timm MultiStepLRScheduler(decay .5, warmup_t 3,
      warmup_lr_init 1e-5), step(epoch-1) (train_meta_warmup.py:140-141,217).
    """

    WAY, SHOT, QUERY, EPB = 4, 1, 3, 2
    STEPS, IMG = 3, 80
    LR, WD, GAMMA = 1e-3, 5e-4, 0.5

    def _episode_indices(self, labels, epochs, seed):
        """(epochs, STEPS, EPB*way*(shot+query)) in the reference block layout
        (few_shot.split_shot_query: per episode, way blocks of shot+query)."""
        rng = np.random.default_rng(seed)
        n_classes = int(labels.max()) + 1
        by_class = [np.flatnonzero(labels == c) for c in range(n_classes)]
        out = np.empty(
            (epochs, self.STEPS, self.EPB, self.WAY, self.SHOT + self.QUERY),
            np.int64)
        for e in range(epochs):
            for s in range(self.STEPS):
                for b in range(self.EPB):
                    classes = rng.choice(n_classes, self.WAY, replace=False)
                    for w, c in enumerate(classes):
                        out[e, s, b, w] = rng.choice(
                            by_class[c], self.SHOT + self.QUERY, replace=False)
        return out.reshape(epochs, self.STEPS, -1)

    def _run_pair(self, epochs, torch_make_sched, sched_step):
        import torch
        import torch.nn.functional as F

        from . import timm_shim

        timm_shim.install()
        ref_loader.load_phase_model_module("meta_tuning_sun_m", "convnet4")
        _, registry = ref_loader.load_phase_model_module(
            "meta_tuning_sun_m", "meta_baseline")
        utils_mod = ref_loader.load_phase_utils("meta_tuning_sun_m")
        fs = utils_mod.few_shot

        images, labels = class_images(10, 24, self.IMG, seed=7)
        idx = self._episode_indices(labels, epochs, seed=23)

        torch.manual_seed(1)
        net = registry.make("meta-baseline", encoder="convnet4")
        optimizer = torch.optim.SGD(net.parameters(), self.LR,
                                    momentum=0.9, weight_decay=self.WD)
        lr_scheduler = torch_make_sched(optimizer)
        label = fs.make_nk_label(self.WAY, self.QUERY, ep_per_batch=self.EPB)
        t_losses, t_lrs = [], []
        for epoch in range(1, epochs + 1):
            net.train()  # train_meta.py:142 (freeze_bn unset)
            t_lrs.append(optimizer.param_groups[0]["lr"])
            for step in range(self.STEPS):
                data = to_torch_batch(images[idx[epoch - 1, step]])
                x_shot, x_query = fs.split_shot_query(
                    data, self.WAY, self.SHOT, self.QUERY,
                    ep_per_batch=self.EPB)  # :148-150
                logits = net(x_shot, x_query).view(-1, self.WAY)
                loss = F.cross_entropy(logits, label)  # :167-168
                optimizer.zero_grad()
                loss.backward()
                optimizer.step()  # :173-175
                t_losses.append(loss.item())
            sched_step(lr_scheduler, epoch)
        return images, labels, idx, net, registry, t_losses, t_lrs

    def _run_jax(self, images, idx, epochs, net0, registry, cfg_optimizer_args):
        import torch

        from fewshot_vit_tpu.core import Config, models
        import fewshot_vit_tpu.models  # noqa: F401
        import fewshot_vit_tpu.heads  # noqa: F401
        from fewshot_vit_tpu.ops.episodes import split_shot_query
        from fewshot_vit_tpu.train.runner import build_optimizer
        from fewshot_vit_tpu.train.state import TrainState
        from fewshot_vit_tpu.train.steps import make_meta_tune_step

        head = models.make("meta-baseline", encoder="convnet4")
        xs0 = jnp.zeros((1, self.WAY, self.SHOT, self.IMG, self.IMG, 3))
        xq0 = jnp.zeros((1, self.WAY * self.QUERY, self.IMG, self.IMG, 3))
        template = jax.tree_util.tree_map(
            np.asarray, head.init(jax.random.key(0), xs0, xq0))
        variables = convert_full(net0, template)

        cfg = Config({"optimizer": "sgd", "max_epoch": epochs,
                      "optimizer_args": cfg_optimizer_args})
        tx = build_optimizer(cfg, variables["params"], self.STEPS)
        state = TrainState.create(variables, tx)
        step_fn = make_meta_tune_step(
            head, tx, way=self.WAY, query=self.QUERY, ep_per_batch=self.EPB,
            mean=MEAN, std=STD)

        images_j = jnp.asarray(images)
        j_losses = []
        for epoch in range(1, epochs + 1):
            for step in range(self.STEPS):
                flat = images_j[jnp.asarray(idx[epoch - 1, step])]
                xs, xq = split_shot_query(
                    flat, self.WAY, self.SHOT, self.QUERY, self.EPB)
                state, m = step_fn(state, xs, xq,
                                   jax.random.key(epoch * 100 + step))
                j_losses.append(float(m["loss"]))
        return state, j_losses

    def _check(self, epochs, torch_make_sched, sched_step, cfg_optimizer_args,
               expect_lrs=None):
        images, labels, idx, net, registry, t_losses, t_lrs = self._run_pair(
            epochs, torch_make_sched, sched_step)
        import torch

        torch.manual_seed(1)
        net0 = registry.make("meta-baseline", encoder="convnet4")
        state, j_losses = self._run_jax(
            images, idx, epochs, net0, registry, cfg_optimizer_args)

        if expect_lrs is not None:
            np.testing.assert_allclose(expect_lrs, t_lrs, rtol=1e-6)
        np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3, atol=2e-4)

        from fewshot_vit_tpu.core import models

        head = models.make("meta-baseline", encoder="convnet4")
        xs0 = jnp.zeros((1, self.WAY, self.SHOT, self.IMG, self.IMG, 3))
        xq0 = jnp.zeros((1, self.WAY * self.QUERY, self.IMG, self.IMG, 3))
        template = jax.tree_util.tree_map(
            np.asarray, head.init(jax.random.key(0), xs0, xq0))
        final = convert_full(net, template)
        assert_final_state_close(state, final, "meta-tune")

    def test_plain_multistep(self):
        """train_meta.py: torch MultiStepLR([2], gamma .5), .step() at epoch
        end — decayed lr first used in epoch 3."""
        import torch

        from fewshot_vit_tpu.train.optim import multistep_schedule

        epochs = 4
        s = multistep_schedule(self.LR, self.STEPS, [2], gamma=self.GAMMA)
        expect = [float(s(e * self.STEPS)) for e in range(epochs)]
        self._check(
            epochs,
            torch_make_sched=lambda opt: torch.optim.lr_scheduler.MultiStepLR(
                opt, [2], gamma=self.GAMMA),
            sched_step=lambda sch, epoch: sch.step(),  # train_meta.py:211
            cfg_optimizer_args={"lr": self.LR, "weight_decay": self.WD,
                                "gamma": self.GAMMA, "milestones": [2]},
            expect_lrs=expect,
        )

    def test_warmup_multistep(self):
        """train_meta_warmup.py: timm MultiStepLRScheduler(milestones,
        decay .5, warmup_t 3, warmup_lr_init 1e-5), step(epoch-1) at epoch
        end."""
        from timm.scheduler import MultiStepLRScheduler

        from fewshot_vit_tpu.train.optim import timm_multistep_schedule

        epochs = 6
        milestones = [4]
        s = timm_multistep_schedule(
            self.LR, self.STEPS, epochs, milestones, gamma=self.GAMMA,
            warmup_epochs=3, warmup_lr=1e-5)
        expect = [float(s(e * self.STEPS)) for e in range(epochs)]
        self._check(
            epochs,
            torch_make_sched=lambda opt: MultiStepLRScheduler(
                opt, milestones, decay_rate=self.GAMMA,
                warmup_lr_init=1e-5, warmup_t=3),  # train_meta_warmup.py:141
            sched_step=lambda sch, epoch: sch.step(epoch - 1),  # :217
            cfg_optimizer_args={"lr": self.LR, "weight_decay": self.WD,
                                "gamma": self.GAMMA, "milestones": milestones,
                                "warmup_epochs": 3, "warmup_lr": 1e-5},
            expect_lrs=expect,
        )


class TinySunTorchEncoder:
    """BN-free torch twin of TinySunFlaxEncoder (built lazily to avoid a
    module-scope torch import)."""

    @staticmethod
    def build(dim):
        import torch.nn as nn

        return nn.Sequential(
            nn.Conv2d(3, 16, 4, stride=4), nn.ReLU(), nn.Conv2d(16, dim, 1)
        )


def tiny_sun_flax_encoder(dim):
    import flax.linen as nn

    class TinySunFlaxEncoder(nn.Module):
        """(dense NHWC, pooled); VALID 4x4/4 conv -> relu -> 1x1 conv. BN-free
        on purpose: the framework freezes BN during EMD tuning by design
        (train/meta_tune_emd.py:96-104), so a BN encoder would diverge from
        the reference's train-mode BN — everything else must match exactly."""

        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(16, (4, 4), strides=4, padding="VALID", name="c1")(x)
            x = nn.relu(x)
            x = nn.Conv(dim, (1, 1), name="c2")(x)
            return x, jnp.mean(x, axis=(1, 2))

        @property
        def out_dim(self):
            return dim

    return TinySunFlaxEncoder()


class TestSunDTrajectory:
    """Phase 3b SUN-D DeepEMD tuning (meta_tuning_sun_d/train_meta.py):
    nesterov SGD(wd 5e-4 on every param) + StepLR, loss/bs gradient
    accumulation stepping every bs episodes (:145-177), detect_grad_nan,
    StepLR.step() at epoch end (:228).

    The torch side is the REAL ``Network.DeepEMD`` head (weights/similarity/
    logits/backward all reference code) around the tiny BN-free encoder; its
    per-pair flow call (``emd_inference_opencv``) is redirected to THIS
    framework's detached Sinkhorn so both sides transport with identical flow
    values — the cv2-exact-vs-Sinkhorn flow delta is measured separately
    (test_sund_protocol_chain), while everything trainable is pinned here.
    """

    WAY, SHOT, QUERY = 3, 1, 3
    BS, STEPS, EPOCHS, IMG, DIM = 2, 2, 3, 20, 8
    LR, STEP_SIZE, GAMMA = 5e-3, 2, 0.5
    REG, ITERS = 0.05, 100

    def _sinkhorn_flow_shim(self):
        """emd_inference_opencv signature (emd_utils.py:65-76): cost (N,N),
        raw weights (N,) -> (cost_scalar, flow np (N,N)); weight normalization
        replicated via normalize_weights (identical math)."""
        from fewshot_vit_tpu.ops.emd import normalize_weights, sinkhorn

        def shim(cost_matrix, weight1, weight2):
            c = jnp.asarray(cost_matrix.detach().numpy())
            w1 = normalize_weights(jnp.asarray(weight1.detach().numpy()))
            w2 = normalize_weights(jnp.asarray(weight2.detach().numpy()))
            flow = sinkhorn(c, w1, w2, reg=self.REG, iters=self.ITERS)
            return 0.0, np.asarray(flow)

        return shim

    def test_torch_vs_jax(self, monkeypatch):
        import argparse

        import torch
        import torch.nn.functional as F

        net_mod = ref_loader.load_sun_d_module("Network")
        # CPU-run the reference module: .cuda() on the flow tensor
        # (Network.py:120) is a device pin, not math
        monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
        monkeypatch.setattr(net_mod, "emd_inference_opencv",
                            self._sinkhorn_flow_shim())

        args = argparse.Namespace(
            backbone="tiny", metric="cosine", norm="center",
            temperature=12.5, solver="opencv", form="L2", l2_strength=1e-6,
            deepemd="fcn", feature_pyramid=None,
            way=self.WAY, shot=self.SHOT, query=self.QUERY,
        )
        net = net_mod.DeepEMD(args, mode="meta")
        torch.manual_seed(2)
        net.encoder = TinySunTorchEncoder.build(self.DIM)
        net.dim = self.DIM

        images, labels_all = class_images(8, 16, self.IMG, seed=11)
        # interleaved episode layout (Models/dataloader/samplers.py:5-34):
        # position t*way + w -> (class w, item t); shots first
        rng = np.random.default_rng(31)
        n_classes = 8
        by_class = [np.flatnonzero(labels_all == c) for c in range(n_classes)]
        idx = np.empty((self.EPOCHS, self.STEPS, self.BS,
                        (self.SHOT + self.QUERY), self.WAY), np.int64)
        for e in range(self.EPOCHS):
            for s in range(self.STEPS):
                for b in range(self.BS):
                    classes = rng.choice(n_classes, self.WAY, replace=False)
                    for w, c in enumerate(classes):
                        idx[e, s, b, :, w] = rng.choice(
                            by_class[c], self.SHOT + self.QUERY, replace=False)
        idx = idx.reshape(self.EPOCHS, self.STEPS, self.BS, -1)

        # --- reference loop, verbatim semantics (train_meta.py:136-228) ---
        optimizer = torch.optim.SGD(
            [{"params": net.parameters(), "lr": self.LR}],
            momentum=0.9, nesterov=True, weight_decay=0.0005)  # :115
        lr_scheduler = torch.optim.lr_scheduler.StepLR(
            optimizer, step_size=self.STEP_SIZE, gamma=self.GAMMA)  # :116
        label = torch.arange(self.WAY).repeat(self.QUERY).long()  # :108-110
        k = self.WAY * self.SHOT
        t_losses, t_lrs = [], []
        for epoch in range(1, self.EPOCHS + 1):
            net.train()
            optimizer.zero_grad()  # :142-144
            t_lrs.append(optimizer.param_groups[0]["lr"])
            i = 0
            for step in range(self.STEPS):
                for b in range(self.BS):
                    i += 1
                    data = to_torch_batch(images[idx[epoch - 1, step, b]])
                    net.mode = "encoder"
                    data = net(data)  # :151-153
                    data_shot, data_query = data[:k], data[k:]
                    net.mode = "meta"
                    logits = net((data_shot.unsqueeze(0).repeat(1, 1, 1, 1, 1),
                                  data_query))  # :158-159 (num_gpu=1)
                    loss = F.cross_entropy(logits, label)
                    total_loss = loss / self.BS  # :166
                    t_losses.append(total_loss.item())
                    total_loss.backward()  # :172
                    if i % self.BS == 0:  # :175-177
                        optimizer.step()
                        optimizer.zero_grad()
            lr_scheduler.step()  # :228

        # --- framework side: same weights, same episodes ---
        from fewshot_vit_tpu.core import Config
        from fewshot_vit_tpu.checkpoint.torch_convert import conv_t2j
        from fewshot_vit_tpu.heads.deepemd import DeepEMD
        from fewshot_vit_tpu.train.meta_tune_emd import (
            build_sund_optimizer,
            make_emd_episode_fn,
            make_emd_epoch_fn,
            make_patch_fn,
        )
        from fewshot_vit_tpu.train.state import TrainState

        head = DeepEMD(
            encoder=tiny_sun_flax_encoder(self.DIM), temperature=12.5,
            solver="sinkhorn_detached", solver_reg=self.REG,
            solver_iters=self.ITERS,
        )
        sd = {kk: v.detach().numpy() for kk, v in net.encoder.state_dict().items()}
        # net already trained above — rebuild its INITIAL weights
        torch.manual_seed(2)
        enc0 = TinySunTorchEncoder.build(self.DIM)
        sd0 = {kk: v.detach().numpy() for kk, v in enc0.state_dict().items()}
        variables = {"params": {"encoder": {
            "c1": {"kernel": jnp.asarray(conv_t2j(sd0["0.weight"])),
                   "bias": jnp.asarray(sd0["0.bias"])},
            "c2": {"kernel": jnp.asarray(conv_t2j(sd0["2.weight"])),
                   "bias": jnp.asarray(sd0["2.bias"])},
        }}}

        cfg = Config({"lr": self.LR, "step_size": self.STEP_SIZE,
                      "gamma": self.GAMMA, "max_epoch": self.EPOCHS})
        tx = build_sund_optimizer(cfg, self.STEPS)
        state = TrainState.create(variables, tx)
        patch_fn = make_patch_fn("fcn", None, 9, 2.0, self.IMG, train=True)
        episode_fn = make_emd_episode_fn(
            head, self.WAY, self.SHOT, self.QUERY, patch_fn,
            MEAN, STD, sfc=False, train=True)
        labels_j = jnp.tile(jnp.arange(self.WAY), self.QUERY)
        epoch_fn = make_emd_epoch_fn(episode_fn, tx, labels_j, self.BS,
                                     grad_accum=True)

        images_j = jnp.asarray(images)
        j_losses = []
        for epoch in range(1, self.EPOCHS + 1):
            state, ms = epoch_fn(state, images_j,
                                 jnp.asarray(idx[epoch - 1]),
                                 jax.random.key(epoch))
            # our per-step loss is the mean over the bs episodes of loss_e;
            # the reference logs loss/bs per episode — compare sums per step
            j_losses.extend(np.asarray(ms["loss"]).tolist())

        t_steps = np.asarray(t_losses).reshape(self.EPOCHS * self.STEPS,
                                               self.BS).sum(-1)
        np.testing.assert_allclose(j_losses, t_steps, rtol=2e-3, atol=2e-4)

        # StepLR per-epoch lr values match our milestone expansion
        from fewshot_vit_tpu.train.optim import multistep_schedule

        s = multistep_schedule(
            self.LR, self.STEPS,
            list(range(self.STEP_SIZE, self.EPOCHS + 1, self.STEP_SIZE)),
            gamma=self.GAMMA)
        expect = [float(s(e * self.STEPS)) for e in range(self.EPOCHS)]
        np.testing.assert_allclose(expect, t_lrs, rtol=1e-6)

        final = {"params": {"encoder": {
            "c1": {"kernel": conv_t2j(sd["0.weight"]), "bias": sd["0.bias"]},
            "c2": {"kernel": conv_t2j(sd["2.weight"]), "bias": sd["2.bias"]},
        }}}
        assert_trees_close({"params": state.params}, final,
                           rtol=5e-3, atol=2e-5, what="sun-d final state")


class TestSunTrajectory:
    """Phase 2 SUN offline token-label distillation
    (sun_meta_training/offline.py): AdamW(lr x bs/512, wd on every param) +
    timm CosineLRScheduler stepped ``step(epoch-1)`` (:229-231, :372), loss =
    cls CE + LITERALLY 0.5 x token soft-target CE (:300 — the config's
    ``tl_weight`` is computed at :236 but the step hardcodes 0.5), teacher
    frozen in eval with ``generate_softlabel`` top-k + background assignment
    (:57-76, :289-290).

    The torch side runs the REAL ``TokenLabelOffline`` forward,
    ``generate_softlabel``, and ``SoftTargetCrossEntropy`` from offline.py /
    token_label.py around the tiny BN-free twin encoder; the loop body is the
    :262-303 step transcribed. generate_softlabel's ``device`` defaults to
    'cuda' — passed 'cpu' here (a device pin, not math).

    One evident reference defect is fixed EXTERNALLY for the comparison
    (the round-3 waiver pattern): ``offline.py:71`` scatters background
    tokens onto real class 1 instead of the background class C, because
    ``bg_map`` is filled with the squeezed max-channel dim (=1), not
    ``n_classes`` — proof by execution in
    test_ops.py::TestSoftLabel::test_reference_bg_label_defect_proof. The
    port labels them class C (the evident intent of the (C+1)-wide label
    space and the ``n_classes+1`` classifier_local); ``_fixed_softlabel``
    moves exactly that one index per bg row on the reference's own output."""

    C, BATCH, STEPS, EPOCHS, IMG, DIM = 6, 16, 3, 3, 20, 8
    LR, WD, WARMUP, WARMUP_LR = 4e-3, 0.05, 1, 1e-6
    SOFT_K, BP = 3, 10

    def _twin(self, seed):
        import torch
        import torch.nn as nn

        class Twin(nn.Module):
            def __init__(self, dim):
                super().__init__()
                self.seq = TinySunTorchEncoder.build(dim)
                self.out_dim = dim

            def forward(self, x):
                d = self.seq(x)
                return d, d.mean((2, 3))

        torch.manual_seed(seed)
        return Twin(self.DIM)

    def _token_label_model(self, seed):
        """The REAL TokenLabelOffline (token_label.py:36-60) around the twin,
        built via __new__ (its ctor routes encoders through the registry)."""
        import torch

        tl_mod, _ = ref_loader.load_phase_model_module(
            "sun_meta_training", "token_label")
        m = tl_mod.TokenLabelOffline.__new__(tl_mod.TokenLabelOffline)
        torch.nn.Module.__init__(m)
        m.encoder = self._twin(seed)
        torch.manual_seed(seed + 100)
        m.classifier = tl_mod.LinearClassifier(self.DIM, self.C)
        m.classifier_local = tl_mod.LinearClassifier(self.DIM, self.C + 1)
        return m

    def _to_flax_variables(self, m):
        from fewshot_vit_tpu.checkpoint.torch_convert import conv_t2j

        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        lin = lambda p: {"linear": {"kernel": sd[f"{p}.linear.weight"].T.copy(),
                                    "bias": sd[f"{p}.linear.bias"]}}
        return {"params": {
            "encoder": {
                "c1": {"kernel": jnp.asarray(conv_t2j(sd["encoder.seq.0.weight"])),
                       "bias": jnp.asarray(sd["encoder.seq.0.bias"])},
                "c2": {"kernel": jnp.asarray(conv_t2j(sd["encoder.seq.2.weight"])),
                       "bias": jnp.asarray(sd["encoder.seq.2.bias"])},
            },
            "classifier": lin("classifier"),
            "classifier_local": lin("classifier_local"),
        }}

    def _fixed_softlabel(self, off, logits_token_t):
        """REAL generate_softlabel + the evident one-line fix applied to its
        OUTPUT: bg rows (exactly one on-value, at index 1 — the :71 defect)
        get that on-value moved to the background class C."""
        import torch

        soft = off.generate_softlabel(logits_token_t, k=self.SOFT_K,
                                      bp=self.BP, device="cpu")
        c = logits_token_t.size(1)
        on_count = (soft > 0.5).sum(1)
        bg_rows = on_count == 1  # fg rows carry SOFT_K on-values
        soft = soft.clone()
        off_v = 0.1 / c
        soft[bg_rows, 1] = off_v
        soft[bg_rows, c] = 1 - 0.1 + off_v
        return soft

    def test_torch_vs_jax(self):
        import torch
        import torch.nn.functional as F

        off = ref_loader.load_sun_offline()
        from timm.optim import AdamW
        from timm.scheduler import CosineLRScheduler

        student_t = self._token_label_model(seed=3)
        teacher_t = self._token_label_model(seed=7)
        teacher_t.eval()

        images, labels = class_images(self.C, 24, self.IMG, seed=13)
        rng = np.random.default_rng(23)
        idx = np.stack([
            rng.permutation(len(images))[: self.STEPS * self.BATCH]
            for _ in range(self.EPOCHS)
        ]).reshape(self.EPOCHS, self.STEPS, self.BATCH).astype(np.int32)

        # --- reference loop (offline.py:225-231, 262-303, 371-372) ---
        lr = self.LR * (self.BATCH / 512)
        optimizer = AdamW(student_t.parameters(), betas=(0.9, 0.999),
                          eps=1e-8, lr=lr, weight_decay=self.WD)
        lr_scheduler = CosineLRScheduler(
            optimizer, warmup_lr_init=self.WARMUP_LR, t_initial=self.EPOCHS,
            cycle_decay=0.1, warmup_t=self.WARMUP)
        criterion_TL = off.SoftTargetCrossEntropy()
        t_losses, t_lrs = [], []
        for epoch in range(1, self.EPOCHS + 1):
            student_t.train()
            t_lrs.append(optimizer.param_groups[0]["lr"])
            for step in range(self.STEPS):
                b = idx[epoch - 1, step]
                data = to_torch_batch(images[b])
                label = torch.from_numpy(labels[b])
                logits_token, logits, _ = student_t(data)
                cls_loss = F.cross_entropy(logits, label)
                with torch.no_grad():
                    logits_token_t, _, _ = teacher_t(data, True)
                    soft_label = self._fixed_softlabel(off, logits_token_t)
                _, c, _, _ = logits_token_t.size()
                logits_flatten = logits_token.permute(0, 2, 3, 1).reshape(-1, c + 1)
                token_loss = criterion_TL(logits_flatten, soft_label)
                loss = cls_loss + 0.5 * token_loss
                optimizer.zero_grad()
                loss.backward()
                optimizer.step()
                t_losses.append(loss.item())
            lr_scheduler.step(epoch - 1)

        # --- framework side: same weights, same batches ---
        from fewshot_vit_tpu.core import Config
        from fewshot_vit_tpu.heads import TokenLabel
        from fewshot_vit_tpu.train.runner import build_optimizer
        from fewshot_vit_tpu.train.state import TrainState
        from fewshot_vit_tpu.train.steps import make_sun_step

        student = TokenLabel(encoder=tiny_sun_flax_encoder(self.DIM),
                             n_classes=self.C)
        teacher = TokenLabel(encoder=tiny_sun_flax_encoder(self.DIM),
                             n_classes=self.C)
        variables = self._to_flax_variables(self._token_label_model(seed=3))
        tvars = self._to_flax_variables(self._token_label_model(seed=7))

        cfg = Config({
            "optimizer": "adamw", "max_epoch": self.EPOCHS,
            "optimizer_args": {
                "lr": self.LR, "scale_lr_by_batch": True,
                "weight_decay": self.WD, "schedule": "cosine",
                "warmup_epochs": self.WARMUP, "warmup_lr": self.WARMUP_LR,
            },
        })
        tx = build_optimizer(cfg, variables["params"], self.STEPS, self.BATCH)
        state = TrainState.create(variables, tx)
        step_fn = make_sun_step(student, teacher, tx, soft_k=self.SOFT_K,
                                bg_tokens=self.BP, token_weight=0.5,
                                mean=MEAN, std=STD)

        images_j = jnp.asarray(images)
        labels_j = jnp.asarray(labels.astype(np.int32))
        j_losses = []
        for epoch in range(1, self.EPOCHS + 1):
            for step in range(self.STEPS):
                b = jnp.asarray(idx[epoch - 1, step])
                state, m = step_fn(state, tvars, images_j[b], images_j[b],
                                   labels_j[b], jax.random.key(epoch * 10 + step))
                j_losses.append(float(m["loss"]))

        np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3, atol=2e-4)

        from fewshot_vit_tpu.train.optim import timm_cosine_schedule

        s = timm_cosine_schedule(lr, self.STEPS, self.EPOCHS,
                                 self.WARMUP, self.WARMUP_LR)
        j_lrs = [float(s(e * self.STEPS)) for e in range(self.EPOCHS)]
        np.testing.assert_allclose(j_lrs, t_lrs, rtol=1e-6)

        final = self._to_flax_variables(student_t)
        # AdamW normalized-update noise bound (see assert_final_state_close)
        assert_final_state_close(state, final, "sun", params_atol=2e-3)

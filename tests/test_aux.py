"""Aux components: SAM, k-shot metric variants, KL loss, attention vis, FC100/CUB loaders."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from fewshot_vit_tpu.core import datasets
import fewshot_vit_tpu.data.datasets  # noqa: F401
from fewshot_vit_tpu.eval.visualize import _jet, attention_maps, overlay
from fewshot_vit_tpu.heads import Classifier, LinearClassifier
from fewshot_vit_tpu.ops.metric import (
    compute_acc_kshots,
    compute_logits_kshot,
    compute_logits_local_kshot,
    softmax_kl_loss,
)
from fewshot_vit_tpu.train import TrainState, make_optimizer
from fewshot_vit_tpu.train.sam import make_sam_pretrain_step, sam_gradient

from .test_heads_eval import TinyEncoder
from .test_train import small_batch


class TestSAM:
    def test_gradient_shape_and_difference(self):
        def loss(p):
            return jnp.sum(jnp.sin(p["w"]) ** 2)

        params = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(8,)), jnp.float32)}
        g_sam, l = sam_gradient(loss, params, rho=0.5)
        g_plain = jax.grad(loss)(params)
        assert g_sam["w"].shape == (8,)
        # perturbed-point grads differ from plain grads
        assert float(jnp.abs(g_sam["w"] - g_plain["w"]).max()) > 1e-4
        # rho=0 recovers plain gradients
        g0, _ = sam_gradient(loss, params, rho=0.0)
        np.testing.assert_allclose(np.asarray(g0["w"]), np.asarray(g_plain["w"]), rtol=1e-5)

    def test_sam_pretrain_step_learns(self):
        model = Classifier(encoder=TinyEncoder(), classifier=LinearClassifier(6, name="classifier"))
        images, labels = small_batch()
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tx = make_optimizer(variables["params"], "adamw", lr=5e-3)
        state = TrainState.create(variables, tx)
        step = make_sam_pretrain_step(model, tx, rho=0.05)
        first = last = None
        for i in range(20):
            state, m = step(state, images, labels, jax.random.key(i))
            first = first if first is not None else float(m["loss"])
            last = float(m["loss"])
        assert last < first


class TestKshotMetrics:
    def test_compute_logits_kshot(self):
        rng = np.random.default_rng(0)
        feat = rng.normal(size=(2, 3, 4, 8)).astype(np.float32)
        proto = rng.normal(size=(2, 5, 4, 8)).astype(np.float32)
        out = compute_logits_kshot(jnp.asarray(feat), jnp.asarray(proto), temp=2.0)
        fn = feat / np.linalg.norm(feat, axis=-1, keepdims=True)
        pn = proto / np.linalg.norm(proto, axis=-1, keepdims=True)
        want = 2.0 * np.einsum("bmkc,bnkc->bnk", pn, fn)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)

    def test_local_kshot(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(3, 6, 8)).astype(np.float32)
        out = compute_logits_local_kshot(jnp.asarray(a), jnp.asarray(a), temp=3.0)
        np.testing.assert_allclose(np.asarray(out), 3.0 * np.ones((3,)), rtol=1e-5)

    def test_acc_kshots(self):
        # 2 samples, way=2, shot=2: per-class max then argmax
        logits = jnp.asarray([[0.1, 0.9, 0.5, 0.2], [0.9, 0.1, 0.0, 0.95]])
        label = jnp.asarray([0, 1])
        acc = float(compute_acc_kshots(logits, label, shot=2))
        assert acc == pytest.approx(1.0)

    def test_softmax_kl(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
        m = jnp.ones((4, 6))
        assert float(softmax_kl_loss(a, a, m)) == pytest.approx(0.0, abs=1e-6)
        b = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
        assert float(softmax_kl_loss(a, b, m)) > 0


class TestVisualize:
    def test_attention_maps_and_overlay(self, tmp_path):
        rng = np.random.default_rng(3)
        dense = jnp.asarray(rng.normal(size=(2, 5, 5, 64)), jnp.float32)
        maps = np.asarray(attention_maps(dense))
        assert maps.shape == (2, 5, 5)
        assert maps.min() >= 0 and maps.max() <= 1.0 + 1e-6
        img_norm = rng.normal(size=(80, 80, 3)).astype(np.float32) * 0.2
        out = overlay(img_norm, maps[0])
        assert out.shape == (80, 80, 3) and out.dtype == np.uint8

    def test_jet_endpoints(self):
        cold = _jet(np.zeros((1,)))
        hot = _jet(np.ones((1,)))
        # JET endpoints are dark blue / dark red (~128), mid is green-ish
        assert cold[0, 2] > 100 and cold[0, 0] < 50  # blue end
        assert hot[0, 0] > 100 and hot[0, 2] < 50  # red end
        mid = _jet(np.full((1,), 0.5))
        assert mid[0, 1] > 200  # green center


class TestDatasetGrid:
    def test_sample_grid_png(self, tmp_path):
        """visualize_datasets flag -> sample-grid PNG per split (reference
        utils.visualize_dataset, sun_train_teacher/utils/__init__.py:142-147)."""
        from fewshot_vit_tpu.core.log import RunLogger
        from fewshot_vit_tpu.core import Config
        from fewshot_vit_tpu.core.registry import datasets
        import fewshot_vit_tpu.data.datasets  # noqa: F401
        from fewshot_vit_tpu.train.runner import visualize_datasets
        from PIL import Image

        ds = datasets.make("synthetic", n_classes=5, n_per_class=5, image_size=16)
        lg = RunLogger(str(tmp_path), stdout=False)
        visualize_datasets(lg, Config({"visualize_datasets": True}),
                           train_dataset=ds, val_dataset=None)
        p = tmp_path / "visualize_train_dataset.png"
        assert p.exists()
        assert Image.open(p).size == (4 * 16, 4 * 16)  # 16 samples, 4x4 grid
        # flag off -> nothing written
        visualize_datasets(lg, Config({}), other=ds)
        assert not (tmp_path / "visualize_other.png").exists()

    def test_augmented_grid_png(self, tmp_path):
        """visualize_datasets also dumps POST-AUGMENTATION view grids — the
        human-inspectable record of what a training batch looks like (the
        reference grid shows post-transform samples,
        sun_meta_training/utils/__init__.py:161-166). The dual view writes
        one grid per view; denormalization must invert _normalize_255."""
        from fewshot_vit_tpu.core.log import RunLogger
        from fewshot_vit_tpu.core import Config
        from fewshot_vit_tpu.core.registry import datasets
        import fewshot_vit_tpu.data.datasets  # noqa: F401
        from fewshot_vit_tpu.data.augment import make_dual_view_fn
        from fewshot_vit_tpu.train.runner import visualize_augmented
        from PIL import Image

        ds = datasets.make("synthetic", n_classes=5, n_per_class=5, image_size=24)
        fn = make_dual_view_fn(ds.mean, ds.std, out_size=16)
        lg = RunLogger(str(tmp_path), stdout=False)
        visualize_augmented(lg, Config({"visualize_datasets": True}), ds, fn,
                            ds.mean, ds.std, views=("strong", "weak"))
        for view in ("strong", "weak"):
            p = tmp_path / f"visualize_train_{view}.png"
            assert p.exists(), view
            im = Image.open(p)
            assert im.size == (4 * 16, 4 * 16)
            # denormalized real pixels, not saturated garbage
            arr = np.asarray(im)
            assert 2 < arr.mean() < 253

        # flag off / no aug fn -> nothing written
        visualize_augmented(lg, Config({}), ds, fn, ds.mean, ds.std,
                            views=("x",))
        visualize_augmented(lg, Config({"visualize_datasets": True}), ds,
                            None, ds.mean, ds.std, views=("y",))
        assert not (tmp_path / "visualize_train_x.png").exists()
        assert not (tmp_path / "visualize_train_y.png").exists()


class TestFolderDatasets:
    def _make_tree(self, root, splits=("train",), n_cls=3, n_img=4, size=32):
        from PIL import Image

        rng = np.random.default_rng(0)
        for split in splits:
            for c in range(n_cls):
                d = os.path.join(root, split, f"class{c}")
                os.makedirs(d)
                for i in range(n_img):
                    Image.fromarray(
                        rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
                    ).save(os.path.join(d, f"{i}.png"))

    def test_fc100(self, tmp_path):
        self._make_tree(str(tmp_path))
        ds = datasets.make("fc100", root_path=str(tmp_path), split="train",
                           image_size=32, protocol="raw")
        assert len(ds) == 12 and ds.n_classes == 3
        assert ds.images.shape == (12, 32, 32, 3)

    def test_cub(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(1)
        os.makedirs(tmp_path / "split")
        os.makedirs(tmp_path / "images")
        lines = ["filename,label"]
        for c in range(2):
            for i in range(3):
                name = f"images/c{c}_{i}.jpg"
                Image.fromarray(
                    rng.integers(0, 255, (40, 50, 3)).astype(np.uint8)
                ).save(tmp_path / name)
                lines.append(f"{name},wnid{c}")
        (tmp_path / "split" / "test.csv").write_text("\n".join(lines))
        ds = datasets.make("cub", root_path=str(tmp_path), split="test", image_size=32)
        assert len(ds) == 6 and ds.n_classes == 2
        assert ds.images.shape == (6, 32, 32, 3)


class TestParityRunScript:
    def test_aborts_cleanly_without_materials(self, tmp_path):
        """tools/parity_run.sh (the published-number readiness drill) must
        stay runnable: with no materials it names every missing file and
        exits 2 (not a crash)."""
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            ["bash", os.path.join(repo, "tools", "parity_run.sh"), str(tmp_path)],
            capture_output=True, text=True, timeout=120, cwd=repo,
        )
        assert out.returncode == 2, (out.stdout, out.stderr)
        for f in ("miniImageNet_category_split_test.pickle",
                  "max-va-1shot.pth", "max-va-5shot.pth"):
            assert f in out.stdout


class TestGraftEntryBootstrap:
    """__graft_entry__.dryrun_multichip must never initialize the default
    (axon relay) backend while deciding how to run: that init blocks forever
    when the relay tunnel is down. The decision is a pure function of the
    platform config + XLA_FLAGS strings."""

    def test_decision_is_string_only(self):
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        try:
            from __graft_entry__ import _emulated_cpu_mesh_ready as ready
        finally:
            sys.path.remove(repo)

        flags8 = "--xla_force_host_platform_device_count=8"
        # the driver/test environment: emulated CPU mesh -> run in-process
        assert ready(8, "cpu", flags8)
        assert ready(4, "cpu", flags8)
        # the dev-box default: axon pinned first -> must re-exec, not init
        assert not ready(8, "axon,cpu", flags8)
        assert not ready(8, "axon", flags8)
        # cpu platform but too few / missing emulated devices -> re-exec
        assert not ready(8, "cpu", "--xla_force_host_platform_device_count=4")
        assert not ready(8, "cpu", "")
        # repeated flag: XLA's parser honors the LAST occurrence, so must we
        # (the re-exec append pattern can produce such strings upstream)
        assert not ready(8, "cpu", "--xla_force_host_platform_device_count=16 "
                                   "--xla_force_host_platform_device_count=2")
        assert ready(8, "cpu", "--xla_force_host_platform_device_count=2 "
                               "--xla_force_host_platform_device_count=8")

    def test_real_devices_path(self, monkeypatch):
        """A backend ALREADY initialized with >= n devices runs in-process
        (covers a genuine multi-chip host); an uninitialized backend is never
        touched unless GRAFT_DRYRUN_REAL=1 opts in."""
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        try:
            import __graft_entry__ as ge
        finally:
            sys.path.remove(repo)
        from jax._src import xla_bridge

        # under the conftest env the cpu backend gets initialized by other
        # tests; emulate both states explicitly
        monkeypatch.setattr(xla_bridge, "backends_are_initialized", lambda: False)
        monkeypatch.delenv("GRAFT_DRYRUN_REAL", raising=False)
        assert not ge._real_devices_ready(8)

        monkeypatch.setattr(xla_bridge, "backends_are_initialized", lambda: True)
        assert ge._real_devices_ready(8)      # 8 emulated devices visible
        assert not ge._real_devices_ready(64)

        monkeypatch.setattr(xla_bridge, "backends_are_initialized", lambda: False)
        monkeypatch.setenv("GRAFT_DRYRUN_REAL", "1")
        assert ge._real_devices_ready(8)

    def test_inprocess_branch_taken_under_test_env(self, monkeypatch):
        """Under the conftest env (cpu + 8 emulated devices) the dryrun must
        take the in-process branch — exercised with the impl stubbed out."""
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        try:
            import __graft_entry__ as ge
        finally:
            sys.path.remove(repo)

        calls = []
        monkeypatch.setattr(ge, "_dryrun_impl", lambda n: calls.append(("impl", n)))
        monkeypatch.setattr(ge, "_reexec_dryrun", lambda n: calls.append(("reexec", n)))
        ge.dryrun_multichip(8)
        assert calls == [("impl", 8)]


class TestWatchdog:
    """core/watchdog.py: every timing tool re-execs as a killable child so a
    downed device relay fails loudly instead of hanging forever."""

    def test_timeout_kills_child_and_exits_2(self, tmp_path):
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script = tmp_path / "hang.py"
        script.write_text(
            "import sys, time\n"
            f"sys.path.insert(0, {repr(repo)})\n"
            "from fewshot_vit_tpu.core.watchdog import watchdog_reexec\n"
            "watchdog_reexec(timeout_s=2)\n"
            "time.sleep(60)\n"
        )
        t0 = __import__("time").perf_counter()
        out = subprocess.run([sys.executable, str(script)],
                             capture_output=True, text=True, timeout=30)
        assert out.returncode == 2
        assert "watchdog" in out.stderr
        assert __import__("time").perf_counter() - t0 < 20

    def test_child_runs_once_and_propagates_status(self, tmp_path):
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        marker = tmp_path / "runs.txt"
        script = tmp_path / "ok.py"
        script.write_text(
            "import sys\n"
            f"sys.path.insert(0, {repr(repo)})\n"
            "from fewshot_vit_tpu.core.watchdog import watchdog_reexec\n"
            "watchdog_reexec(timeout_s=30)\n"
            f"open({repr(str(marker))}, 'a').write('x')\n"
            "sys.exit(7)\n"
        )
        out = subprocess.run([sys.executable, str(script)],
                             capture_output=True, text=True, timeout=60)
        assert out.returncode == 7          # child status propagates
        assert marker.read_text() == "x"    # body ran exactly once

    def test_reexec_preserves_module_launch(self, tmp_path):
        """`python -m pkg.mod` entry points must re-exec with -m (argv[0] is
        the module FILE; running it as a script would break relative imports)."""
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        pkg = tmp_path / "wdpkg"
        (pkg / "sub").mkdir(parents=True)
        (pkg / "__init__.py").write_text("")
        (pkg / "helper.py").write_text("VALUE = 42\n")
        (pkg / "sub" / "__init__.py").write_text("")
        (pkg / "sub" / "tool.py").write_text(
            "import sys\n"
            f"sys.path.insert(0, {repr(repo)})\n"
            "from fewshot_vit_tpu.core.watchdog import watchdog_reexec\n"
            "from .. import helper\n"
            "watchdog_reexec(timeout_s=30)\n"
            "print('OK', helper.VALUE)\n"
        )
        env = dict(os.environ)
        env["PYTHONPATH"] = str(tmp_path) + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run([sys.executable, "-m", "wdpkg.sub.tool"],
                             capture_output=True, text=True, timeout=60,
                             env=env, cwd=str(tmp_path))
        assert out.returncode == 0, out.stderr
        assert "OK 42" in out.stdout

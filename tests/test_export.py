"""AOT serving export (eval/export.py): jax.export round-trips.

The artifact must reproduce the live eval forward exactly: weights and
dataset normalization are baked in, input is raw uint8, and the serialized
blob must deserialize and run through ``Exported.call`` alone (the serving
side imports only jax)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from fewshot_vit_tpu.data.transforms import normalize
from fewshot_vit_tpu.eval.export import (
    export_encoder,
    export_episode_scorer,
    load_exported,
    save_exported,
)
from fewshot_vit_tpu.heads.meta_baseline import MetaBaseline


class TinyEncoder(nn.Module):
    """Minimal (dense_map, pooled) contract encoder."""

    feat: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.feat, (3, 3), strides=(2, 2))(x)
        x = nn.gelu(x)
        pooled = x.mean(axis=(1, 2))
        return x, pooled


WAY, SHOT, QUERY, IMG, EPB = 3, 2, 4, 16, 2


@pytest.fixture(scope="module")
def head_and_vars():
    head = MetaBaseline(encoder=TinyEncoder())
    xs0 = jnp.zeros((1, WAY, SHOT, IMG, IMG, 3), jnp.float32)
    xq0 = jnp.zeros((1, WAY * QUERY, IMG, IMG, 3), jnp.float32)
    variables = head.init(jax.random.key(0), xs0, xq0)
    return head, variables


def _episode_inputs(seed=0):
    rng = np.random.default_rng(seed)
    xs = rng.integers(0, 256, (EPB, WAY, SHOT, IMG, IMG, 3)).astype(np.uint8)
    xq = rng.integers(0, 256, (EPB, WAY * QUERY, IMG, IMG, 3)).astype(np.uint8)
    return xs, xq


class TestEpisodeScorerExport:
    def test_roundtrip_matches_live_forward(self, head_and_vars, tmp_path):
        head, variables = head_and_vars
        mean, std = (0.4, 0.5, 0.6), (0.2, 0.25, 0.3)
        exp = export_episode_scorer(
            head, variables, way=WAY, shot=SHOT, query=QUERY,
            image_size=IMG, ep_per_batch=EPB, mean=mean, std=std,
        )
        path = str(tmp_path / "scorer.stablehlo")
        save_exported(exp, path)
        loaded = load_exported(path)

        xs, xq = _episode_inputs()
        got = np.asarray(loaded.call(xs, xq))
        want = np.asarray(head.apply(
            variables, normalize(jnp.asarray(xs), mean, std),
            normalize(jnp.asarray(xq), mean, std), train=False,
        ))
        assert got.shape == (EPB, WAY * QUERY, WAY)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_artifact_rejects_wrong_shape(self, head_and_vars):
        head, variables = head_and_vars
        exp = export_episode_scorer(
            head, variables, way=WAY, shot=SHOT, query=QUERY,
            image_size=IMG, ep_per_batch=EPB,
        )
        xs, xq = _episode_inputs()
        with pytest.raises(Exception):
            exp.call(xs[:1], xq)  # episode-batch mismatch

    def test_explicit_platform_recorded(self, head_and_vars):
        head, variables = head_and_vars
        exp = export_episode_scorer(
            head, variables, way=WAY, shot=SHOT, query=QUERY,
            image_size=IMG, platforms=("cpu",),
        )
        assert tuple(exp.platforms) == ("cpu",)


class TestShardedExport:
    def test_multichip_artifact_matches_single_device(self, head_and_vars,
                                                      tmp_path, devices8):
        """An 8-shard artifact (exported via AbstractMesh — no 8 devices
        needed at export time) must serve sharded inputs on a concrete
        8-device mesh and match the unsharded artifact's logits."""
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        head, variables = head_and_vars
        epb = 8
        kw = dict(way=WAY, shot=SHOT, query=QUERY, image_size=IMG,
                  ep_per_batch=epb)
        plain = export_episode_scorer(head, variables, **kw)
        sharded = export_episode_scorer(head, variables, data_shards=8, **kw)
        assert sharded.nr_devices == 8
        path = str(tmp_path / "scorer8.stablehlo")
        save_exported(sharded, path)
        loaded = load_exported(path)

        rng = np.random.default_rng(7)
        xs = rng.integers(0, 256, (epb, WAY, SHOT, IMG, IMG, 3)).astype(np.uint8)
        xq = rng.integers(0, 256, (epb, WAY * QUERY, IMG, IMG, 3)).astype(np.uint8)

        mesh = Mesh(np.array(devices8), ("data",))
        xs_d = jax.device_put(xs, NamedSharding(mesh, P("data")))
        xq_d = jax.device_put(xq, NamedSharding(mesh, P("data")))
        got = np.asarray(loaded.call(xs_d, xq_d))
        want = np.asarray(plain.call(xs, xq))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_indivisible_shards_rejected(self, head_and_vars):
        head, variables = head_and_vars
        with pytest.raises(ValueError, match="data_shards"):
            export_episode_scorer(head, variables, way=WAY, shot=SHOT,
                                  query=QUERY, image_size=IMG,
                                  ep_per_batch=2, data_shards=8)


class TestEncoderExport:
    def test_roundtrip_matches_live_forward(self, head_and_vars, tmp_path):
        head, variables = head_and_vars
        enc_vars = {col: tree["encoder"] for col, tree in variables.items()
                    if "encoder" in tree}
        exp = export_encoder(head.encoder, enc_vars, image_size=IMG, batch=4)
        path = str(tmp_path / "encoder.stablehlo")
        save_exported(exp, path)
        loaded = load_exported(path)

        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 256, (4, IMG, IMG, 3)).astype(np.uint8)
        got = np.asarray(loaded.call(imgs))
        _, want = head.encoder.apply(enc_vars, normalize(jnp.asarray(imgs)),
                                     train=False)
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-6)


class TestEmdEpisodeScorerExport:
    def _head_and_vars(self):
        from fewshot_vit_tpu.heads.deepemd import DeepEMD

        head = DeepEMD(encoder=TinyEncoder(), solver_iters=10)
        variables = head.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))
        return head, variables

    def _patch_fn(self):
        from fewshot_vit_tpu.train.meta_tune_emd import make_patch_fn

        return make_patch_fn("grid", [2, 3], 9, 2.0, IMG, False)

    def test_roundtrip_matches_live_episode_fn(self, tmp_path):
        """The artifact must reproduce the live eval-mode DeepEMD episode
        forward (patches + encoder + Sinkhorn) bit-for-bit with the same
        baked rng."""
        from fewshot_vit_tpu.eval.export import export_emd_episode_scorer
        from fewshot_vit_tpu.train.meta_tune_emd import make_emd_episode_fn

        head, variables = self._head_and_vars()
        mean, std = (0.4, 0.5, 0.6), (0.2, 0.25, 0.3)
        epb, shot = 2, 1
        exp = export_emd_episode_scorer(
            head, variables, way=WAY, shot=shot, query=QUERY,
            image_size=IMG, patch_fn=self._patch_fn(),
            ep_per_batch=epb, mean=mean, std=std, seed=0,
        )
        path = str(tmp_path / "emd.stablehlo")
        save_exported(exp, path)
        loaded = load_exported(path)

        rng = np.random.default_rng(5)
        imgs = rng.integers(
            0, 256, (epb, WAY * (shot + QUERY), IMG, IMG, 3)).astype(np.uint8)
        got = np.asarray(loaded.call(imgs))
        assert got.shape == (epb, WAY * QUERY, WAY)

        ep_fn = make_emd_episode_fn(head, WAY, shot, QUERY, self._patch_fn(),
                                    mean, std, sfc=False)
        keys = jax.random.split(jax.random.key(0), epb)
        want = np.asarray(jax.vmap(
            lambda im, k: ep_fn(variables, im, k))(jnp.asarray(imgs), keys))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_multishot_sfc_compiles_into_artifact(self, tmp_path):
        """shot>1 bakes the SFC inner optimization (lax.scan of SGD steps)
        into the blob; logits must match the live SFC path with the same
        baked rng."""
        from fewshot_vit_tpu.eval.export import export_emd_episode_scorer
        from fewshot_vit_tpu.train.meta_tune_emd import make_emd_episode_fn

        head, variables = self._head_and_vars()
        shot = 2
        # modest lr: the protocol's lr=100 amplifies the ~1e-6 compiled-
        # artifact-vs-live fusion jitter through the SGD steps; this test
        # pins the export WIRING (SFC numerics vs the reference are pinned
        # in tests/test_deepemd.py / test_sund_protocol_parity.py)
        sfc_kw = {"steps": 3, "lr": 0.5, "batch_size": 4}
        exp = export_emd_episode_scorer(
            head, variables, way=WAY, shot=shot, query=QUERY,
            image_size=IMG, patch_fn=self._patch_fn(), sfc_kw=sfc_kw,
            ep_per_batch=1, seed=3,
        )
        path = str(tmp_path / "emd_sfc.stablehlo")
        save_exported(exp, path)
        loaded = load_exported(path)
        rng = np.random.default_rng(6)
        imgs = rng.integers(
            0, 256, (1, WAY * (shot + QUERY), IMG, IMG, 3)).astype(np.uint8)
        got = np.asarray(loaded.call(imgs))

        from fewshot_vit_tpu.data.transforms import MEAN, STD

        ep_fn = make_emd_episode_fn(head, WAY, shot, QUERY, self._patch_fn(),
                                    MEAN, STD, sfc=True, sfc_kw=sfc_kw)
        keys = jax.random.split(jax.random.key(3), 1)
        want = np.asarray(jax.vmap(
            lambda im, k: ep_fn(variables, im, k))(jnp.asarray(imgs), keys))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestExportCLI:
    def _write_cfg(self, tmp_path):
        cfg = tmp_path / "export.yaml"
        cfg.write_text(
            "dataset: synthetic\n"
            "dataset_args: {n_classes: 4, n_per_class: 8, image_size: 16, seed: 0}\n"
            "encoder: convnet4\n"
            "image_size: 16\n"
        )
        return cfg

    def test_cli_writes_artifact_with_synthetic_stats(self, tmp_path, capsys,
                                                      monkeypatch):
        cfg = self._write_cfg(tmp_path)
        out = tmp_path / "scorer.stablehlo"
        monkeypatch.setattr(
            "sys.argv",
            ["export", "--config", str(cfg), "--out", str(out),
             "--way", "2", "--shot", "1", "--query", "2"],
        )
        from fewshot_vit_tpu.eval.export import main

        main()
        assert out.exists() and out.stat().st_size > 0
        assert "exported episode scorer" in capsys.readouterr().out

        loaded = load_exported(str(out))
        rng = np.random.default_rng(2)
        xs = rng.integers(0, 256, (1, 2, 1, 16, 16, 3)).astype(np.uint8)
        xq = rng.integers(0, 256, (1, 4, 16, 16, 3)).astype(np.uint8)
        assert np.asarray(loaded.call(xs, xq)).shape == (1, 4, 2)

    def test_cli_fold_bn(self, tmp_path, capsys, monkeypatch):
        """--fold-bn bakes BN-free folded weights into the artifact; the
        exported scorer must match the UNFOLDED live forward (the fold is an
        exact transform, models/fold.py) on a supported family."""
        cfg = tmp_path / "export_fold.yaml"
        cfg.write_text(
            "dataset: synthetic\n"
            "dataset_args: {n_classes: 4, n_per_class: 8, image_size: 16, seed: 0}\n"
            "encoder: resnet12\n"
            "image_size: 16\n"
        )
        out = tmp_path / "scorer_folded.stablehlo"
        monkeypatch.setattr(
            "sys.argv",
            ["export", "--config", str(cfg), "--out", str(out),
             "--way", "2", "--shot", "1", "--query", "2", "--fold-bn"],
        )
        from fewshot_vit_tpu.eval.export import main

        main()
        assert out.exists() and out.stat().st_size > 0

        # live UNFOLDED reference logits on the same weights (seeded init
        # path = load_model_for_eval's) — exactness through the baked fold
        import jax
        import jax.numpy as jnp

        from fewshot_vit_tpu.core import Config
        from fewshot_vit_tpu.data.transforms import normalize, MEAN, STD
        from fewshot_vit_tpu.eval.run import load_model_for_eval

        head, variables = load_model_for_eval(Config({"encoder": "resnet12",
                                                      "image_size": 16}))
        rng = np.random.default_rng(3)
        xs = rng.integers(0, 256, (1, 2, 1, 16, 16, 3)).astype(np.uint8)
        xq = rng.integers(0, 256, (1, 4, 16, 16, 3)).astype(np.uint8)
        live = head.apply(variables, normalize(jnp.asarray(xs), MEAN, STD),
                          normalize(jnp.asarray(xq), MEAN, STD))
        got = np.asarray(load_exported(str(out)).call(xs, xq))
        np.testing.assert_allclose(got, np.asarray(live), rtol=2e-4, atol=2e-4)

    def test_cli_encoder_only(self, tmp_path, capsys, monkeypatch):
        """--encoder-only exports images -> pooled embeddings (the artifact
        behind cached/feature-store protocols) through the real CLI, and the
        artifact output must MATCH the live encoder forward loaded the same
        way main() loads it (same config -> same weights, same dataset-stat
        normalization) — so a stats/normalization regression in the CLI
        encoder path fails here, not just a shape check."""
        cfg = self._write_cfg(tmp_path)
        out = tmp_path / "encoder.stablehlo"
        monkeypatch.setattr(
            "sys.argv",
            ["export", "--config", str(cfg), "--out", str(out),
             "--encoder-only", "--batch", "4"],
        )
        from fewshot_vit_tpu.eval.export import main

        main()
        assert "exported encoder" in capsys.readouterr().out
        loaded = load_exported(str(out))
        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 256, (4, 16, 16, 3)).astype(np.uint8)
        emb = np.asarray(loaded.call(imgs))
        assert emb.ndim == 2 and emb.shape[0] == 4

        from fewshot_vit_tpu.core import load_config
        from fewshot_vit_tpu.core.registry import datasets as dataset_registry
        from fewshot_vit_tpu.eval.episodic import sub_variables
        from fewshot_vit_tpu.eval.run import load_model_for_eval

        cfg_obj = load_config(str(cfg))
        head, variables = load_model_for_eval(cfg_obj)
        ds = dataset_registry.make(cfg_obj["dataset"],
                                   **dict(cfg_obj.get("dataset_args", {})))
        _, want = head.encoder.apply(
            sub_variables(variables, "encoder"),
            normalize(jnp.asarray(imgs), ds.mean, ds.std), train=False,
        )
        np.testing.assert_allclose(emb, np.asarray(want), rtol=1e-6, atol=1e-6)

    def test_cli_emd(self, tmp_path, capsys, monkeypatch):
        """--emd exports the SUN-D DeepEMD episode scorer through the real
        CLI (run_emd config schema)."""
        cfg = tmp_path / "emd.yaml"
        cfg.write_text(
            "test_dataset: synthetic\n"
            "test_dataset_args: {n_classes: 4, n_per_class: 8, image_size: 16, seed: 0}\n"
            "model_args: {encoder: convnet4}\n"
            "deepemd: grid\n"
            "patch_list: [2, 3]\n"
            "patch_ratio: 2\n"
            "image_size: 16\n"
            "solver_iters: 10\n"
        )
        out = tmp_path / "emd.stablehlo"
        monkeypatch.setattr(
            "sys.argv",
            ["export", "--config", str(cfg), "--out", str(out), "--emd",
             "--way", "2", "--shot", "1", "--query", "2"],
        )
        from fewshot_vit_tpu.eval.export import main

        main()
        assert out.exists() and out.stat().st_size > 0
        assert "exported EMD episode scorer" in capsys.readouterr().out
        loaded = load_exported(str(out))
        rng = np.random.default_rng(8)
        imgs = rng.integers(0, 256, (1, 2 * 3, 16, 16, 3)).astype(np.uint8)
        logits = np.asarray(loaded.call(imgs))
        assert logits.shape == (1, 4, 2) and np.isfinite(logits).all()

    def test_cli_data_shards(self, tmp_path, capsys, monkeypatch, devices8):
        """--data-shards 8 builds an 8-chip artifact via AbstractMesh and the
        blob serves sharded inputs on a concrete 8-device mesh."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        cfg = self._write_cfg(tmp_path)
        out = tmp_path / "scorer8.stablehlo"
        monkeypatch.setattr(
            "sys.argv",
            ["export", "--config", str(cfg), "--out", str(out),
             "--way", "2", "--shot", "1", "--query", "2",
             "--ep-per-batch", "8", "--data-shards", "8"],
        )
        from fewshot_vit_tpu.eval.export import main

        main()
        assert "x8 device(s)" in capsys.readouterr().out
        loaded = load_exported(str(out))
        assert loaded.nr_devices == 8
        rng = np.random.default_rng(4)
        xs = rng.integers(0, 256, (8, 2, 1, 16, 16, 3)).astype(np.uint8)
        xq = rng.integers(0, 256, (8, 4, 16, 16, 3)).astype(np.uint8)
        mesh = Mesh(np.array(devices8), ("data",))
        xs_d = jax.device_put(xs, NamedSharding(mesh, P("data")))
        xq_d = jax.device_put(xq, NamedSharding(mesh, P("data")))
        assert np.asarray(loaded.call(xs_d, xq_d)).shape == (8, 4, 2)

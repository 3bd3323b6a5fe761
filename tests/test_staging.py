"""Memory-bounded HBM staging: chunked epochs for datasets bigger than the
device budget (reference scale target: ImageNet-800 via image_folder,
``sun_meta_training/datasets/image_folder.py:12-67``)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.data.staging import EpochStager, memmap_cache, needs_staging


def tiny_images(n=240, img=8, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (n, img, img, 3), dtype=np.uint8)
    labels = (np.arange(n) % 6).astype(np.int32)
    return images, labels


class TestEpochStager:
    def test_needs_staging_threshold(self):
        images, _ = tiny_images()
        assert not needs_staging(images, budget_gb=1.0)
        assert needs_staging(images, budget_gb=images.nbytes / 2 / 2**30)

    def test_chunk_shapes_constant_and_coverage(self):
        images, labels = tiny_images(n=240)
        bytes_per_img = images.nbytes // len(images)
        # budget for ~64 images -> 4 chunks of 60 imgs at batch 20
        st = EpochStager(images, labels, batch_size=20,
                         budget_gb=64 * bytes_per_img / 2**30)
        assert st.total_steps == 12
        assert st.n_chunks == 4 and st.chunk_steps == 3
        seen = []
        shapes = set()
        for imgs_dev, labels_dev, idx in st.epoch(np.random.default_rng(1)):
            shapes.add((imgs_dev.shape, labels_dev.shape, idx.shape))
            got = np.asarray(imgs_dev)
            lab = np.asarray(labels_dev)
            # staged images must pair with their own labels
            for i in range(0, len(lab), 37):
                matches = np.where((images == got[i]).all(axis=(1, 2, 3)))[0]
                assert labels[matches[0]] == lab[i]
            seen.append(got)
        assert len(shapes) == 1  # ONE program shape across chunks
        # every dataset image appears (sample-once semantics, modulo wrap pad)
        flat = np.concatenate(seen).reshape(len(images), -1)
        ds_flat = images.reshape(len(images), -1)
        matched = ((flat[:, None, :16] == ds_flat[None, :, :16]).all(-1)).any(0)
        assert matched.all()

    def test_wrap_pad_when_uneven(self):
        images, labels = tiny_images(n=230)  # 230 // 20 = 11 steps
        bytes_per_img = images.nbytes // len(images)
        st = EpochStager(images, labels, batch_size=20,
                         budget_gb=80 * bytes_per_img / 2**30)
        # 11 steps over 3 chunks -> 4 steps/chunk = 12 staged steps (1 wrapped)
        assert st.n_chunks == 3 and st.chunk_steps == 4
        n_staged = sum(
            imgs.shape[0] for imgs, _, _ in st.epoch(np.random.default_rng(0))
        )
        assert n_staged == 3 * 4 * 20

    def test_memmap_roundtrip(self, tmp_path):
        images, labels = tiny_images()
        mm = memmap_cache(str(tmp_path / "imgs.npy"), images)
        assert isinstance(mm, np.memmap) and not mm.flags.writeable
        st = EpochStager(mm, labels, batch_size=20,
                         budget_gb=60 * (images.nbytes // len(images)) / 2**30)
        imgs_dev, _, _ = next(iter(st.epoch(np.random.default_rng(0))))
        assert np.asarray(imgs_dev).dtype == np.uint8


class TestImageFolderLoader:
    def _make_tree(self, tmp_path, n_classes=3, n_per=4, img=40):
        from PIL import Image
        import json

        rng = np.random.default_rng(0)
        classes = [f"n{i:08d}" for i in range(n_classes)]
        for cname in classes:
            cdir = tmp_path / "images" / cname
            os.makedirs(cdir)
            for j in range(n_per):
                arr = rng.integers(0, 256, (img, img, 3), dtype=np.uint8)
                Image.fromarray(arr).save(cdir / f"{j}.png")
        (tmp_path / "split.json").write_text(json.dumps({"train": classes}))
        return classes

    def test_threaded_load_and_memmap_cache(self, tmp_path):
        from fewshot_vit_tpu.data.datasets import image_folder

        self._make_tree(tmp_path)
        ds1 = image_folder(root_path=str(tmp_path), image_size=32)
        assert ds1.images.shape == (12, 32, 32, 3)
        assert ds1.n_classes == 3
        ds2 = image_folder(root_path=str(tmp_path), image_size=32, cache_memmap=True)
        assert os.path.exists(tmp_path / "_cache_train_32.npy")
        assert isinstance(ds2.images, np.memmap)
        np.testing.assert_array_equal(np.asarray(ds2.images), ds1.images)
        # third load hits the cache: rewrite every source image with new
        # pixels (same count) — a cache hit must return the OLD pixels
        from PIL import Image

        for cdir in (tmp_path / "images").iterdir():
            for f in cdir.iterdir():
                Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(f)
        ds3 = image_folder(root_path=str(tmp_path), image_size=32, cache_memmap=True)
        np.testing.assert_array_equal(np.asarray(ds3.images), ds1.images)
        assert np.asarray(ds3.images).max() > 0  # not the rewritten zeros
        # stale cache (image count changed) trips the guard
        import shutil

        shutil.rmtree(tmp_path / "images" / "n00000000")
        os.makedirs(tmp_path / "images" / "n00000000")
        with pytest.raises(ValueError):
            image_folder(root_path=str(tmp_path), image_size=32, cache_memmap=True)


class TestEpochSubset:
    def test_remap_and_fixed_shape(self):
        from fewshot_vit_tpu.data.staging import epoch_subset

        images, _ = tiny_images(n=240)
        rng = np.random.default_rng(0)
        for cap in (60, 100):
            idx = rng.integers(0, 240, (5, 12), dtype=np.int64)
            subset, local = epoch_subset(images, idx, cap)
            assert subset.shape == (cap,) + images.shape[1:]
            assert local.shape == idx.shape and local.dtype == np.int32
            # remapped gather must reproduce the original gather exactly
            np.testing.assert_array_equal(subset[local], images[idx])

    def test_cap_overflow_raises(self):
        from fewshot_vit_tpu.data.staging import epoch_subset

        images, _ = tiny_images(n=240)
        idx = np.arange(100).reshape(4, 25)
        with pytest.raises(ValueError, match="unique images"):
            epoch_subset(images, idx, cap=50)


class TestStagedTraining:
    def test_pretrain_epoch_over_chunks(self):
        """The unchanged jitted epoch program trains through staged chunks;
        exercises the big-dataset path of train/pretrain.py."""
        from fewshot_vit_tpu.heads import Classifier, LinearClassifier
        from fewshot_vit_tpu.train import TrainState, make_optimizer
        from fewshot_vit_tpu.train.loop import make_pretrain_epoch, metrics_mean
        from .test_heads_eval import TinyEncoder
        from .test_train import small_batch

        images, labels = small_batch(n=192, img=16)
        images, labels = np.asarray(images), np.asarray(labels)
        model = Classifier(encoder=TinyEncoder(), classifier=LinearClassifier(6, name="classifier"))
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tx = make_optimizer(variables["params"], "adamw", lr=5e-3, weight_decay=0.01)
        state = TrainState.create(variables, tx)
        epoch_fn = make_pretrain_epoch(model, tx)

        bytes_per_img = images.nbytes // len(images)
        st = EpochStager(images, labels, batch_size=16,
                         budget_gb=64 * bytes_per_img / 2**30)  # 3 chunks
        assert st.n_chunks >= 3
        losses = []
        for e in range(8):
            ms_all = []
            key = jax.random.key(e)
            for ci, (imgs_c, labels_c, idx_c) in enumerate(
                st.epoch(np.random.default_rng(e))
            ):
                state, ms = epoch_fn(state, imgs_c, labels_c, idx_c,
                                     jax.random.fold_in(key, ci))
                ms_all.append({k: np.asarray(v) for k, v in ms.items()})
            m = metrics_mean({k: np.concatenate([c[k] for c in ms_all]) for k in ms_all[0]})
            losses.append(m["loss"])
        assert losses[-1] < losses[0] * 0.7
        assert int(state.step) == 8 * st.n_chunks * st.chunk_steps

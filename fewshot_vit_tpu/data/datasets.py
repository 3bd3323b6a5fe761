"""Datasets as in-memory uint8 arrays + labels (host side).

Re-design of the reference data layer (``sun_meta_training/datasets/*.py``,
``test_phase/datasets/*.py``): every dataset materializes to a uniform
``ArrayDataset`` — uint8 images (N, H, W, 3), int labels, ``n_classes`` — so the
episodic pipeline, device feed, and eval engine are dataset-agnostic. Loaders
cover the reference's on-disk formats:

  * ``mini-imagenet``: pickled dict {'data': uint8 imgs, 'labels'} per split
    (``test_phase/datasets/mini_imagenet.py:24-49``), files
    ``miniImageNet_category_split_{split}.pickle`` with train -> train_phase_train;
  * ``tiered-imagenet``: ``{split}_images.npz`` + ``{split}_labels.pkl``, BGR
    flip, optional ``mini=True`` 64-class/600-image subsample
    (``sun_meta_training/datasets/tiered_imagenet.py:126-161``);
  * ``cifar-fs``: folder tree ``meta-{split}/<class>/*.png``
    (``sun_meta_training/datasets/cifar_fs.py:99-140``);
  * ``image-folder``: generic folder + split.json (ImageNet-800);
  * ``synthetic``: deterministic generated data for tests/benchmarks (no
    reference equivalent — the reference has no test suite at all).

Eval geometry (resize/crop) is applied once at load; see ``transforms.py``.
"""

from __future__ import annotations

import json
import os
import pickle
from dataclasses import dataclass, field

import numpy as np

from ..core.registry import datasets
from .transforms import (
    CIFAR_MEAN,
    CIFAR_STD,
    MEAN,
    STD,
    resize_center_crop,
    resize_short,
)

DEFAULT_ROOT = "./materials"


@dataclass
class ArrayDataset:
    images: np.ndarray  # uint8 (N, H, W, 3)
    labels: np.ndarray  # int32 (N,)
    n_classes: int
    mean: np.ndarray = field(default_factory=lambda: MEAN)
    std: np.ndarray = field(default_factory=lambda: STD)

    def __len__(self) -> int:
        return len(self.images)


def _apply_eval_geometry(images: np.ndarray, image_size: int, protocol: str) -> np.ndarray:
    if protocol == "raw":
        # keep native resolution — device-side augmentation does the geometry
        return images
    if images.shape[1] == image_size and images.shape[2] == image_size:
        return images
    from concurrent.futures import ThreadPoolExecutor

    if protocol == "resize_crop":
        fn = lambda im: resize_center_crop(im, image_size + 8, image_size)
    else:
        fn = lambda im: resize_short(im, image_size)
    # PIL resize releases the GIL; threads give ~NxCPU speedup on the one-time
    # load of 10k+ images (replaces the reference's 8-worker DataLoader procs)
    with ThreadPoolExecutor(max_workers=8) as pool:
        return np.stack(list(pool.map(fn, images)))


@datasets.register("mini-imagenet")
def mini_imagenet(
    root_path: str = DEFAULT_ROOT,
    split: str = "train",
    image_size: int = 80,
    protocol: str = "resize_crop",
    **_: object,
) -> ArrayDataset:
    split_tag = "train_phase_train" if split == "train" else split
    path = os.path.join(root_path, f"miniImageNet_category_split_{split_tag}.pickle")
    with open(path, "rb") as f:
        pack = pickle.load(f, encoding="latin1")
    images = np.asarray(pack["data"], np.uint8)
    labels = np.asarray(pack["labels"], np.int64)
    labels = labels - labels.min()
    images = _apply_eval_geometry(images, image_size, protocol)
    return ArrayDataset(images, labels.astype(np.int32), int(labels.max()) + 1)


@datasets.register("tiered-imagenet")
def tiered_imagenet(
    root_path: str = DEFAULT_ROOT,
    split: str = "train",
    image_size: int = 80,
    protocol: str = "resize_crop",
    mini: bool = False,
    **_: object,
) -> ArrayDataset:
    split_tag = split
    images = np.load(os.path.join(root_path, f"{split_tag}_images.npz"))["images"]
    images = images[:, :, :, ::-1]  # BGR -> RGB flip (reference :137)
    with open(os.path.join(root_path, f"{split_tag}_labels.pkl"), "rb") as f:
        pack = pickle.load(f, encoding="latin1")
    labels = np.asarray(pack["labels"], np.int64)
    labels = labels - labels.min()
    if mini:  # 64-class / 600-image subsample (reference :146-161)
        rng = np.random.RandomState(0)
        classes = rng.choice(int(labels.max()) + 1, 64, replace=False)
        keep, new_labels = [], []
        for new_c, c in enumerate(sorted(classes)):
            idx = np.where(labels == c)[0][:600]
            keep.append(idx)
            new_labels.append(np.full(len(idx), new_c, np.int64))
        keep = np.concatenate(keep)
        images, labels = images[keep], np.concatenate(new_labels)
    images = _apply_eval_geometry(np.ascontiguousarray(images), image_size, protocol)
    return ArrayDataset(images, labels.astype(np.int32), int(labels.max()) + 1)


@datasets.register("cifar-fs")
def cifar_fs(
    root_path: str = DEFAULT_ROOT,
    split: str = "train",
    image_size: int = 80,
    protocol: str = "resize",
    **_: object,
) -> ArrayDataset:
    """CIFAR-FS folder tree; the reference upsamples the 32px sources to 80
    (``sun_meta_training/datasets/cifar_fs.py:124,146-150`` — Resize(80) is
    the default/eval transform). Use ``protocol='raw'`` for train splits whose
    geometry the device-side augmentation provides."""
    from PIL import Image

    split_dir = os.path.join(root_path, f"meta-{split}")
    classes = sorted(os.listdir(split_dir))
    imgs, labels = [], []
    for ci, cname in enumerate(classes):
        cdir = os.path.join(split_dir, cname)
        for fname in sorted(os.listdir(cdir)):
            im = np.asarray(Image.open(os.path.join(cdir, fname)).convert("RGB"), np.uint8)
            imgs.append(im)
            labels.append(ci)
    images = _apply_eval_geometry(np.stack(imgs), image_size, protocol)
    return ArrayDataset(
        images, np.asarray(labels, np.int32), len(classes),
        mean=CIFAR_MEAN, std=CIFAR_STD,
    )


def _load_images_threaded(paths, load_fn, image_size: int) -> np.ndarray:
    """Decode+resize a path list into one (N, S, S, 3) uint8 array with a
    thread pool (PIL releases the GIL) — replaces the reference's 8-worker
    DataLoader processes for the one-time materialization."""
    from concurrent.futures import ThreadPoolExecutor

    out = np.empty((len(paths), image_size, image_size, 3), np.uint8)

    def work(i):
        out[i] = load_fn(paths[i])

    with ThreadPoolExecutor(max_workers=16) as pool:
        list(pool.map(work, range(len(paths))))
    return out


@datasets.register("image-folder")
def image_folder(
    root_path: str = DEFAULT_ROOT,
    split: str = "train",
    image_size: int = 80,
    split_file: str = "split.json",
    cache_memmap: bool = False,
    **_: object,
) -> ArrayDataset:
    """Generic class-folder dataset with a split.json listing class names
    (reference ``sun_meta_training/datasets/image_folder.py:12-67``).

    ``cache_memmap=True`` persists the decoded array next to the images and
    reopens it as a read-only ``np.memmap`` — for ImageNet-800 scale the
    images then never fully materialize in host RAM, and the training loops'
    HBM staging (``data/staging.py``) streams them chunk-wise to the device.
    """
    from PIL import Image

    with open(os.path.join(root_path, split_file)) as f:
        split_classes = json.load(f)[split]

    paths, labels = [], []
    for ci, cname in enumerate(split_classes):
        cdir = os.path.join(root_path, "images", cname)
        for fname in sorted(os.listdir(cdir)):
            paths.append(os.path.join(cdir, fname))
            labels.append(ci)
    labels = np.asarray(labels, np.int32)

    from .staging import memmap_cache

    cache_path = os.path.join(root_path, f"_cache_{split}_{image_size}.npy")
    if cache_memmap and os.path.exists(cache_path):
        images = memmap_cache(cache_path)
        if len(images) != len(paths):
            raise ValueError(
                f"stale cache {cache_path}: {len(images)} imgs vs {len(paths)} files"
            )
    else:
        load = lambda p: resize_center_crop(
            np.asarray(Image.open(p).convert("RGB"), np.uint8),
            image_size + 8, image_size,
        )
        images = _load_images_threaded(paths, load, image_size)
        if cache_memmap:
            images = memmap_cache(cache_path, images)
    return ArrayDataset(images, labels, len(split_classes))


@datasets.register("fc100")
def fc100(
    root_path: str = DEFAULT_ROOT,
    split: str = "train",
    image_size: int = 80,
    protocol: str = "resize_crop",
    **_: object,
) -> ArrayDataset:
    """Class-folder tree ``FC100/{split}/<class>/*`` (reference
    ``Models/dataloader/fc100/fcn/fc100.py:12-39``)."""
    from PIL import Image

    split_dir = os.path.join(root_path, split)
    classes = [d for d in sorted(os.listdir(split_dir))
               if os.path.isdir(os.path.join(split_dir, d))]
    paths, labels = [], []
    for ci, cname in enumerate(classes):
        cdir = os.path.join(split_dir, cname)
        for fname in sorted(os.listdir(cdir)):
            paths.append(os.path.join(cdir, fname))
            labels.append(ci)
    load = lambda p: _apply_eval_geometry(
        np.asarray(Image.open(p).convert("RGB"), np.uint8)[None], image_size, protocol
    )[0]
    images = _load_images_threaded(paths, load, image_size)
    return ArrayDataset(images, np.asarray(labels, np.int32), len(classes))


@datasets.register("cub")
def cub(
    root_path: str = DEFAULT_ROOT,
    split: str = "train",
    image_size: int = 80,
    protocol: str = "resize_crop",
    **_: object,
) -> ArrayDataset:
    """CUB with csv splits ``cub/split/{split}.csv`` mapping image path ->
    wnid (reference ``Models/dataloader/cub/fcn/cub.py:12-40``, including the
    broken train image at line 5864 being dropped)."""
    from PIL import Image

    with open(os.path.join(root_path, "split", f"{split}.csv")) as f:
        lines = [x.strip() for x in f.readlines()][1:]
    if split == "train" and len(lines) > 5864:
        lines.pop(5864)  # reference: broken image file
    paths, labels, wnids = [], [], {}
    for line in lines:
        name, wnid = line.split(",")[:2]
        labels.append(wnids.setdefault(wnid, len(wnids)))
        paths.append(os.path.join(root_path, name))
    load = lambda p: _apply_eval_geometry(
        np.asarray(Image.open(p).convert("RGB"), np.uint8)[None], image_size, protocol
    )[0]
    images = _load_images_threaded(paths, load, image_size)
    return ArrayDataset(images, np.asarray(labels, np.int32), len(wnids))


@datasets.register("synthetic")
def synthetic(
    n_classes: int = 20,
    n_per_class: int = 40,
    image_size: int = 80,
    seed: int = 0,
    **_: object,
) -> ArrayDataset:
    """Deterministic class-structured random images for tests and benchmarks.

    Each class has a random base pattern; samples are noisy copies, so metric
    heads achieve above-chance accuracy (sanity signal for the eval engine).
    """
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (n_classes, image_size, image_size, 3), dtype=np.int16)
    noise = rng.integers(
        -40, 40, (n_classes * n_per_class, image_size, image_size, 3), dtype=np.int16
    )
    labels = np.repeat(np.arange(n_classes), n_per_class)
    noise += base[labels]
    images = np.clip(noise, 0, 255, out=noise).astype(np.uint8)
    return ArrayDataset(images, labels.astype(np.int32), n_classes)


@datasets.register("synthetic-local")
def synthetic_local(
    n_classes: int = 16,
    n_per_class: int = 40,
    image_size: int = 80,
    patch_size: int = 24,
    seed: int = 0,
    class_seed: int = 0,
    **_: object,
) -> ArrayDataset:
    """Localized-signal synthetic task for end-to-end LEARNING-QUALITY tests.

    Class identity lives ONLY in a ``patch_size`` x ``patch_size`` smooth
    color pattern pasted at a RANDOM location per sample; the rest of the
    image is iid noise shared across classes. Consequences:

      * an UNTRAINED encoder's pooled features are noise-dominated (the
        signal covers ~(patch/image)^2 of the area), so episodic cosine
        matching sits near chance — the baseline the trained pipeline must
        beat;
      * supervised pretraining must learn localized pattern detectors, and
        SUN's token supervision (background class on non-signal patches) is
        *on-thesis*: it sharpens exactly this localization;
      * ``class_seed`` controls the class patterns separately from ``seed``
        (samples), so a disjoint-novel-class test split for true few-shot
        transfer is ``class_seed=1`` — same generative family, unseen
        classes, as in the real protocol.
    """
    rng = np.random.default_rng(seed)
    crng = np.random.default_rng((class_seed + 1) * 7919)
    # smooth class patterns: low-res color grids upsampled to patch_size
    lowres = crng.integers(0, 256, (n_classes, 4, 4, 3)).astype(np.float32)
    reps = -(-patch_size // 4)
    patterns = np.repeat(np.repeat(lowres, reps, 1), reps, 2)[
        :, :patch_size, :patch_size
    ].astype(np.uint8)

    n = n_classes * n_per_class
    labels = np.repeat(np.arange(n_classes), n_per_class)
    images = rng.integers(0, 256, (n, image_size, image_size, 3), dtype=np.uint8)
    ys = rng.integers(0, image_size - patch_size + 1, n)
    xs = rng.integers(0, image_size - patch_size + 1, n)
    for i in range(n):
        images[i, ys[i]: ys[i] + patch_size, xs[i]: xs[i] + patch_size] = patterns[labels[i]]
    return ArrayDataset(images, labels.astype(np.int32), n_classes)

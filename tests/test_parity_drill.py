"""Published-number parity DRILL: execute ``tools/parity_run.sh``'s
measurement plumbing end-to-end on fabricated materials (VERDICT r4, item 4).

The real parity run (reference ``README.md:55-59``: 67.80 +- 0.45 /
83.25 +- 0.28 on the released checkpoints) stays environment-blocked — no
pickles or checkpoints on this box. Until then, the script's measurement
branch (the acc-regex, the CI-overlap PASS/FAIL arithmetic at
``parity_run.sh:80``, and the activation-diff diagnose hook) would be
unexercised plumbing guarding the flagship claim. This drill runs all three
branches for real:

  * materials are fabricated in the EXACT reference formats — the pickle is
    ``{'data': uint8 NHWC, 'labels': [...], 'catname2label': {...}}``
    (``test_phase/datasets/mini_imagenet.py:24-48``) and the checkpoint is a
    reference-format dict saved from a reference-INITIALIZED torch
    meta-baseline (``sun_train_teacher/train_classifier.py:247-274`` layout),
    so the script's loader/converter path is the production one;
  * the PASS leg runs both shot measurements through the real CLI and
    asserts the printed verdict arithmetic against the run's own acc line;
  * the FAIL leg corrupts the checkpoint weights, pins the expected number
    to an unreachable value, and asserts the script fails AND invokes the
    activation-diff localizer.

Drill hooks (``PARITY_EPISODES``, ``PARITY_EXPECT_{N}SHOT``) only override
the episode count and the published numbers; every other line of the script
is the one the real run will execute.
"""

import os
import pickle
import re
import shutil
import subprocess
import sys

import numpy as np
import pytest

from . import ref_loader

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not ref_loader.available(),
                       reason="reference/torch not available"),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def materials(tmp_path_factory):
    """Fabricate ./materials in the exact reference formats."""
    import torch

    root = tmp_path_factory.mktemp("materials")

    # --- synthetic test pickle, reference format & geometry (84x84 uint8,
    # latin1-safe keys; loader: data/datasets.py mini_imagenet) ---
    rng = np.random.default_rng(7)
    n_classes, n_per = 8, 20
    protos = rng.integers(80, 176, (n_classes, 1, 1, 3)).astype(np.float32)
    labels = np.repeat(np.arange(n_classes), n_per)
    noise = rng.normal(0.0, 80.0, (n_classes * n_per, 84, 84, 3))
    images = np.clip(protos[labels] + noise, 0, 255).astype(np.uint8)
    pack = {
        "data": images,
        "labels": labels.tolist(),
        "catname2label": {f"n{c:08d}": int(c) for c in range(n_classes)},
    }
    with open(root / "miniImageNet_category_split_test.pickle", "wb") as f:
        pickle.dump(pack, f)

    # --- reference-format .pth from a reference-initialized torch model ---
    tp = ref_loader.load_test_phase()
    torch.manual_seed(0)
    net = tp.models.make("meta-baseline", encoder="visformer_micro_80")
    blob = {
        "file": "drill",
        "config": {"model": "meta-baseline"},
        "model": "meta-baseline",
        "model_args": {"encoder": "visformer_micro_80"},
        "model_sd": net.state_dict(),
        "training": {"epoch": 1, "optimizer": "sgd", "optimizer_sd": {}},
    }
    torch.save(blob, root / "max-va-1shot.pth")
    shutil.copyfile(root / "max-va-1shot.pth", root / "max-va-5shot.pth")
    return root


def run_script(materials_dir, hooks):
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join([REPO] + [p for p in sys.path if p])
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.update(hooks)
    return subprocess.run(
        ["bash", os.path.join(REPO, "tools", "parity_run.sh"),
         str(materials_dir)],
        capture_output=True, text=True, timeout=2400, cwd=REPO, env=env,
    )


def test_pass_branch(materials):
    """Both shot runs execute the real CLI; the verdict line's measured
    number must be the acc line's number, and a bar that the measurement
    trivially satisfies must print PASS and exit 0."""
    out = run_script(materials, {
        "PARITY_EPISODES": "16",
        "PARITY_EXPECT_1SHOT": "55.0 45.0",
        "PARITY_EXPECT_5SHOT": "55.0 45.0",
    })
    assert out.returncode == 0, (out.stdout[-3000:], out.stderr[-2000:])
    verdicts = re.findall(
        r"(\d)-shot: measured ([0-9.]+) \+- ([0-9.]+) \| published "
        r"([0-9.]+) \+- ([0-9.]+) \| (PASS|FAIL)", out.stdout)
    assert [v[0] for v in verdicts] == ["1", "5"], out.stdout
    accs = re.findall(r"acc=([0-9.]+) \+- ([0-9.]+)", out.stdout)
    assert len(accs) == 2, out.stdout
    for (_, measured, ci, want, bar, verdict), (acc, acc_ci) in zip(verdicts, accs):
        # the verdict consumed the CLI's own numbers, not stale state
        assert abs(float(measured) - float(acc)) < 0.005
        assert abs(float(ci) - float(acc_ci)) < 0.005
        assert (float(want), float(bar)) == (55.0, 45.0)
        assert verdict == "PASS"
        # and the printed arithmetic is the script's CI-overlap rule
        assert abs(float(measured) - 55.0) <= 45.0 + float(ci)


def test_fail_branch_diagnoses(materials, tmp_path):
    """A corrupted checkpoint + an unreachable published number must take
    the FAIL branch and invoke the activation-diff localizer for that
    checkpoint (parity_run.sh diagnose hook)."""
    import torch

    corrupt = tmp_path / "materials"
    shutil.copytree(materials, corrupt)
    blob = torch.load(corrupt / "max-va-1shot.pth", map_location="cpu",
                      weights_only=False)
    with torch.no_grad():
        for k, v in blob["model_sd"].items():
            if k.startswith("encoder.stage3") and k.endswith(".weight") and v.ndim == 4:
                v.mul_(8.0)  # deliberate numerical corruption
    torch.save(blob, corrupt / "max-va-1shot.pth")

    out = run_script(corrupt, {
        "PARITY_EPISODES": "8",
        "PARITY_EXPECT_1SHOT": "99.90 0.01",  # unreachable -> guaranteed FAIL
        "PARITY_EXPECT_5SHOT": "55.0 45.0",
    })
    assert out.returncode == 1, (out.stdout[-3000:], out.stderr[-2000:])
    assert re.search(r"1-shot: measured .* \| FAIL", out.stdout), out.stdout
    # the 5-shot leg still ran (script measures both before exiting)
    assert re.search(r"5-shot: measured .* \| PASS", out.stdout), out.stdout
    # diagnose hook executed: activation-diff table on the failing ckpt.
    # Conversion of the corrupted weights is still exact, so the table
    # itself reports agreement — what the drill proves is that the
    # localizer RUNS and prints its milestone table on a real failure.
    assert "--- activation diff" in out.stdout, out.stdout
    assert "max|delta|" in out.stdout, out.stdout
    assert re.search(r"^pooled ", out.stdout, re.M) or "pooled" in out.stdout

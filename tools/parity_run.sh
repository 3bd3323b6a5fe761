#!/usr/bin/env bash
# Published-number parity drill (VERDICT r2 #9 / BASELINE.md).
#
# The flagship claim — reproducing the reference's released-checkpoint
# miniImageNet numbers (README.md:55-59: 1-shot 67.80 +- 0.45, 5-shot
# 83.25 +- 0.28, 2000 episodes) — needs data this box does not have. This
# script makes the run one command away the moment it exists: drop into
# ./materials
#   * miniImageNet_category_split_test.pickle   (data link: reference README.md:36-47)
#   * the released SUN-M Visformer checkpoints, named
#       max-va-1shot.pth   and   max-va-5shot.pth
# then:  bash tools/parity_run.sh [materials_dir]
#
# Exit 0 iff BOTH measured accuracies fall inside the published CI bars.
# Everything upstream of this run is already parity-tested without the data:
# the pickle loader geometry, the .pth converter (logit-exact on reference
# models), and the episode protocol (tests/test_protocol_parity.py).
set -euo pipefail

cd "$(dirname "$0")/.."
MATERIALS="${1:-./materials}"

PICKLE="$MATERIALS/miniImageNet_category_split_test.pickle"
CKPT1="$MATERIALS/max-va-1shot.pth"
CKPT5="$MATERIALS/max-va-5shot.pth"

missing=0
for f in "$PICKLE" "$CKPT1" "$CKPT5"; do
  if [ ! -f "$f" ]; then
    echo "MISSING: $f"
    missing=1
  fi
done
if [ "$missing" = 1 ]; then
  echo "parity_run: materials incomplete (see header of this script); aborting." >&2
  exit 2
fi

# Drill hooks (tests/test_parity_drill.py): the measurement plumbing below —
# acc-regex, CI-overlap arithmetic, PASS/FAIL branching, diagnose hook — is
# exercised end-to-end on fabricated materials by overriding the episode
# count and the expected numbers. Real runs leave these unset.
EPISODES="${PARITY_EPISODES:-2000}"

run_shot() {
  local shot="$1" ckpt="$2"
  python - "$shot" "$ckpt" "$MATERIALS" "$EPISODES" <<'PY'
import os
import re
import subprocess
import sys
import tempfile

shot, ckpt, materials, episodes = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
cfg = tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False)
cfg.write(f"""
dataset: mini-imagenet
dataset_args: {{root_path: {materials}, split: test}}
encoder: visformer_micro_80
load: {ckpt}
""")
cfg.close()
out = subprocess.run(
    [sys.executable, "-m", "fewshot_vit_tpu.eval.run", "--config", cfg.name,
     "--shot", str(shot), "--episodes", episodes],
    capture_output=True, text=True, timeout=7200,
)
sys.stderr.write(out.stderr[-2000:])
print(out.stdout, end="")
if out.returncode != 0:
    sys.exit(out.returncode)
m = re.search(r"acc=([0-9.]+) \+- ([0-9.]+)", out.stdout)
if not m:
    sys.exit(f"no acc line in output:\n{out.stdout}")
acc, ci = float(m.group(1)), float(m.group(2))
want, bar = (67.80, 0.45) if shot == 1 else (83.25, 0.28)
override = os.environ.get(f"PARITY_EXPECT_{shot}SHOT")
if override:  # drill hook: "want bar"
    want, bar = (float(v) for v in override.split())
ok = abs(acc - want) <= bar + ci  # CI bars of both runs overlap the claim
print(f"{shot}-shot: measured {acc:.2f} +- {ci:.2f} | published {want:.2f} +- {bar:.2f} "
      f"| {'PASS' if ok else 'FAIL'}")
sys.exit(0 if ok else 1)
PY
}

diagnose() {
  # a shot run missed the published bar: localize where the conversion
  # diverges — per-module torch-vs-flax activation table (first row over
  # tolerance is the faulty module)
  local ckpt="$1"
  echo "--- activation diff for $ckpt (tools/activation_diff.py) ---"
  python tools/activation_diff.py --ckpt "$ckpt" || true
}

run_sund() {
  # Optional SUN-D leg: the released DeepEMD-grid checkpoint encodes its
  # accuracy in the filename (69.68, meta_tuning_sun_d/eval.py:14); no CI is
  # published, so the bar is the run's own CI plus the SUN-M 1-shot bar
  # (0.45) as scale, with the measured Sinkhorn-vs-exact delta documented in
  # docs/PARITY.md. 2000 episodes per meta_tuning_sun_d/README.md:36-39.
  local ckpt="$1"
  python - "$ckpt" "$MATERIALS" <<'PY'
import re
import subprocess
import sys
import tempfile

ckpt, materials = sys.argv[1], sys.argv[2]
cfg = tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False)
cfg.write(f"""
test_dataset: mini-imagenet
test_dataset_args: {{root_path: {materials}, split: test}}
model_args: {{encoder: visformer_micro_80}}
deepemd: grid
patch_list: [2, 3]
patch_ratio: 2
temperature: 12.5
load: {ckpt}
""")
cfg.close()
out = subprocess.run(
    [sys.executable, "-m", "fewshot_vit_tpu.eval.run_emd", "--config", cfg.name,
     "--shot", "1", "--episodes", "2000", "--cached"],
    capture_output=True, text=True, timeout=7200,
)
sys.stderr.write(out.stderr[-2000:])
print(out.stdout, end="")
if out.returncode != 0:
    sys.exit(out.returncode)
m = re.search(r"acc=([0-9.]+) \+- ([0-9.]+)", out.stdout)
if not m:
    sys.exit(f"no acc line in output:\n{out.stdout}")
acc, ci = float(m.group(1)), float(m.group(2))
want = 69.68
ok = abs(acc - want) <= 0.45 + ci
print(f"SUN-D grid 1-shot: measured {acc:.2f} +- {ci:.2f} | published {want:.2f} "
      f"(filename, no CI) | {'PASS' if ok else 'FAIL'}")
sys.exit(0 if ok else 1)
PY
}

status=0
run_shot 1 "$CKPT1" || { status=1; diagnose "$CKPT1"; }
run_shot 5 "$CKPT5" || { status=1; diagnose "$CKPT5"; }

CKPT_D="$MATERIALS/SUN-DeepEMD-Grid-Visformer-miniImageNet-1shot-69.68.pth"
if [ -f "$CKPT_D" ]; then
  run_sund "$CKPT_D" || { status=1; diagnose "$CKPT_D"; }
else
  echo "SUN-D leg skipped: $CKPT_D not present (optional)"
fi
exit $status

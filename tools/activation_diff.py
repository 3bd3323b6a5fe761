"""Per-module activation diff: torch checkpoint forward vs converted flax
forward (VERDICT r3, next-round item 6; SURVEY §7 hard-part-1's mitigation).

On the parity-run day, if a released-checkpoint number misses the published
bar, the question is WHERE the conversion diverges. This tool runs the same
normalized batch through the reference torch encoder (its real code, loaded
from /root/reference) and through the converted flax encoder, captures every
stage/block/embed/norm milestone on both sides, and prints max|delta| per
module in forward order — the first row above tolerance localizes the bug.

Milestones are matched mechanically: torch ``stem`` / ``patch_embed{N}`` /
``stage{S}.{I}`` / ``norm`` <-> flax ``stem`` / ``patch_embed{N}`` /
``stage{S}_{I}`` / ``norm`` (NCHW transposed to NHWC for comparison), plus
the pooled embedding. Works for the visformer family (the parity-run
encoder); the module-name rule covers any encoder whose flax port keeps the
reference's milestone names.

Usage:  python tools/activation_diff.py --ckpt materials/max-va-1shot.pth
        (also invoked by tools/parity_run.sh on a FAIL)

``tools/parity_run.sh`` calls this automatically when a shot run fails.
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_MILESTONE = re.compile(r"^(stem|patch_embed\d+|stage\d+\.\d+|norm)$")


def torch_milestones(torch_encoder, x_nchw):
    """[(name, output NHWC numpy)] for every milestone module, in forward
    order, via forward hooks on the REAL reference encoder."""
    import torch

    records = []
    hooks = []
    for name, mod in torch_encoder.named_modules():
        if isinstance(mod, torch.nn.Identity):
            continue  # e.g. patch_embed1 in the init_channels/stem path
        if _MILESTONE.match(name):
            def make_hook(n):
                def hook(_m, _inp, out):
                    t = out[0] if isinstance(out, tuple) else out
                    records.append((n, t.detach().numpy().transpose(0, 2, 3, 1)))
                return hook
            hooks.append(mod.register_forward_hook(make_hook(name)))
    with torch.no_grad():
        out = torch_encoder(torch.from_numpy(x_nchw))
    for h in hooks:
        h.remove()
    pooled = out[1] if isinstance(out, tuple) else out
    records.append(("pooled", pooled.reshape(pooled.shape[0], -1).numpy()))
    return records


def flax_milestones(flax_encoder, enc_vars, x_nhwc):
    """{flax_name: output numpy} captured with capture_intermediates."""
    import jax.numpy as jnp

    (dense, pooled), state = flax_encoder.apply(
        enc_vars, jnp.asarray(x_nhwc), train=False,
        capture_intermediates=True, mutable=["intermediates"],
    )
    out = {}
    for name, sub in state["intermediates"].items():
        if isinstance(sub, dict) and "__call__" in sub:
            val = sub["__call__"][0]
            if hasattr(val, "shape"):
                out[name] = np.asarray(val)
            elif isinstance(val, tuple):
                out[name] = np.asarray(val[0])
    out["pooled"] = np.asarray(pooled).reshape(pooled.shape[0], -1)
    return out


def diff_encoder(torch_encoder, flax_encoder, enc_vars, x_norm_nhwc):
    """Per-milestone comparison on an already-normalized float batch.
    Returns rows [{'module', 'shape', 'max_abs', 'rel'}] in forward order."""
    t_records = torch_milestones(
        torch_encoder, np.ascontiguousarray(x_norm_nhwc.transpose(0, 3, 1, 2)))
    f_records = flax_milestones(flax_encoder, enc_vars, x_norm_nhwc)
    rows = []
    for name, t_out in t_records:
        f_name = name.replace(".", "_")
        if f_name not in f_records:
            rows.append({"module": name, "shape": t_out.shape,
                         "max_abs": float("nan"), "rel": float("nan")})
            continue
        f_out = f_records[f_name]
        if f_out.shape != t_out.shape:
            rows.append({"module": name, "shape": (t_out.shape, f_out.shape),
                         "max_abs": float("inf"), "rel": float("inf")})
            continue
        d = np.abs(f_out - t_out)
        scale = max(float(np.abs(t_out).max()), 1e-8)
        rows.append({"module": name, "shape": t_out.shape,
                     "max_abs": float(d.max()), "rel": float(d.max()) / scale})
    return rows


def first_divergence(rows, rel_tol=1e-2):
    """Name of the first milestone whose relative error crosses ``rel_tol``
    (None if all within tolerance)."""
    for r in rows:
        if not np.isfinite(r["rel"]) or r["rel"] > rel_tol:
            return r["module"]
    return None


def print_table(rows, rel_tol=1e-2):
    first = first_divergence(rows, rel_tol)
    print(f"{'module':<16} {'max|delta|':>12} {'rel':>10}")
    for r in rows:
        mark = "  <-- FIRST DIVERGENCE" if r["module"] == first else ""
        print(f"{r['module']:<16} {r['max_abs']:>12.3e} {r['rel']:>10.2e}{mark}")
    if first is None:
        print(f"all milestones within rel_tol={rel_tol}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="reference .pth (model_sd/params blob)")
    ap.add_argument("--encoder", default="visformer_micro_80")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--rel-tol", type=float, default=1e-2)
    args = ap.parse_args()

    from fewshot_vit_tpu.core.watchdog import watchdog_reexec

    watchdog_reexec(timeout_s=900)

    import jax

    jax.config.update("jax_platforms", "cpu")  # diffing wants determinism, not speed
    import torch

    from fewshot_vit_tpu.core import models
    import fewshot_vit_tpu.models  # noqa: F401
    import fewshot_vit_tpu.heads  # noqa: F401
    from fewshot_vit_tpu.checkpoint.io import load_torch_state_dict
    from tests import ref_loader

    if not ref_loader.available():
        sys.exit("reference tree not available at /root/reference")
    tp = ref_loader.load_test_phase()

    sd, meta = load_torch_state_dict(args.ckpt)
    enc_name = (meta.get("model_args") or {}).get("encoder", args.encoder)
    # torch side: the reference's own registry + state dict
    torch_net = tp.models.make(meta.get("model", "meta-baseline"), encoder=enc_name)
    blob = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    torch_net.load_state_dict(blob.get("model_sd", blob.get("params", blob)))
    torch_net.eval()

    # flax side: the production converter (same path eval/run.py uses)
    from fewshot_vit_tpu.checkpoint.io import load_reference_head_checkpoint
    from fewshot_vit_tpu.core import Config  # noqa: F401

    import jax.numpy as jnp

    flax_enc = models.make(enc_name)
    head = models.make("meta-baseline", encoder=enc_name)
    xs0 = jnp.zeros((1, 2, 1, 80, 80, 3))
    xq0 = jnp.zeros((1, 2, 80, 80, 3))
    variables = jax.tree_util.tree_map(
        np.asarray, head.init(jax.random.key(0), xs0, xq0))
    variables = load_reference_head_checkpoint(args.ckpt, head, variables)
    enc_vars = {col: tree["encoder"] for col, tree in variables.items()
                if isinstance(tree, dict) and "encoder" in tree}

    rng = np.random.default_rng(0)
    x = rng.normal(0.0, 1.0, (args.batch, 80, 80, 3)).astype(np.float32)
    rows = diff_encoder(torch_net.encoder, flax_enc, enc_vars, x)
    print_table(rows, args.rel_tol)
    sys.exit(1 if first_divergence(rows, args.rel_tol) else 0)


if __name__ == "__main__":
    main()

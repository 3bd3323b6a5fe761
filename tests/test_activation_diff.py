"""Drill for tools/activation_diff.py (VERDICT r3, next-round item 6): the
per-module torch-vs-flax activation diff must (a) report all milestones clean
on a faithful conversion and (b) localize an INJECTED converter bug to the
right module — proving the tool would actually find a conversion fault on
the parity-run day rather than just printing numbers."""

import numpy as np
import pytest

import jax

from . import ref_loader

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not ref_loader.available(), reason="reference/torch not available"),
]


class TestActivationDiff:
    @pytest.fixture(scope="class")
    def pair(self, tmp_path_factory):
        import torch

        from fewshot_vit_tpu.checkpoint.io import load_reference_head_checkpoint
        from fewshot_vit_tpu.core import models
        import fewshot_vit_tpu.models  # noqa: F401
        import fewshot_vit_tpu.heads  # noqa: F401
        import jax.numpy as jnp

        tp = ref_loader.load_test_phase()
        torch.manual_seed(0)
        net = tp.models.make("meta-baseline", encoder="visformer_micro_80")
        net.eval()
        pth = str(tmp_path_factory.mktemp("ad") / "max-va.pth")
        torch.save({"model": "meta-baseline",
                    "model_args": {"encoder": "visformer_micro_80"},
                    "model_sd": net.state_dict()}, pth)

        head = models.make("meta-baseline", encoder="visformer_micro_80")
        xs0 = jnp.zeros((1, 2, 1, 80, 80, 3))
        xq0 = jnp.zeros((1, 2, 80, 80, 3))
        variables = jax.tree_util.tree_map(
            np.asarray, head.init(jax.random.key(0), xs0, xq0))
        variables = load_reference_head_checkpoint(pth, head, variables)
        enc_vars = {col: tree["encoder"] for col, tree in variables.items()
                    if isinstance(tree, dict) and "encoder" in tree}
        flax_enc = models.make("visformer_micro_80")
        x = np.random.default_rng(0).normal(
            0.0, 1.0, (2, 80, 80, 3)).astype(np.float32)
        return net.encoder, flax_enc, enc_vars, x

    def test_clean_conversion_all_milestones_within_tol(self, pair):
        from tools.activation_diff import diff_encoder, first_divergence

        torch_enc, flax_enc, enc_vars, x = pair
        rows = diff_encoder(torch_enc, flax_enc, enc_vars, x)
        # every visformer milestone present and matched on both sides
        names = [r["module"] for r in rows]
        assert "stem" in names and "norm" in names and "pooled" in names
        assert sum(n.startswith("stage") for n in names) >= 9
        assert first_divergence(rows, rel_tol=1e-2) is None, rows

    def test_injected_converter_bug_is_localized(self, pair):
        from tools.activation_diff import diff_encoder, first_divergence

        torch_enc, flax_enc, enc_vars, x = pair
        bad = jax.tree_util.tree_map(np.array, enc_vars)
        # classic converter fault: wrong input-axis layout on ONE block's qkv
        # kernel (row order reversed — shape-preserving, numerically fatal)
        k = bad["params"]["stage2_0"]["attn"]["qkv"]["kernel"]
        bad["params"]["stage2_0"]["attn"]["qkv"]["kernel"] = np.ascontiguousarray(k[::-1])
        rows = diff_encoder(torch_enc, flax_enc, bad, x)
        assert first_divergence(rows, rel_tol=1e-2) == "stage2.0", rows
        # everything upstream of the fault stays clean
        for r in rows:
            if r["module"] == "stage2.0":
                break
            assert r["rel"] < 1e-2, r

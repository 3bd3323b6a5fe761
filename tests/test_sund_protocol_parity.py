"""SUN-D end-to-end protocol parity (VERDICT r3, next-round item 2).

The SUN-D analog of ``test_protocol_parity``: the reference's REAL eval stack
run on torch CPU — its ``CategoriesSampler``, the grid dataloader's
``get_pyramid`` patch pyramid, ``Network.encode``'s patch-pool reshape, SFC
(``get_sfc``), and the per-pair exact-EMD loop (``get_emd_distance`` with
``emd_inference_opencv``/cv2) — against this framework's public SUN-D eval
path (``eval/run_emd.py``'s building blocks) on IDENTICAL episodes and
converter-round-tripped identical weights (reference ``visformer_small_80``
== registered ``visformer_micro_80``).

Legs, and what each isolates:

  R  reference protocol (torch + cv2.EMD)                — the target
  A  ours, full chain, ``solver: 'exact'`` (C++ simplex) — pipeline delta
     only (the on-device patch resize vs PIL is the one remaining source)
  B  ours, full chain, production ``sinkhorn_detached``  — B vs A is the
     Sinkhorn-vs-exact-flow deviation the framework ships by design
  C  ours, ``--cached`` node reuse                        — must equal B
  D  encoder-onward: the torch leg's OWN patch tensors fed through our
     converter+encoder+EMD('exact')                       — bit-level anchor
     (no patch pipeline in the loop); for shot>1 the reference's recorded
     ``torch.randperm`` stream replays through ``sfc_refine(perms=...)``

Measured deltas are printed and recorded in docs/PARITY.md.

Reference: ``meta_tuning_sun_d/eval.py:36-104``,
``Models/models/Network.py:28-141``, ``Models/dataloader/miniimagenet/grid/
mini_imagenet.py:78-148``, ``Models/dataloader/samplers.py``.
"""

import argparse
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import fewshot_vit_tpu.models  # noqa: F401  (registry)
import fewshot_vit_tpu.heads  # noqa: F401

from . import ref_loader

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not ref_loader.available(), reason="reference/torch not available"),
]

WAY = 5
# the SUN-D loaders' test-transform stats (grid/mini_imagenet.py:57-59)
MEAN = np.array([125.3, 123.0, 113.9], np.float32) / 255.0
STD = np.array([63.0, 62.1, 66.7], np.float32) / 255.0
PATCH_LIST = [2, 3]
PATCH_RATIO = 2.0
RAW, IMG = 84, 80  # raw image size -> per-patch model size (transform Resize)


def synthetic_dataset(n_classes=8, n_per_class=10, seed=7):
    """Deliberately HARD clusters (protos within 115-141, noise sigma 130):
    the untrained-encoder protocol lands at ~0.7 mean episode accuracy, so
    per-episode deltas between legs are informative rather than tie-pinned
    at 1.0 (measured sweep: 100-156/110 -> 0.93, 115-141/130 -> 0.71)."""
    rng = np.random.default_rng(seed)
    protos = rng.integers(115, 141, (n_classes, 1, 1, 3)).astype(np.float32)
    labels = np.repeat(np.arange(n_classes), n_per_class)
    noise = rng.normal(0.0, 130.0, (n_classes * n_per_class, RAW, RAW, 3))
    images = np.clip(protos[labels] + noise, 0, 255).astype(np.uint8)
    return images, labels


@pytest.fixture(scope="module")
def sund():
    import torch

    from . import timm_shim, torchvision_shim

    timm_shim.install()
    torchvision_shim.install()
    net_mod = ref_loader.load_sun_d_module("Network")
    samplers = ref_loader.load_sun_d_file("Models/dataloader/samplers.py")
    grid_mod = ref_loader.load_sun_d_file(
        "Models/dataloader/miniimagenet/grid/mini_imagenet.py")
    args = argparse.Namespace(
        backbone="visformer", metric="cosine", norm="center",
        temperature=12.5, solver="opencv", deepemd="grid",
        feature_pyramid=None, num_class=64,
        way=WAY, shot=1, query=3,
        sfc_lr=100.0, sfc_wd=0, sfc_update_step=100, sfc_bs=4,
    )
    torch.manual_seed(0)
    net = net_mod.DeepEMD(args, mode="meta")
    net.eval()

    # the real grid dataset's patching code, free of its csv/file __init__
    tv = __import__("torchvision").transforms
    ds_t = grid_mod.MiniImageNet.__new__(grid_mod.MiniImageNet)
    ds_t.setname = "test"
    ds_t.patch_list = PATCH_LIST
    ds_t.patch_ratio = PATCH_RATIO
    # the test-split transform verbatim (grid/mini_imagenet.py:54-59)
    ds_t.transform = tv.Compose([
        tv.Resize([IMG, IMG]), tv.ToTensor(), tv.Normalize(MEAN, STD)])

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    # get_sfc's `label_shot.type(torch.cuda.LongTensor)` (Network.py:93) on
    # the CPU-only build
    orig_long = getattr(torch.cuda, "LongTensor", None)
    torch.cuda.LongTensor = torch.LongTensor
    yield types.SimpleNamespace(net=net, args=args, samplers=samplers, ds_t=ds_t)
    torch.Tensor.cuda = orig_cuda
    if orig_long is None:
        del torch.cuda.LongTensor
    else:
        torch.cuda.LongTensor = orig_long


def torch_patches(ds_t, images_u8, idx):
    """(n,) indices -> (n, 13, 3, 80, 80) via the REAL ``__getitem__`` patch
    loop (grid/mini_imagenet.py:135-146)."""
    import torch
    from PIL import Image

    out = []
    for i in idx:
        img = Image.fromarray(images_u8[int(i)])
        pl = []
        for num_patch in ds_t.patch_list:
            pl.extend(ds_t.get_pyramid(img, num_patch))
        out.append(torch.stack(pl, dim=0))
    return torch.stack(out)


def ref_episode(net, args, data, shot, query):
    """One episode of the reference eval loop (eval.py:85-99): encoder mode
    on the patch stack, SFC for shot>1, meta forward (cv2 exact EMD inside
    ``get_emd_distance``). Returns (logits (way*query, way), acc)."""
    import torch

    label = torch.arange(WAY).repeat(query)
    with torch.no_grad():
        k = WAY * shot
        net.mode = "encoder"
        feats = net(data)  # (n, C, 13, 1)
        data_shot, data_query = feats[:k], feats[k:]
        net.mode = "meta"
        if shot > 1:
            data_shot = net.get_sfc(data_shot)
        logits = net((data_shot.unsqueeze(0), data_query))
        acc = float((logits.argmax(1) == label).float().mean())
    return logits.numpy(), acc


def converted_head(net, tmp_path, solver):
    """torch Network -> our DeepEMD head through the PRODUCTION .pth path
    (the same converter eval/run_emd.py's ``load:`` uses)."""
    import torch

    from fewshot_vit_tpu.checkpoint.io import load_reference_head_checkpoint
    from fewshot_vit_tpu.core import models

    head = models.make("deepemd", encoder="visformer_micro_80",
                       temperature=12.5, solver=solver)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = head.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))
    variables = jax.tree_util.tree_map(np.asarray, variables)
    pth = str(tmp_path / "sund.pth")
    torch.save({"params": net.state_dict()}, pth)
    return head, load_reference_head_checkpoint(pth, head, variables)


def our_full_chain_accs(head, variables, images, idx_flat, shot, query,
                        sfc_kw=None, cached=False):
    """The eval/run_emd.py building blocks on the same episodes."""
    from fewshot_vit_tpu.eval.emd_eval import (
        group_episode_indices,
        make_emd_cached_episode_fn,
        make_emd_eval_run_fn,
        make_emd_node_cache_fn,
    )
    from fewshot_vit_tpu.train.meta_tune_emd import make_emd_episode_fn, make_patch_fn

    patch_fn = make_patch_fn("grid", PATCH_LIST, 9, PATCH_RATIO, IMG, False)
    labels = jnp.tile(jnp.arange(WAY), query)
    n_episodes = idx_flat.shape[0]
    images_dev = jnp.asarray(images)
    if cached:
        cache = make_emd_node_cache_fn(head, patch_fn, MEAN, STD, batch=32)
        data = cache(variables, images_dev)
        ep_fn = make_emd_cached_episode_fn(head, WAY, shot, sfc=shot > 1,
                                           sfc_kw=sfc_kw)
    else:
        data = images_dev
        ep_fn = make_emd_episode_fn(head, WAY, shot, query, patch_fn,
                                    MEAN, STD, sfc=shot > 1, sfc_kw=sfc_kw)
    run = make_emd_eval_run_fn(ep_fn, labels)
    idx = jnp.asarray(group_episode_indices(idx_flat, 2))
    accs = np.asarray(run(variables, data, idx, jax.random.key(0)))
    return accs[:n_episodes]


def nodes_from_torch_feats(feats):
    """torch encoder features (n, C, 13, 1) -> our node layout (n, 13, C)."""
    return jnp.asarray(feats.squeeze(-1).permute(0, 2, 1).numpy())


class TestSunDProtocolChain:
    def test_1shot_chain(self, sund, tmp_path):
        import torch

        shot, query, n_episodes = 1, 3, 4
        sund.args.shot, sund.args.query = shot, query  # module fixture is shared
        images, labels = synthetic_dataset()

        # identical episode stream for every leg: the REAL reference sampler
        torch.manual_seed(1)
        sampler = sund.samplers.CategoriesSampler(
            labels, n_episodes, WAY, shot + query)
        idx_batches = [b.numpy().astype(np.int32) for b in sampler]

        # --- leg R: reference protocol ---
        logits_R, accs_R = [], []
        for idx in idx_batches:
            data = torch_patches(sund.ds_t, images, idx)
            lo, acc = ref_episode(sund.net, sund.args, data, shot, query)
            logits_R.append(lo)
            accs_R.append(acc)
        accs_R = np.array(accs_R)
        assert 0.2 < accs_R.mean() < 1.0  # non-degenerate protocol

        idx_flat = np.stack(idx_batches)

        # --- leg A/B/C: our full chain ---
        head_ex, vars_ex = converted_head(sund.net, tmp_path, "exact")
        accs_A = our_full_chain_accs(head_ex, vars_ex, images, idx_flat,
                                     shot, query)
        head_sk, vars_sk = converted_head(sund.net, tmp_path, "sinkhorn_detached")
        accs_B = our_full_chain_accs(head_sk, vars_sk, images, idx_flat,
                                     shot, query)
        accs_C = our_full_chain_accs(head_sk, vars_sk, images, idx_flat,
                                     shot, query, cached=True)

        # --- leg D: torch patches -> our encoder+EMD(exact) ---
        logits_D, accs_D = [], []
        for idx in idx_batches:
            x = torch_patches(sund.ds_t, images, idx).numpy()
            x = jnp.asarray(x.transpose(0, 1, 3, 4, 2))  # (n, 13, 80, 80, 3)
            nodes = head_ex.apply(vars_ex, x, False,
                                  method=head_ex.encode_nodes)
            proto = nodes[: WAY * shot].reshape(
                shot, WAY, *nodes.shape[1:]).mean(0)
            lo = np.asarray(head_ex.apply(vars_ex, proto, nodes[WAY * shot:],
                                          method=head_ex.meta))
            logits_D.append(lo)
            accs_D.append(float(
                (lo.argmax(1) == np.tile(np.arange(WAY), query)).mean()))

        d_pipeline = float(np.abs(accs_A - accs_R).mean())
        d_solver = float(np.abs(accs_B - accs_A).mean())
        d_logits = float(max(np.abs(l - r).max()
                             for l, r in zip(logits_D, logits_R)))
        print(f"\nSUN-D 1-shot chain deltas: |acc A-R| (pipeline) = {d_pipeline:.4f}, "
              f"|acc B-A| (sinkhorn vs exact) = {d_solver:.4f}, "
              f"max|logit D-R| = {d_logits:.2e}, "
              f"mean acc R={accs_R.mean():.4f} A={accs_A.mean():.4f} "
              f"B={accs_B.mean():.4f}")

        # D: converter+encoder+pool+exact-EMD is bit-grade (encoder fp noise
        # only; exact objectives match even with degenerate flows).
        # Measured 4.8e-6 (2026-08-19, docs/PARITY.md).
        assert d_logits < 1e-3
        # identical decisions; atol covers f32-vs-f64 episode-mean arithmetic
        np.testing.assert_allclose(np.array(accs_D), accs_R, atol=1e-6)
        # C: cached nodes produce the same episodes as the direct path
        np.testing.assert_allclose(accs_C, accs_B, atol=1e-6)
        # A vs R: the only pipeline difference is on-device patch resize vs
        # PIL; measured delta 0.0000 — identical episode accuracies. The
        # bound allows ~3 query flips across the 4 hard episodes.
        assert d_pipeline <= 0.05, (accs_A, accs_R)
        # B vs A: the designed solver deviation. Measured 0.05 mean |per-
        # episode| (= 3 query flips / 4 episodes at acc quantum 1/15); the
        # bound catches solver breakage, not single-query jitter.
        assert d_solver <= 0.125, (accs_B, accs_A)

        # CI formula parity on the reference's own accs (utils.py:62-72)
        from fewshot_vit_tpu.ops.metric import normal_confidence_interval

        m, pm = normal_confidence_interval(accs_R)
        assert m == pytest.approx(float(np.mean(accs_R)), abs=1e-12)
        assert pm == pytest.approx(
            1.96 * float(np.std(accs_R)) / np.sqrt(len(accs_R)), abs=1e-12)

    def test_5shot_sfc_chain(self, sund, tmp_path):
        import torch

        shot, query, n_episodes = 5, 2, 2
        sund.args.shot, sund.args.query = shot, query
        images, labels = synthetic_dataset()
        torch.manual_seed(2)
        sampler = sund.samplers.CategoriesSampler(
            labels, n_episodes, WAY, shot + query)
        idx_batches = [b.numpy().astype(np.int32) for b in sampler]

        # record get_sfc's randperm stream to replay through sfc_refine
        recorded = []
        orig_randperm = torch.randperm

        def rec(n, *a, **k):
            p = orig_randperm(n, *a, **k)
            recorded.append(p.numpy().copy())
            return p

        logits_R, accs_R, feats_R = [], [], []
        torch.randperm = rec
        try:
            for idx in idx_batches:
                data = torch_patches(sund.ds_t, images, idx)
                lo, acc = ref_episode(sund.net, sund.args, data, shot, query)
                logits_R.append(lo)
                accs_R.append(acc)
                with torch.no_grad():
                    sund.net.mode = "encoder"
                    feats_R.append(sund.net(data))
                    sund.net.mode = "meta"
        finally:
            torch.randperm = orig_randperm
        steps = int(sund.args.sfc_update_step)
        assert len(recorded) == n_episodes * steps
        accs_R = np.array(accs_R)

        head_ex, vars_ex = converted_head(sund.net, tmp_path, "exact")

        # --- leg D with SFC: replay the torch shuffle stream, exact flows ---
        logits_D, accs_D = [], []
        from fewshot_vit_tpu.heads.deepemd import sfc_refine

        for e, idx in enumerate(idx_batches):
            nodes = nodes_from_torch_feats(feats_R[e])
            k = WAY * shot
            proto = nodes[:k].reshape(shot, WAY, *nodes.shape[1:]).mean(0)
            perms = np.stack(recorded[e * steps: (e + 1) * steps])
            proto = sfc_refine(
                proto, nodes[:k], WAY, shot, jax.random.key(0),
                steps=steps, lr=float(sund.args.sfc_lr),
                batch_size=int(sund.args.sfc_bs), perms=perms,
                solver_impl="exact",
            )
            lo = np.asarray(head_ex.apply(vars_ex, proto, nodes[k:],
                                          method=head_ex.meta))
            logits_D.append(lo)
            accs_D.append(float(
                (lo.argmax(1) == np.tile(np.arange(WAY), query)).mean()))

        # --- leg B: production full chain (sinkhorn everywhere, own rng) ---
        head_sk, vars_sk = converted_head(sund.net, tmp_path, "sinkhorn_detached")
        accs_B = our_full_chain_accs(
            head_sk, vars_sk, images, np.stack(idx_batches), shot, query,
            sfc_kw={"steps": steps, "lr": float(sund.args.sfc_lr),
                    "batch_size": int(sund.args.sfc_bs)})

        d_logits = float(max(np.abs(l - r).max()
                             for l, r in zip(logits_D, logits_R)))
        d_full = float(np.abs(accs_B - accs_R).mean())
        print(f"\nSUN-D 5-shot SFC chain: max|logit D-R| (replayed perms, "
              f"exact flows, {steps}-step SFC) = {d_logits:.2e}; "
              f"|acc B-R| (production) = {d_full:.4f}; "
              f"acc R={accs_R.mean():.4f} B={accs_B.mean():.4f}")

        # the SFC trajectory (100 SGD(lr=100, momentum, dampening) steps) is
        # pinned step-for-step: fp accumulation only. Measured 4.8e-6
        # (2026-08-19, docs/PARITY.md).
        assert d_logits < 1e-2
        np.testing.assert_allclose(np.array(accs_D), accs_R, atol=1e-6)
        # production (sinkhorn SFC + sinkhorn eval, own shuffles): measured
        # 0.05 mean |per-episode| on 2 hard episodes (one query flip each)
        assert d_full <= 0.15, (accs_B, accs_R)

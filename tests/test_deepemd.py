"""DeepEMD head: component parity vs the reference torch math + SFC behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.core import models
import fewshot_vit_tpu.models  # noqa: F401
import fewshot_vit_tpu.heads  # noqa: F401
from fewshot_vit_tpu.heads.deepemd import (
    DeepEMD,
    center_normalize,
    emd_logits,
    sfc_refine,
    similarity_map,
    weight_vector,
)
from fewshot_vit_tpu.data.patches import grid_patches, sampling_patches
from fewshot_vit_tpu.ops.emd import normalize_weights

from . import ref_loader
from .test_heads_eval import TinyEncoder


def node_feats(seed, m, n, c):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(m, n, c)).astype(np.float32)


@pytest.mark.slow
@pytest.mark.skipif(not ref_loader.available(), reason="reference/torch not available")
class TestTorchMathParity:
    @pytest.fixture(scope="class")
    def ref_net(self):
        import argparse
        import torch
        from . import timm_shim

        timm_shim.install()
        net_mod = ref_loader.load_sun_d_module("Network")
        args = argparse.Namespace(
            backbone="visformer", metric="cosine", norm="center",
            temperature=12.5, solver="opencv", form="L2", l2_strength=1e-6,
            deepemd="fcn", feature_pyramid=None, num_class=64,
        )
        torch.manual_seed(0)
        return net_mod.DeepEMD(args, mode="meta")

    def test_weight_vector(self, ref_net):
        import torch

        # torch layout (M, C, H, W); ours node-major (M, N, C)
        a = np.random.default_rng(0).normal(size=(4, 16, 5, 5)).astype(np.float32)
        b = np.random.default_rng(1).normal(size=(3, 16, 5, 5)).astype(np.float32)
        with torch.no_grad():
            want = ref_net.get_weight_vector(torch.from_numpy(a), torch.from_numpy(b))
        got = weight_vector(
            jnp.asarray(a.reshape(4, 16, 25).transpose(0, 2, 1)),
            jnp.asarray(b.reshape(3, 16, 25).transpose(0, 2, 1)),
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)

    def test_similarity_map(self, ref_net):
        import torch

        p = np.random.default_rng(2).normal(size=(3, 16, 5, 5)).astype(np.float32)
        q = np.random.default_rng(3).normal(size=(4, 16, 5, 5)).astype(np.float32)
        with torch.no_grad():
            pn = ref_net.normalize_feature(torch.from_numpy(p))
            qn = ref_net.normalize_feature(torch.from_numpy(q))
            want = ref_net.get_similiarity_map(pn, qn)
        p_nodes = center_normalize(jnp.asarray(p.reshape(3, 16, 25).transpose(0, 2, 1)))
        q_nodes = center_normalize(jnp.asarray(q.reshape(4, 16, 25).transpose(0, 2, 1)))
        got = similarity_map(p_nodes, q_nodes)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)

    def test_logits_with_exact_flows_match_cv2_pipeline(self, ref_net):
        """End-to-end DeepEMD logits: our weights/similarity + the exact C++
        solver vs a faithful CPU re-run of the reference's cv2 loop
        (Network.py:114-124)."""
        import cv2
        import torch

        from fewshot_vit_tpu.native.emd import emd_exact

        p = np.random.default_rng(4).normal(size=(3, 16, 5, 5)).astype(np.float32)
        q = np.random.default_rng(5).normal(size=(4, 16, 5, 5)).astype(np.float32)

        # --- reference pipeline on CPU (replicating Network.py semantics) ---
        with torch.no_grad():
            tp, tq = torch.from_numpy(p), torch.from_numpy(q)
            w1 = ref_net.get_weight_vector(tq, tp)  # (Q, way, N)
            w2 = ref_net.get_weight_vector(tp, tq)  # (way, Q, N)
            pn = ref_net.normalize_feature(tp)
            qn = ref_net.normalize_feature(tq)
            sim = ref_net.get_similiarity_map(pn, qn).numpy()  # (Q, way, N, N)
        want = np.zeros((4, 3))
        for i in range(4):
            for j in range(3):
                ww1 = np.maximum(w1[i, j].numpy(), 0) + 1e-5
                ww2 = np.maximum(w2[j, i].numpy(), 0) + 1e-5
                ww1 = (ww1 * len(ww1) / ww1.sum()).astype(np.float32).reshape(-1, 1)
                ww2 = (ww2 * len(ww2) / ww2.sum()).astype(np.float32).reshape(-1, 1)
                _, _, flow = cv2.EMD(ww1, ww2, cv2.DIST_USER,
                                     (1 - sim[i, j]).astype(np.float32))
                want[i, j] = (sim[i, j] * flow).sum() * (12.5 / 25)

        # --- ours, with exact flows substituted for sinkhorn ---
        p_nodes = jnp.asarray(p.reshape(3, 16, 25).transpose(0, 2, 1))
        q_nodes = jnp.asarray(q.reshape(4, 16, 25).transpose(0, 2, 1))
        wq = normalize_weights(weight_vector(q_nodes, p_nodes))
        wp = normalize_weights(jnp.swapaxes(weight_vector(p_nodes, q_nodes), 0, 1))
        sim_j = similarity_map(center_normalize(p_nodes), center_normalize(q_nodes))
        flows, _ = emd_exact(
            np.asarray(1 - sim_j).reshape(12, 25, 25),
            np.asarray(wq).reshape(12, 25),
            np.asarray(wp).reshape(12, 25),
        )
        got = (np.asarray(sim_j) * flows.reshape(4, 3, 25, 25)).sum((-1, -2)) * (12.5 / 25)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_pyramid_nodes_match_build_feature_pyramid(self, ref_net):
        """pyramid_nodes == F.adaptive_avg_pool2d levels + raw map, in the
        reference's order (Network.py:194-204) — incl. the non-divisible
        5x5 -> 2x2 binning."""
        import torch

        from fewshot_vit_tpu.heads.deepemd import pyramid_nodes

        x = np.random.default_rng(6).normal(size=(3, 16, 5, 5)).astype(np.float32)
        ref_net.args.feature_pyramid = [2, 1]
        try:
            with torch.no_grad():
                want = ref_net.build_feature_pyramid(torch.from_numpy(x))
        finally:
            ref_net.args.feature_pyramid = None
        # torch (B, C, 1, N) -> (B, N, C)
        want = want.numpy().squeeze(2).transpose(0, 2, 1)
        got = pyramid_nodes(
            jnp.asarray(x.transpose(0, 2, 3, 1)), [2, 1]
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_pyramid_logits_match_cv2_pipeline(self, ref_net):
        """End-to-end DeepEMD logits WITH feature_pyramid=[2,1] (30 nodes):
        our pyramid nodes + weights/similarity + exact flows vs a faithful
        CPU re-run of the reference pipeline."""
        import cv2
        import torch

        from fewshot_vit_tpu.heads.deepemd import pyramid_nodes
        from fewshot_vit_tpu.native.emd import emd_exact

        p = np.random.default_rng(14).normal(size=(3, 16, 5, 5)).astype(np.float32)
        q = np.random.default_rng(15).normal(size=(4, 16, 5, 5)).astype(np.float32)

        # reference: build_feature_pyramid -> (B, C, 1, 30) node maps
        ref_net.args.feature_pyramid = [2, 1]
        try:
            with torch.no_grad():
                tp = ref_net.build_feature_pyramid(torch.from_numpy(p))
                tq = ref_net.build_feature_pyramid(torch.from_numpy(q))
                w1 = ref_net.get_weight_vector(tq, tp)  # (Q, way, 30)
                w2 = ref_net.get_weight_vector(tp, tq)
                sim = ref_net.get_similiarity_map(
                    ref_net.normalize_feature(tp), ref_net.normalize_feature(tq)
                ).numpy()  # (Q, way, 30, 30)
        finally:
            ref_net.args.feature_pyramid = None
        n = sim.shape[-1]
        want = np.zeros((4, 3))
        for i in range(4):
            for j in range(3):
                ww1 = np.maximum(w1[i, j].numpy(), 0) + 1e-5
                ww2 = np.maximum(w2[j, i].numpy(), 0) + 1e-5
                ww1 = (ww1 * len(ww1) / ww1.sum()).astype(np.float32).reshape(-1, 1)
                ww2 = (ww2 * len(ww2) / ww2.sum()).astype(np.float32).reshape(-1, 1)
                _, _, flow = cv2.EMD(ww1, ww2, cv2.DIST_USER,
                                     (1 - sim[i, j]).astype(np.float32))
                want[i, j] = (sim[i, j] * flow).sum() * (12.5 / n)

        p_nodes = pyramid_nodes(jnp.asarray(p.transpose(0, 2, 3, 1)), [2, 1])
        q_nodes = pyramid_nodes(jnp.asarray(q.transpose(0, 2, 3, 1)), [2, 1])
        assert p_nodes.shape == (3, 30, 16)
        wq = normalize_weights(weight_vector(q_nodes, p_nodes))
        wp = normalize_weights(jnp.swapaxes(weight_vector(p_nodes, q_nodes), 0, 1))
        sim_j = similarity_map(center_normalize(p_nodes), center_normalize(q_nodes))
        flows, _ = emd_exact(
            np.asarray(1 - sim_j).reshape(12, n, n),
            np.asarray(wq).reshape(12, n),
            np.asarray(wp).reshape(12, n),
        )
        got = (np.asarray(sim_j) * flows.reshape(4, 3, n, n)).sum((-1, -2)) * (12.5 / n)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestHeadAndSFC:
    def test_sinkhorn_logits_shapes_and_ranking(self):
        # class-structured nodes: queries should match their own prototype
        rng = np.random.default_rng(7)
        protos = rng.normal(size=(5, 25, 32)).astype(np.float32)
        queries = (np.repeat(protos, 3, axis=0)
                   + 0.1 * rng.normal(size=(15, 25, 32))).astype(np.float32)
        logits = emd_logits(jnp.asarray(protos), jnp.asarray(queries))
        assert logits.shape == (15, 5)
        pred = np.asarray(logits).argmax(-1)
        assert (pred == np.repeat(np.arange(5), 3)).mean() > 0.9

    def test_episode_batched(self):
        rng = np.random.default_rng(8)
        protos = jnp.asarray(rng.normal(size=(2, 5, 9, 8)), jnp.float32)
        queries = jnp.asarray(rng.normal(size=(2, 7, 9, 8)), jnp.float32)
        logits = emd_logits(protos, queries)
        assert logits.shape == (2, 7, 5)

    def test_sfc_improves_support_fit(self):
        rng = np.random.default_rng(9)
        way, shot = 4, 3
        base = rng.normal(size=(way, 9, 16)).astype(np.float32)
        support = (np.repeat(base[None], shot, 0).reshape(way * shot, 9, 16)
                   + 0.4 * rng.normal(size=(way * shot, 9, 16))).astype(np.float32)
        # class-major order as the reference: label = arange(way).repeat(shot)
        support_cm = support.reshape(shot, way, 9, 16).transpose(1, 0, 2, 3)
        support_flat = support_cm.transpose(1, 0, 2, 3).reshape(way * shot, 9, 16)
        proto0 = jnp.asarray(support_cm.mean(1))

        def support_acc(proto):
            logits = emd_logits(proto, jnp.asarray(support_flat))
            labels = np.tile(np.arange(way), shot)
            return float((np.asarray(logits).argmax(-1) == labels).mean())

        refined = sfc_refine(
            proto0, jnp.asarray(support_flat), way, shot,
            jax.random.key(0), steps=20, lr=0.5, batch_size=4,
        )
        assert refined.shape == proto0.shape
        assert support_acc(refined) >= support_acc(proto0)

    def test_sfc_momentum_matches_torch_sgd_rule(self):
        """torch.optim.SGD(momentum=.9, dampening=.9) semantics, exactly:
        the FIRST step's buffer is the raw gradient (buf = clone(grad) on
        init, no dampening), later steps do buf = m*buf + (1-d)*g and
        p -= lr*buf (torch/optim/sgd.py). Full-batch steps so the shuffle is
        irrelevant; grads recomputed independently with jax.grad."""
        rng = np.random.default_rng(10)
        way, shot, lr = 3, 2, 0.2
        support = jnp.asarray(rng.normal(size=(way * shot, 5, 8)), jnp.float32)
        proto0 = jnp.asarray(rng.normal(size=(way, 5, 8)), jnp.float32)
        labels = np.tile(np.arange(way), shot)

        def loss(p):
            logits = emd_logits(p, support)
            return -jax.nn.log_softmax(logits, -1)[
                np.arange(way * shot), labels].mean()

        g = jax.grad(loss)
        # manual torch recurrence, 3 full-batch steps
        p, buf = proto0, None
        for _ in range(3):
            gi = g(p)
            buf = gi if buf is None else 0.9 * buf + 0.1 * gi
            p = p - lr * buf
        got = sfc_refine(proto0, support, way, shot, jax.random.key(3),
                         steps=3, lr=lr, batch_size=way * shot)
        np.testing.assert_allclose(np.asarray(got), np.asarray(p),
                                   rtol=2e-5, atol=2e-6)

    def test_pyramid_divisible_grid_is_reshape_mean(self):
        """Adaptive avg-pool on a divisible grid == plain reshape-mean (the
        integer-grid special case called out in VERDICT r2 #2)."""
        from fewshot_vit_tpu.heads.deepemd import pyramid_nodes

        x = np.random.default_rng(12).normal(size=(2, 4, 4, 8)).astype(np.float32)
        got = np.asarray(pyramid_nodes(jnp.asarray(x), [2, 1]))
        want2 = x.reshape(2, 2, 2, 2, 2, 8).mean((2, 4)).reshape(2, 4, 8)
        want1 = x.mean((1, 2), keepdims=False).reshape(2, 1, 8)
        np.testing.assert_allclose(got[:, :4], want2, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got[:, 4:5], want1, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got[:, 5:], x.reshape(2, 16, 8), rtol=1e-6)

    def test_encode_nodes_pyramid_shape(self):
        head = DeepEMD(encoder=TinyEncoder(), feature_pyramid=(2, 1))
        v = head.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        nodes = head.apply(v, jnp.zeros((3, 16, 16, 3)), method=head.encode_nodes)
        # 2x2 dense map -> levels 4 + 1, then the raw 4 nodes last
        assert nodes.shape == (3, 9, 16)

    def test_encode_nodes_patches(self):
        head = DeepEMD(encoder=TinyEncoder())
        x5 = jnp.zeros((3, 4, 16, 16, 3))
        v = head.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        nodes = head.apply(v, x5, method=head.encode_nodes)
        assert nodes.shape == (3, 4, 16)
        dense_nodes = head.apply(v, jnp.zeros((3, 16, 16, 3)), method=head.encode_nodes)
        assert dense_nodes.shape == (3, 4, 16)  # 2x2 dense map -> 4 nodes


class TestSolverNaming:
    def test_legacy_opencv_alias_warns_and_resolves(self):
        with pytest.warns(UserWarning, match="legacy alias"):
            head = models.make("deepemd", encoder="convnet4", solver="opencv")
        assert head.solver == "sinkhorn_detached"

    def test_legacy_qpth_alias_warns_and_resolves(self):
        with pytest.warns(UserWarning, match="legacy alias"):
            head = models.make("deepemd", encoder="convnet4", solver="qpth")
        assert head.solver == "sinkhorn_unrolled"

    def test_unknown_solver_rejected(self):
        with pytest.raises(ValueError, match="unknown solver"):
            models.make("deepemd", encoder="convnet4", solver="simplex")


class TestPatchPipelines:
    def test_grid_geometry(self):
        x = jnp.asarray(np.random.default_rng(0).integers(0, 255, (2, 80, 80, 3)), jnp.uint8)
        out = grid_patches(x, patch_list=(2, 3), ratio=2.0, out_size=80)
        assert out.shape == (2, 13, 80, 80, 3)
        # ratio=1, g=1 reproduces a (resized) full image
        full = grid_patches(x, patch_list=(1,), ratio=1.0, out_size=80)
        np.testing.assert_allclose(
            np.asarray(full[:, 0]), np.asarray(x, np.float32), atol=1e-3
        )

    def test_grid_traced_ratio(self):
        x = jnp.zeros((1, 80, 80, 3), jnp.uint8)
        fn = jax.jit(lambda im, r: grid_patches(im, (2, 3), r, 80))
        out = fn(x, jnp.asarray(1.7))
        assert out.shape == (1, 13, 80, 80, 3)

    def test_grid_per_image_per_level_ratio(self):
        """Train-mode grid: each image and each pyramid level gets its OWN
        U[1,3) ratio (reference get_pyramid draws per __getitem__ per level).
        Two identical images in a batch must come out geometrically
        different, and so must the two levels of one image."""
        from fewshot_vit_tpu.train.meta_tune_emd import make_patch_fn

        img = np.random.default_rng(3).integers(0, 255, (80, 80, 3))
        batch = jnp.asarray(np.stack([img, img]), jnp.uint8)  # identical pair
        fn = make_patch_fn("grid", [2, 3], 9, 2.0, 80, train=True)
        out = np.asarray(fn(batch, jax.random.key(0)))
        assert out.shape == (2, 13, 80, 80, 3)
        # identical inputs, different per-image ratios -> different patches
        assert np.abs(out[0] - out[1]).max() > 1.0
        # explicit per-image, per-level ratios steer geometry independently
        r = jnp.asarray([[1.0, 2.5], [2.5, 1.0]])
        out2 = np.asarray(grid_patches(batch, (2, 3), r, 80))
        base1 = np.asarray(grid_patches(batch[:1], (2, 3), 1.0, 80))[0]
        base25 = np.asarray(grid_patches(batch[:1], (2, 3), 2.5, 80))[0]
        np.testing.assert_allclose(out2[0, :4], base1[:4], atol=1e-3)   # lvl0 r=1
        np.testing.assert_allclose(out2[0, 4:], base25[4:], atol=1e-3)  # lvl1 r=2.5
        np.testing.assert_allclose(out2[1, :4], base25[:4], atol=1e-3)
        np.testing.assert_allclose(out2[1, 4:], base1[4:], atol=1e-3)

    def test_grid_train_ratio_distribution_matches_reference(self):
        """draw_grid_ratios stats match the reference's 1+2*random.random():
        iid U[1,3) per (image, level)."""
        from fewshot_vit_tpu.data.patches import draw_grid_ratios

        r = np.asarray(draw_grid_ratios(jax.random.key(1), 4000, 2))
        assert r.shape == (4000, 2)
        assert 1.0 <= r.min() and r.max() < 3.0
        assert abs(r.mean() - 2.0) < 0.03            # U[1,3) mean
        assert abs(r.var() - (4.0 / 12.0)) < 0.02    # U[1,3) var = 1/3
        # independence across images and levels: correlations ~ 0
        assert abs(np.corrcoef(r[:, 0], r[:, 1])[0, 1]) < 0.05
        assert abs(np.corrcoef(r[:-1, 0], r[1:, 0])[0, 1]) < 0.05

    def test_sampling(self):
        x = jnp.zeros((2, 80, 80, 3), jnp.uint8)
        out = sampling_patches(jax.random.key(0), x, num_patch=9)
        assert out.shape == (2, 9, 80, 80, 3)


class TestDifferentiableFlows:
    def test_qpth_mode_passes_gradients_through_flows(self):
        rng = np.random.default_rng(11)
        protos = jnp.asarray(rng.normal(size=(3, 9, 8)), jnp.float32)
        queries = jnp.asarray(rng.normal(size=(4, 9, 8)), jnp.float32)

        def loss(p, diff):
            lg = emd_logits(p, queries, solver_iters=20, differentiable=diff)
            return jnp.sum(lg[:, 0])

        g_stop = jax.grad(lambda p: loss(p, False))(protos)
        g_diff = jax.grad(lambda p: loss(p, True))(protos)
        # both finite; the differentiable path adds the flow-gradient term
        assert np.isfinite(np.asarray(g_stop)).all()
        assert np.isfinite(np.asarray(g_diff)).all()
        assert float(jnp.abs(g_stop - g_diff).max()) > 1e-6


class TestCachedEval:
    @pytest.mark.parametrize("mode,shot", [("fcn", 1), ("grid", 2)])
    def test_cached_episode_logits_match_direct(self, mode, shot):
        """--cached eval (encode each image's nodes once, gather per episode)
        must produce the SAME logits as the protocol-faithful re-encode path:
        eval patches are a deterministic function of the image for grid/fcn,
        and the SFC rng split is mirrored."""
        from fewshot_vit_tpu.eval.run_emd import (
            make_emd_cached_episode_fn,
            make_emd_node_cache_fn,
        )
        from fewshot_vit_tpu.train.meta_tune_emd import (
            make_emd_episode_fn, make_patch_fn,
        )

        way, query = 3, 4
        head = DeepEMD(encoder=TinyEncoder(), solver_iters=10)
        variables = head.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        patch_fn = make_patch_fn(mode, [2], 4, 2.0, 16, train=False)
        mean = std = (0.5, 0.5, 0.5)
        sfc_kw = {"steps": 3, "lr": 0.1, "batch_size": 4}

        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.integers(0, 256, (40, 16, 16, 3)).astype(np.uint8))
        idx = jnp.asarray(
            rng.permutation(40)[: way * (shot + query)].astype(np.int32))

        direct = make_emd_episode_fn(head, way, shot, query, patch_fn, mean, std,
                                     sfc=shot > 1, sfc_kw=sfc_kw)
        want = np.asarray(direct(variables, images[idx], jax.random.key(3)))

        nodes = make_emd_node_cache_fn(head, patch_fn, mean, std, batch=16)(
            variables, images)
        cached = make_emd_cached_episode_fn(head, way, shot, sfc=shot > 1,
                                            sfc_kw=sfc_kw)
        got = np.asarray(cached(variables, nodes[idx], jax.random.key(3)))
        # slack: the cache encodes in different batch groupings (XLA float
        # reassociation), not a semantic difference
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


class TestEvalEpisodeBatching:
    def test_ep_per_batch_grouping_invariant(self):
        """--ep-per-batch groups episodes into vmapped chunks; the per-episode
        rng folds by GLOBAL episode index, so accuracies must match the
        epb=1 scan for any grouping (incl. a padded final batch)."""
        from fewshot_vit_tpu.eval.run_emd import make_emd_eval_run_fn
        from fewshot_vit_tpu.train.meta_tune_emd import (
            make_emd_episode_fn, make_patch_fn,
        )

        way, shot, query = 3, 1, 4
        head = DeepEMD(encoder=TinyEncoder(), solver_iters=10)
        variables = head.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        patch_fn = make_patch_fn("fcn", [2], 4, 2.0, 16, train=False)
        ep_fn = make_emd_episode_fn(head, way, shot, query, patch_fn,
                                    (0.5,) * 3, (0.5,) * 3, sfc=False)
        labels = jnp.tile(jnp.arange(way), query)
        run = make_emd_eval_run_fn(ep_fn, labels)

        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.integers(0, 256, (30, 16, 16, 3)).astype(np.uint8))
        ep_len = way * (shot + query)
        n_episodes = 6
        idx = np.stack([rng.permutation(30)[:ep_len] for _ in range(n_episodes)]
                       ).astype(np.int32)
        key = jax.random.key(7)

        base = np.asarray(run(variables, images,
                              jnp.asarray(idx.reshape(n_episodes, 1, ep_len)), key))
        # epb=4 with padding (6 -> 8 episodes, repeat last)
        idx_p = np.concatenate([idx, np.repeat(idx[-1:], 2, axis=0)])
        got = np.asarray(run(variables, images,
                             jnp.asarray(idx_p.reshape(2, 4, ep_len)), key))[:n_episodes]
        np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-5)


class TestMeshEmdEval:
    def test_mesh_data_accs_match_single_device(self, devices8):
        """--mesh-data episode parallelism (variables/data replicated, the
        in-batch episode axis sharded) must reproduce single-device accs —
        the SUN-D analogue of the SUN-M mesh-eval equality test."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fewshot_vit_tpu.eval.emd_eval import make_emd_eval_run_fn
        from fewshot_vit_tpu.parallel import make_mesh
        from fewshot_vit_tpu.train.meta_tune_emd import (
            make_emd_episode_fn, make_patch_fn,
        )

        way, shot, query = 3, 1, 4
        head = DeepEMD(encoder=TinyEncoder(), solver_iters=10)
        variables = head.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        patch_fn = make_patch_fn("fcn", [2], 4, 2.0, 16, train=False)
        ep_fn = make_emd_episode_fn(head, way, shot, query, patch_fn,
                                    (0.5,) * 3, (0.5,) * 3, sfc=False)
        labels = jnp.tile(jnp.arange(way), query)
        run = make_emd_eval_run_fn(ep_fn, labels)

        rng = np.random.default_rng(3)
        images = jnp.asarray(rng.integers(0, 256, (40, 16, 16, 3)).astype(np.uint8))
        ep_len = way * (shot + query)
        idx = np.stack([rng.permutation(40)[:ep_len] for _ in range(16)]
                       ).astype(np.int32).reshape(2, 8, ep_len)
        key = jax.random.key(11)

        base = np.asarray(run(variables, images, jnp.asarray(idx), key))

        mesh = make_mesh({"data": 8})
        v_m = jax.device_put(variables, NamedSharding(mesh, P()))
        im_m = jax.device_put(images, NamedSharding(mesh, P()))
        idx_m = jax.device_put(jnp.asarray(idx),
                               NamedSharding(mesh, P(None, "data", None)))
        got = np.asarray(run(v_m, im_m, idx_m, key))
        np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-5)


class TestTaskBatching:
    def test_grad_accum_equals_vmap(self):
        """`grad_accum: true` (sequential scan, reference accumulation
        semantics, 1-episode memory) must match the vmapped task batch:
        same loss/acc and the same params after the update."""
        import optax

        from fewshot_vit_tpu.train.meta_tune_emd import (
            make_emd_episode_fn, make_emd_epoch_fn, make_patch_fn,
        )
        from fewshot_vit_tpu.train.state import TrainState
        from .test_heads_eval import TinyEncoder
        from fewshot_vit_tpu.heads.deepemd import DeepEMD

        way, shot, query, epb = 3, 1, 4, 3
        head = DeepEMD(encoder=TinyEncoder(), solver_iters=10)
        variables = head.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tx = optax.sgd(1e-2, momentum=0.9)
        patch_fn = make_patch_fn("fcn", [2], 4, 2.0, 16, False)
        episode_fn = make_emd_episode_fn(head, way, shot, query, patch_fn,
                                         (0.5, 0.5, 0.5), (0.5, 0.5, 0.5),
                                         sfc=False)
        labels = jnp.tile(jnp.arange(way), query)
        rng = np.random.default_rng(0)
        n_img = 60
        images = jnp.asarray(rng.integers(0, 256, (n_img, 16, 16, 3)).astype(np.uint8))
        idx = jnp.asarray(
            rng.integers(0, n_img, (2, epb, way * (shot + query))).astype(np.int32))

        out = {}
        for accum in (False, True):
            # fresh copies: the epoch program donates the state buffers
            state = TrainState.create(
                jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables), tx)
            ep = make_emd_epoch_fn(episode_fn, tx, labels, epb, grad_accum=accum)
            state, ms = ep(state, images, idx, jax.random.key(1))
            out[accum] = (np.asarray(ms["loss"]), np.asarray(ms["acc"]),
                          jax.tree_util.tree_leaves(state.params))
        np.testing.assert_allclose(out[False][0], out[True][0], rtol=1e-5)
        np.testing.assert_allclose(out[False][1], out[True][1], rtol=1e-6)
        for a, b in zip(out[False][2], out[True][2]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_nan_episode_rule_matches_reference_both_modes(self):
        """``detect_grad_nan`` (Models/utils.py:115-118) runs on the
        ACCUMULATED buffer after every episode (train_meta.py:174): a NaN
        episode wipes all PRIOR episodes' contributions to that tensor, and
        later episodes' survive — the final gradient is the suffix after the
        LAST NaN episode. All three task-batch modes must implement exactly
        that: grad_accum (the literal recurrence), vmapped (closed-form
        reversed-cumsum mask), and mesh episode-parallel (shard_map: local
        grads + all-gathered NaN bitmap + psum of the masked sums)."""
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fewshot_vit_tpu.parallel import make_mesh
        from fewshot_vit_tpu.train.meta_tune_emd import make_emd_epoch_fn
        from fewshot_vit_tpu.train.state import TrainState

        mesh = (make_mesh({"data": 4}, jax.devices()[:4])
                if len(jax.devices()) >= 4 else None)

        way, query, epb = 2, 2, 4
        labels = jnp.tile(jnp.arange(way), query)
        base = jnp.tile(jnp.arange(way, dtype=jnp.float32)[None],
                        (way * query, 1))

        def episode_fn(variables, imgs, key):
            # marker pixel 255 -> this episode's logits (hence grads) go NaN
            p = variables["params"]["w"]
            marker = imgs[0, 0, 0, 0].astype(jnp.float32)
            bad = jnp.where(marker == 255.0, jnp.nan, 1.0)
            return p * bad * base

        images = np.zeros((2, 4, 4, 3), np.uint8)
        images[0] = 255  # image 0 = NaN marker, image 1 = clean
        images = jnp.asarray(images)
        lr = 0.5
        ep_len = way * (1 + query)

        def f(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                (p * base).astype(jnp.float32), labels).mean()

        g1 = float(jax.grad(f)(jnp.float32(1.0)))  # one clean episode's grad
        assert g1 != 0.0

        # (NaN episode indices, surviving suffix length)
        for nan_eps, n_keep in [((), 4), ((1,), 2), ((3,), 0), ((0, 2), 1)]:
            rows = [[0 if e in nan_eps else 1] * ep_len for e in range(epb)]
            idx = jnp.asarray(np.asarray(rows, np.int32)[None])  # (1, E, L)
            modes = [("vmapped", False, None), ("accum", True, None)]
            if mesh is not None:
                modes.append(("mesh", False, mesh))
            for mode, accum, m in modes:
                tx = optax.sgd(lr)
                state = TrainState.create({"params": {"w": jnp.float32(1.0)}}, tx)
                ep = make_emd_epoch_fn(episode_fn, tx, labels, epb,
                                       grad_accum=accum, mesh=m)
                imgs_m, idx_m = images, idx
                if m is not None:
                    state = jax.device_put(state, NamedSharding(m, P()))
                    imgs_m = jax.device_put(images, NamedSharding(m, P()))
                    idx_m = jax.device_put(idx,
                                           NamedSharding(m, P(None, "data", None)))
                state, _ = ep(state, imgs_m, idx_m, jax.random.key(0))
                want = 1.0 - lr * (n_keep * g1 / epb)
                got = float(state.params["w"])
                assert got == pytest.approx(want, rel=1e-5, abs=1e-7), (
                    nan_eps, mode, got, want)

    def test_remat_identical_losses_and_params(self):
        """`remat: true` (jax.checkpoint around the encoder, the HBM lever
        that lets a VMAPPED task batch fit) must be a pure memory/FLOPs trade:
        bit-identical losses and updated params vs the plain episode fn."""
        import optax

        from fewshot_vit_tpu.train.meta_tune_emd import (
            make_emd_episode_fn, make_emd_epoch_fn, make_patch_fn,
        )
        from fewshot_vit_tpu.train.state import TrainState
        from .test_heads_eval import TinyEncoder
        from fewshot_vit_tpu.heads.deepemd import DeepEMD

        way, shot, query, epb = 3, 1, 4, 2
        head = DeepEMD(encoder=TinyEncoder(), solver_iters=10)
        variables = head.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tx = optax.sgd(1e-2, momentum=0.9)
        patch_fn = make_patch_fn("grid", [2], 4, 2.0, 16, True)
        labels = jnp.tile(jnp.arange(way), query)
        rng = np.random.default_rng(2)
        n_img = 60
        images = jnp.asarray(rng.integers(0, 256, (n_img, 16, 16, 3)).astype(np.uint8))
        idx = jnp.asarray(
            rng.integers(0, n_img, (2, epb, way * (shot + query))).astype(np.int32))

        out = {}
        for remat in (False, True):
            episode_fn = make_emd_episode_fn(
                head, way, shot, query, patch_fn, (0.5,) * 3, (0.5,) * 3,
                sfc=False, train=True, remat=remat)
            state = TrainState.create(
                jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables), tx)
            ep = make_emd_epoch_fn(episode_fn, tx, labels, epb, grad_accum=False)
            state, ms = ep(state, images, idx, jax.random.key(1))
            out[remat] = (np.asarray(ms["loss"]),
                          jax.tree_util.tree_leaves(state.params))
        np.testing.assert_array_equal(out[False][0], out[True][0])
        for a, b in zip(out[False][1], out[True][1]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestMeshEmdTrain:
    def test_mesh_episode_parallel_epoch_matches_single_device(self, devices8):
        """`mesh:` in phase 3b (train/meta_tune_emd.py): the task batch's
        episode axis shards over `data` (the reference's DataParallel
        scatter-episodes pattern, train_meta.py:82,159) and must reproduce the
        single-device epoch exactly — same loss/acc stream and same params
        after the updates."""
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fewshot_vit_tpu.parallel import make_mesh
        from fewshot_vit_tpu.train.meta_tune_emd import (
            make_emd_episode_fn, make_emd_epoch_fn, make_patch_fn,
        )
        from fewshot_vit_tpu.train.state import TrainState

        way, shot, query, epb = 3, 1, 4, 8
        head = DeepEMD(encoder=TinyEncoder(), solver_iters=10)
        variables = head.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tx = optax.sgd(1e-2, momentum=0.9)
        patch_fn = make_patch_fn("fcn", [2], 4, 2.0, 16, train=True)
        episode_fn = make_emd_episode_fn(head, way, shot, query, patch_fn,
                                         (0.5,) * 3, (0.5,) * 3, sfc=False)
        labels = jnp.tile(jnp.arange(way), query)
        rng = np.random.default_rng(0)
        n_img = 60
        images = np.asarray(
            rng.integers(0, 256, (n_img, 16, 16, 3)).astype(np.uint8))
        idx = np.asarray(
            rng.integers(0, n_img, (2, epb, way * (shot + query))).astype(np.int32))

        def run(shard):
            vs = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables)
            mesh = None
            if shard:
                mesh = make_mesh({"data": 8})
                vs = jax.device_put(vs, NamedSharding(mesh, P()))
                im = jax.device_put(jnp.asarray(images), NamedSharding(mesh, P()))
                ix = jax.device_put(jnp.asarray(idx),
                                    NamedSharding(mesh, P(None, "data", None)))
            else:
                im, ix = jnp.asarray(images), jnp.asarray(idx)
            state = TrainState.create(vs, tx)
            ep = make_emd_epoch_fn(episode_fn, tx, labels, epb,
                                   grad_accum=False, mesh=mesh)
            state, ms = ep(state, im, ix, jax.random.key(1))
            return (np.asarray(ms["loss"]), np.asarray(ms["acc"]),
                    jax.tree_util.tree_leaves(jax.device_get(state.params)))

        base, meshed = run(False), run(True)
        np.testing.assert_allclose(meshed[0], base[0], rtol=1e-5)
        np.testing.assert_allclose(meshed[1], base[1], rtol=1e-6)
        for a, b in zip(base[2], meshed[2]):
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)

    def test_mesh_composes_with_remat(self, devices8):
        """`mesh:` + `remat: true` is the intended big-model configuration
        (episode-sharded vmap whose per-chip activations are rematerialized):
        one sharded step must run and match the unsharded remat epoch."""
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fewshot_vit_tpu.parallel import make_mesh
        from fewshot_vit_tpu.train.meta_tune_emd import (
            make_emd_episode_fn, make_emd_epoch_fn, make_patch_fn,
        )
        from fewshot_vit_tpu.train.state import TrainState

        way, shot, query, epb = 2, 1, 3, 8
        head = DeepEMD(encoder=TinyEncoder(), solver_iters=8)
        variables = head.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tx = optax.sgd(1e-2, momentum=0.9)
        patch_fn = make_patch_fn("grid", [2], 4, 2.0, 16, train=True)
        episode_fn = make_emd_episode_fn(head, way, shot, query, patch_fn,
                                         (0.5,) * 3, (0.5,) * 3, sfc=False,
                                         train=True, remat=True)
        labels = jnp.tile(jnp.arange(way), query)
        rng = np.random.default_rng(3)
        images = np.asarray(rng.integers(0, 256, (40, 16, 16, 3)).astype(np.uint8))
        idx = np.asarray(
            rng.integers(0, 40, (1, epb, way * (shot + query))).astype(np.int32))

        def run(shard):
            vs = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables)
            im, ix = jnp.asarray(images), jnp.asarray(idx)
            mesh = None
            if shard:
                mesh = make_mesh({"data": 8})
                vs = jax.device_put(vs, NamedSharding(mesh, P()))
                im = jax.device_put(im, NamedSharding(mesh, P()))
                ix = jax.device_put(ix, NamedSharding(mesh, P(None, "data", None)))
            state = TrainState.create(vs, tx)
            ep = make_emd_epoch_fn(episode_fn, tx, labels, epb,
                                   grad_accum=False, mesh=mesh)
            state, ms = ep(state, im, ix, jax.random.key(2))
            return (np.asarray(ms["loss"]),
                    jax.tree_util.tree_leaves(jax.device_get(state.params)))

        base, meshed = run(False), run(True)
        np.testing.assert_allclose(meshed[0], base[0], rtol=1e-5)
        for a, b in zip(base[1], meshed[1]):
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


class TestMeshGradAccumRejected:
    def test_pointed_error_through_main(self, tmp_path):
        """mesh + grad_accum: true must fail at config time with a pointed
        error (the mesh shards the vmapped task batch; sequential accumulation
        contradicts it), not deep inside jit."""
        import argparse

        from fewshot_vit_tpu.core.config import Config
        from fewshot_vit_tpu.train import meta_tune_emd

        cfg = Config({
            "train_dataset": "synthetic",
            "train_dataset_args":
                {"n_classes": 6, "n_per_class": 10, "image_size": 16},
            "model_args": {"encoder": "resnet12"},
            "deepemd": "fcn", "way": 3, "shot": 1, "query": 4,
            "image_size": 16,
            "bs": 4, "grad_accum": True, "mesh": {"data": 2},
            "max_epoch": 1, "train_batches": 1,
        })
        args = argparse.Namespace(seed=0, name="mesh_reject", tag=None,
                                  save_root=str(tmp_path), profile_dir=None)
        with pytest.raises(ValueError, match="grad_accum"):
            meta_tune_emd.main(cfg, args)

    def test_mesh_without_data_axis_rejected(self, tmp_path):
        """A mesh with no `data` axis (e.g. copied from a tensor-parallel
        pretrain config) must fail at config time with a pointed error, not a
        raw jax PartitionSpec resource error."""
        import argparse

        from fewshot_vit_tpu.core.config import Config
        from fewshot_vit_tpu.train import meta_tune_emd

        cfg = Config({
            "train_dataset": "synthetic",
            "train_dataset_args":
                {"n_classes": 6, "n_per_class": 10, "image_size": 16},
            "model_args": {"encoder": "resnet12"},
            "deepemd": "fcn", "way": 3, "shot": 1, "query": 4,
            "image_size": 16,
            "bs": 4, "mesh": {"model": 2},
            "max_epoch": 1, "train_batches": 1,
        })
        args = argparse.Namespace(seed=0, name="mesh_no_data", tag=None,
                                  save_root=str(tmp_path), profile_dir=None)
        with pytest.raises(ValueError, match="no 'data' axis"):
            meta_tune_emd.main(cfg, args)

"""EMD solver cross-checks, mirroring the reference's own self-test
(``emd_utils.py:97-133`` compares OpenCV vs qpth flows on random matrices).
Here: exact C++ transportation simplex vs cv2.EMD vs on-device Sinkhorn."""

import numpy as np
import jax.numpy as jnp
import pytest

from fewshot_vit_tpu.ops.emd import emd_distance, normalize_weights, sinkhorn


def random_problems(b=16, n=25, seed=0):
    rng = np.random.default_rng(seed)
    sim = rng.uniform(0, 1, (b, n, n))
    w1 = rng.uniform(0, 1, (b, n))
    w2 = rng.uniform(0, 1, (b, n))
    w1 = np.asarray(normalize_weights(jnp.asarray(w1)))
    w2 = np.asarray(normalize_weights(jnp.asarray(w2)))
    cost = 1.0 - sim
    return cost, w1, w2, sim


class TestExactSolver:
    def test_marginals_and_optimality_vs_cv2(self):
        cv2 = pytest.importorskip("cv2")
        from fewshot_vit_tpu.native.emd import emd_exact

        cost, w1, w2, _ = random_problems(b=8)
        flows, costs = emd_exact(cost, w1, w2)
        # marginals hold
        np.testing.assert_allclose(flows.sum(-1), w1, atol=1e-5)
        np.testing.assert_allclose(flows.sum(-2), w2 * (w1.sum(-1, keepdims=True) / w2.sum(-1, keepdims=True)), atol=1e-5)
        # objective matches cv2.EMD (the reference's eval solver)
        for k in range(cost.shape[0]):
            c_cv, _, flow_cv = cv2.EMD(
                w1[k].astype(np.float32).reshape(-1, 1),
                w2[k].astype(np.float32).reshape(-1, 1),
                cv2.DIST_USER, cost[k].astype(np.float32),
            )
            # cv2 returns cost normalized by total mass
            total = min(w1[k].sum(), w2[k].sum())
            assert costs[k] / total == pytest.approx(c_cv, abs=2e-4)

    def test_simple_known_solution(self):
        from fewshot_vit_tpu.native.emd import emd_exact

        # 2x2: all mass should take the cheap diagonal
        cost = np.array([[[0.0, 1.0], [1.0, 0.0]]])
        w1 = np.array([[1.0, 1.0]])
        w2 = np.array([[1.0, 1.0]])
        flows, costs = emd_exact(cost, w1, w2)
        np.testing.assert_allclose(flows[0], np.eye(2), atol=1e-9)
        assert costs[0] == pytest.approx(0.0, abs=1e-9)


class TestSinkhorn:
    def test_marginals(self):
        cost, w1, w2, _ = random_problems(b=4)
        flow = np.asarray(sinkhorn(jnp.asarray(cost), jnp.asarray(w1), jnp.asarray(w2), reg=0.05, iters=200))
        np.testing.assert_allclose(flow.sum(-1), w1, rtol=1e-3, atol=1e-3)

    def test_close_to_exact_objective(self):
        from fewshot_vit_tpu.native.emd import emd_exact

        cost, w1, w2, sim = random_problems(b=8, seed=3)
        exact_flows, exact_costs = emd_exact(cost, w1, w2)
        flow = np.asarray(sinkhorn(jnp.asarray(cost), jnp.asarray(w1), jnp.asarray(w2), reg=0.01, iters=1000))
        sink_costs = (flow * cost).sum((-1, -2))
        # entropic gap shrinks with reg; ~1.2% relative at reg=0.01 (measured)
        rel = np.abs(sink_costs - exact_costs) / np.abs(exact_costs).max()
        assert rel.max() < 0.03, rel

    def test_logit_correlation_with_exact(self):
        """What matters for DeepEMD accuracy: the *ranking* of
        sum(sim*flow) logits across prototypes."""
        from fewshot_vit_tpu.native.emd import emd_exact

        cost, w1, w2, sim = random_problems(b=32, seed=5)
        exact_flows, _ = emd_exact(cost, w1, w2)
        flow = np.asarray(sinkhorn(jnp.asarray(cost), jnp.asarray(w1), jnp.asarray(w2), reg=0.01, iters=1000))
        l_exact = (sim * exact_flows).sum((-1, -2))
        l_sink = (sim * flow).sum((-1, -2))
        c = np.corrcoef(l_exact, l_sink)[0, 1]
        assert c > 0.999, c

    def test_emd_distance_scaling(self):
        sim = jnp.ones((2, 3, 25, 25))
        flow = jnp.full((2, 3, 25, 25), 1.0 / 25.0)
        out = np.asarray(emd_distance(sim, flow, temperature=12.5))
        np.testing.assert_allclose(out, 12.5, rtol=1e-4)  # fp32 accumulation

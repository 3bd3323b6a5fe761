"""Optimal-transport solvers for DeepEMD matching (SUN-D).

The reference relies on two third-party native solvers (SURVEY.md §2.9):
OpenCV's C++ transportation simplex for eval (``emd_utils.py:65-76`` — flows
are detached, gradients pass only through ``similarity_map * flow``) and qpth's
batched QP for training (``:7-62``). Neither maps to TPU.

TPU-native design:
  * ``sinkhorn``: entropic-regularized OT, batched, fixed iteration count —
    pure jnp, fuses into the jitted episode program, and at low regularization
    converges to the exact LP flow (cross-checked in tests against cv2.EMD and
    the in-repo exact C++ simplex, mirroring ``emd_utils.py:97-133``).
    Flows are ``stop_gradient``-ed by default, matching the reference's
    cv2-path training semantics (head config ``solver: sinkhorn_detached``);
    ``differentiable=True`` unrolls the iterations for qpth-style end-to-end
    gradients.
  * the exact C++ solver lives in ``fewshot_vit_tpu.native.emd`` for parity
    validation (host-side).

Weight convention follows the reference exactly: each side is rescaled to sum
to its node count (``emd_utils.py:21-22, 72-73``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def normalize_weights(w: jax.Array, eps: float = 1e-5) -> jax.Array:
    """relu + eps, then rescale to sum to the node count (reference :69-73)."""
    w = jax.nn.relu(w) + eps
    n = w.shape[-1]
    return w * n / jnp.sum(w, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("iters", "differentiable"))
def sinkhorn(
    cost: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    reg: float = 0.05,
    iters: int = 100,
    differentiable: bool = False,
) -> jax.Array:
    """Entropic-OT flow for batched problems.

    cost (..., N1, N2), w1 (..., N1) row marginals, w2 (..., N2) column
    marginals (already normalized via ``normalize_weights``). Returns the flow
    (..., N1, N2) with row sums w1 and column sums w2 (both sides sum to the
    same mass by construction here — the balanced case the reference uses).

    Log-domain updates for numerical stability; ``reg`` is the entropic
    temperature (lower = closer to the exact LP solution).
    """
    log_w1 = jnp.log(w1)
    log_w2 = jnp.log(w2)
    log_k = -cost / reg  # (..., N1, N2)

    def body(carry, _):
        f, g = carry
        # row scaling then column scaling, in log domain
        f = log_w1 - jax.scipy.special.logsumexp(log_k + g[..., None, :], axis=-1)
        g = log_w2 - jax.scipy.special.logsumexp(log_k + f[..., None], axis=-2)
        return (f, g), None

    init = (jnp.zeros_like(log_w1), jnp.zeros_like(log_w2))
    (f, g), _ = jax.lax.scan(body, init, None, length=iters)
    flow = jnp.exp(log_k + f[..., None] + g[..., None, :])
    if not differentiable:
        flow = jax.lax.stop_gradient(flow)
    return flow


def emd_distance(sim: jax.Array, flow: jax.Array, temperature: float) -> jax.Array:
    """logits = sum(similarity * flow) * temperature / num_node
    (reference ``Network.py:120-124``)."""
    num_node = sim.shape[-1]
    return jnp.sum(sim * flow, axis=(-1, -2)) * (temperature / num_node)

"""Pallas TPU kernel for the Sinkhorn inner loop.

The XLA version (``ops.emd.sinkhorn``) is a ``lax.scan`` whose per-iteration
dual updates materialize through HBM. This kernel pins one batch-block of cost
matrices in VMEM and runs ALL iterations in a ``fori_loop`` on-chip — HBM
traffic drops from O(iters * B * N^2) to O(B * N^2) (one read of the cost, one
write of the flow).

Grid: one program per block of ``block_b`` problems (DeepEMD solves
way*query*E problems of size ~25x25 per episode batch). Log-domain updates,
identical math to ``ops.emd.sinkhorn`` (tested against it, and transitively
against cv2.EMD / the exact C++ simplex).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sinkhorn_kernel(cost_ref, logw1_ref, logw2_ref, flow_ref, *, reg: float, iters: int):
    log_k = -cost_ref[:] / reg  # (BB, N1, N2)
    log_w1 = logw1_ref[:]  # (BB, N1)
    log_w2 = logw2_ref[:]  # (BB, N2)

    def lse(x, axis):
        m = jnp.max(x, axis=axis, keepdims=True)
        return jnp.squeeze(m, axis) + jnp.log(
            jnp.sum(jnp.exp(x - m), axis=axis)
        )

    def body(_, carry):
        f, g = carry
        f = log_w1 - lse(log_k + g[:, None, :], -1)  # (BB, N1)
        g = log_w2 - lse(log_k + f[:, :, None], -2)  # (BB, N2)
        return f, g

    f0 = jnp.zeros_like(log_w1)
    g0 = jnp.zeros_like(log_w2)
    f, g = jax.lax.fori_loop(0, iters, body, (f0, g0))
    flow_ref[:] = jnp.exp(log_k + f[:, :, None] + g[:, None, :])


@partial(jax.jit, static_argnames=("reg", "iters", "block_b", "interpret"))
def sinkhorn_pallas(
    cost: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    reg: float = 0.05,
    iters: int = 100,
    block_b: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ``ops.emd.sinkhorn`` (flows stop-gradient by construction).

    cost (B, N1, N2), w1 (B, N1), w2 (B, N2) — flat batch; callers with richer
    leading dims reshape around it.
    """
    b, n1, n2 = cost.shape
    pad = (-b) % block_b
    if pad:
        cost = jnp.concatenate([cost, jnp.ones((pad, n1, n2), cost.dtype)], 0)
        w1 = jnp.concatenate([w1, jnp.ones((pad, n1), w1.dtype)], 0)
        w2 = jnp.concatenate([w2, jnp.ones((pad, n2), w2.dtype)], 0)
    bb = cost.shape[0]

    flow = pl.pallas_call(
        partial(_sinkhorn_kernel, reg=reg, iters=iters),
        grid=(bb // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, n1, n2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, n1, n2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bb, n1, n2), cost.dtype),
        interpret=interpret,
    )(cost, jnp.log(w1), jnp.log(w2))
    return jax.lax.stop_gradient(flow[:b])

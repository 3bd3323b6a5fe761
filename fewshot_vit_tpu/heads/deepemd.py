"""DeepEMD head (SUN-D): optimal-transport matching of local features.

Re-design of ``meta_tuning_sun_d/Models/models/Network.py:9-204``:
  * cross-reference weight vectors: node weights = relu(<node, other-side
    global mean>) + 1e-3 (``get_weight_vector``, ``:48-65``);
  * center-normalized node features, cosine similarity map between every
    (query node, proto node) pair (``:143-175``);
  * EMD flows over cost = 1 - similarity, logits = sum(sim * flow) *
    temperature / num_node (``:109-141``) — flows from the on-device Sinkhorn
    (see ``ops.emd``; the reference loops per (query, proto) pair into
    OpenCV's CPU solver, a host/device-boundary bottleneck noted in
    SURVEY.md §3.4);
  * SFC (structured fully connected): k-shot prototypes refined by 100 inner
    SGD(momentum .9, dampening .9) steps against the support set during EVAL
    (``get_sfc``, ``:83-107``) — here a ``lax.scan``;
  * node sources: dense feature map ('fcn', optionally with a feature
    pyramid, ``:194-204``), or per-patch pooled features for the 'grid' /
    'sampling' pipelines (5-D patch batches, ``:177-193``).

Everything is episode-batched: logits for (E, way, N, C) protos vs
(E, Q, N, C) queries come from ONE program — no Python pair loops.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from ..ops.emd import emd_distance, normalize_weights, sinkhorn
from ..ops.metric import l2_normalize


# --- pure node-feature math (node-major: (..., N, C)) --------------------------


def weight_vector(a: jax.Array, b: jax.Array) -> jax.Array:
    """Node weights of ``a`` cross-referenced against ``b``'s global mean.

    a (..., M, N, C), b (..., K, N, C) -> (..., M, K, N):
    w[m, k, n] = relu(<a[m, n], mean_n(b[k])>) + 1e-3 (reference ``:48-65``).
    """
    b_mean = b.mean(axis=-2)  # (..., K, C)
    w = jnp.einsum("...mnc,...kc->...mkn", a, b_mean)
    return jax.nn.relu(w) + 1e-3


def _pool_matrix(n_in: int, n_out: int) -> jax.Array:
    """Row-stochastic (n_out, n_in) matrix of torch's adaptive_avg_pool1d
    bins: bin i averages input [floor(i*n/s), ceil((i+1)*n/s))."""
    import numpy as np

    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        a = (i * n_in) // n_out
        b = -((-(i + 1) * n_in) // n_out)  # ceil((i+1)*n_in/n_out)
        m[i, a:b] = 1.0 / (b - a)
    return jnp.asarray(m)


def pyramid_nodes(dense: jax.Array, sizes: Sequence[int]) -> jax.Array:
    """Feature-pyramid node set: (B, H, W, C) -> (B, sum(s*s) + H*W, C).

    Exact ``F.adaptive_avg_pool2d(feature, size)`` math per level (separable
    bin-average matrices on the MXU), then the raw map appended LAST — the
    reference's ``build_feature_pyramid`` order
    (``meta_tuning_sun_d/Models/models/Network.py:194-204``).
    """
    b, h, w, c = dense.shape
    levels = []
    for s in sizes:
        s = int(s)
        lv = jnp.einsum(
            "ih,bhwc,jw->bijc", _pool_matrix(h, s), dense, _pool_matrix(w, s)
        )
        levels.append(lv.reshape(b, s * s, c))
    levels.append(dense.reshape(b, h * w, c))
    return jnp.concatenate(levels, axis=1)


def center_normalize(x: jax.Array, norm: str = "center") -> jax.Array:
    """Subtract the per-node channel mean (reference ``:143-148``)."""
    if norm == "center":
        return x - x.mean(axis=-1, keepdims=True)
    return x


def similarity_map(proto: jax.Array, query: jax.Array, metric: str = "cosine") -> jax.Array:
    """proto (..., way, Np, C), query (..., Q, Nq, C) -> (..., Q, way, Nq, Np)."""
    if metric == "cosine":
        p = l2_normalize(proto)
        q = l2_normalize(query)
        return jnp.einsum("...qnc,...wmc->...qwnm", q, p)
    if metric == "l2":
        d = (
            query[..., :, None, :, None, :] - proto[..., None, :, None, :, :]
        )
        return 1.0 - jnp.sum(d * d, axis=-1)
    raise ValueError(metric)


def exact_flows(cost: jax.Array, w1: jax.Array, w2: jax.Array) -> jax.Array:
    """Exact transportation-simplex flows via the first-party C++ solver
    (``native/emd_solver.cpp``), as a host callback.

    Bit-for-bit the semantics of the reference's eval path — one exact EMD
    per (query, prototype) pair with detached flows (``Network.py:114-124``
    runs cv2.EMD; any exact solver yields the same OPTIMAL OBJECTIVE, hence
    the same ``(sim * flow).sum()`` logits, even where the optimal flow
    matrix itself is degenerate-non-unique). This is the CPU parity-grade
    mode (used by the SUN-D protocol chain test and available as
    ``solver: 'exact'``); the production TPU path stays the on-device
    Sinkhorn — a host round-trip per batch is the exact cost the TPU
    re-design removed.

    Inputs/outputs are stop-gradient'ed: flows are constants to autodiff,
    matching the reference's eval-mode treatment of cv2 flows.
    """
    cost = jax.lax.stop_gradient(cost.astype(jnp.float32))
    w1 = jax.lax.stop_gradient(w1.astype(jnp.float32))
    w2 = jax.lax.stop_gradient(w2.astype(jnp.float32))
    n1, n2 = cost.shape[-2:]

    def host(c, a, b):
        import numpy as np

        from ..native.emd import emd_exact

        c = np.asarray(c, np.float64)
        flows, _ = emd_exact(
            c.reshape(-1, n1, n2),
            np.asarray(a, np.float64).reshape(-1, n1),
            np.asarray(b, np.float64).reshape(-1, n2),
        )
        return flows.reshape(c.shape).astype(np.float32)

    flow = jax.pure_callback(
        host, jax.ShapeDtypeStruct(cost.shape, jnp.float32),
        cost, w1, w2, vmap_method="legacy_vectorized",
    )
    return jax.lax.stop_gradient(flow)


def emd_logits(
    proto: jax.Array,
    query: jax.Array,
    temperature: float = 12.5,
    metric: str = "cosine",
    norm: str = "center",
    solver_reg: float = 0.05,
    solver_iters: int = 100,
    differentiable: bool = False,
    solver_impl: str = "xla",
) -> jax.Array:
    """Full DeepEMD matching: proto (..., way, N, C), query (..., Q, N, C) ->
    logits (..., Q, way). Mirrors ``emd_forward_1shot`` (``:67-81``).

    ``solver_impl='pallas'`` dispatches the Sinkhorn inner loop to the fused
    VMEM-resident kernel (``kernels/sinkhorn.py``; identical math, flows
    stop-gradient). ``solver_impl='exact'`` routes flows through the
    first-party C++ transportation simplex on the host (``exact_flows``) —
    the reference's exact cv2.EMD semantics, for parity-grade CPU eval.

    The OT math always runs fp32: log-domain Sinkhorn iterations are not
    bf16-stable, so bf16 encoders (``--bf16`` eval) hand off here."""
    proto = proto.astype(jnp.float32)
    query = query.astype(jnp.float32)
    w_query = weight_vector(query, proto)  # (..., Q, way, N) row marginals
    w_proto = weight_vector(proto, query)  # (..., way, Q, N) col marginals
    w_proto = jnp.swapaxes(w_proto, -2, -3)  # (..., Q, way, N)

    p = center_normalize(proto, norm)
    q = center_normalize(query, norm)
    sim = similarity_map(p, q, metric)  # (..., Q, way, Nq, Np)

    w1 = normalize_weights(w_query)
    w2 = normalize_weights(w_proto)
    if solver_impl == "exact":
        flow = exact_flows(1.0 - sim, w1, w2)
    elif solver_impl == "pallas" and not differentiable:
        from ..kernels.sinkhorn import sinkhorn_pallas

        cost = 1.0 - sim
        lead = cost.shape[:-2]
        n1, n2 = cost.shape[-2:]
        flow = sinkhorn_pallas(
            cost.reshape(-1, n1, n2), w1.reshape(-1, n1), w2.reshape(-1, n2),
            reg=solver_reg, iters=solver_iters,
        ).reshape(*lead, n1, n2)
    else:
        flow = sinkhorn(1.0 - sim, w1, w2, reg=solver_reg, iters=solver_iters,
                        differentiable=differentiable)
    return emd_distance(sim, flow, temperature)


def sfc_refine(
    proto: jax.Array,
    support: jax.Array,
    way: int,
    shot: int,
    key: jax.Array,
    steps: int = 100,
    lr: float = 0.1,  # reference -sfc_lr default
    batch_size: int = 4,
    momentum: float = 0.9,
    dampening: float = 0.9,
    perms: Optional[jax.Array] = None,
    **emd_kw: Any,
) -> jax.Array:
    """SFC prototype refinement (reference ``get_sfc``, ``:83-107``).

    proto (way, N, C) = shot-mean init; support (way*shot, N, C) in the
    INTERLEAVED item-major order (index t*way + w -> class w, the sampler's
    emission order — labels are ``tile(arange(way), shot)``, the reference's
    ``label_shot``). 100 steps of SGD(momentum, dampening) on
    CE(emd_logits(proto, batch), labels) over shuffled support mini-batches,
    inside ``lax.scan``.

    The momentum update follows ``torch.optim.SGD`` exactly: the FIRST step's
    buffer is the raw gradient (dampening is not applied on initialization,
    ``torch/optim/sgd.py``), every later step does
    ``buf = momentum*buf + (1-dampening)*grad``.

    Runs fp32 regardless of the encoder dtype: the inner SGD accumulates
    small updates that bf16 prototypes would quantize away.

    ``perms`` (steps, way*shot) optionally injects the per-step shuffle
    orders instead of drawing them from ``key`` — used by the SUN-D protocol
    chain test to replay the reference's recorded ``torch.randperm`` stream
    and pin the SFC trajectory step-for-step.
    """
    proto = proto.astype(jnp.float32)
    support = support.astype(jnp.float32)
    labels = jnp.tile(jnp.arange(way), shot)  # reference label_shot order
    n_support = way * shot

    def loss_fn(p, batch_feats, batch_labels, mask):
        logits = emd_logits(p, batch_feats, **emd_kw)
        ce = -jax.nn.log_softmax(logits, -1)[jnp.arange(batch_feats.shape[0]), batch_labels]
        return jnp.sum(ce * mask) / jnp.maximum(mask.sum(), 1.0)

    grad_fn = jax.grad(loss_fn)
    n_batches = -(-n_support // batch_size)

    def step(carry, scan_x):
        p, buf, t = carry
        perm = (scan_x if perms is not None
                else jax.random.permutation(scan_x, n_support))

        def inner(carry2, b):
            p, buf, t = carry2
            idx = jax.lax.dynamic_slice_in_dim(
                jnp.concatenate([perm, perm[: batch_size]]), b * batch_size, batch_size
            )
            mask = (jnp.arange(batch_size) + b * batch_size) < n_support
            g = grad_fn(p, support[idx], labels[idx], mask.astype(p.dtype))
            buf = jnp.where(t == 0, g, momentum * buf + (1.0 - dampening) * g)
            p = p - lr * buf
            return (p, buf, t + 1), None

        (p, buf, t), _ = jax.lax.scan(inner, (p, buf, t), jnp.arange(n_batches))
        return (p, buf, t), None

    buf0 = jnp.zeros_like(proto)
    t0 = jnp.int32(0)
    xs = (jnp.asarray(perms, jnp.int32) if perms is not None
          else jax.random.split(key, steps))
    (proto, _, _), _ = jax.lax.scan(step, (proto, buf0, t0), xs)
    return jax.lax.stop_gradient(proto)


# --- head module ----------------------------------------------------------------


# 'sinkhorn' selected the detached path in configs written before the rename;
# 'qpth' named the differentiable path after the reference's QP solver, but
# what runs is unrolled Sinkhorn — same false-belief trap as 'opencv'.
_SOLVER_ALIASES = {
    "opencv": "sinkhorn_detached",
    "sinkhorn": "sinkhorn_detached",
    "qpth": "sinkhorn_unrolled",
}
_SOLVERS = ("sinkhorn_detached", "sinkhorn_unrolled", "sinkhorn_pallas",
            "exact")


def _canonical_solver(solver: str) -> str:
    """Resolve legacy solver aliases with a warning.

    The default on-device solver is log-domain Sinkhorn with stop-gradient
    flows — the *semantics* of the reference's cv2.EMD path (detached flows,
    Network.py:114-124) but NOT the exact transportation simplex (that lives
    in ``native/emd.py`` for CPU parity validation). The old config name
    'opencv' invited the false belief that the exact simplex runs on device,
    so the truthful name is 'sinkhorn_detached'. Likewise the differentiable
    path's old name 'qpth' suggested an interior-point QP with implicit
    gradients (the reference's training solver, emd_utils.py:7-62); what runs
    is Sinkhorn with gradients through the unrolled iterations, so the
    truthful name is 'sinkhorn_unrolled'."""
    if solver in _SOLVER_ALIASES:
        import warnings

        new = _SOLVER_ALIASES[solver]
        what = (
            "differentiable unrolled Sinkhorn, not an interior-point QP"
            if new == "sinkhorn_unrolled"
            else "stop-gradient log-domain Sinkhorn, not the exact simplex"
        )
        warnings.warn(
            f"solver: '{solver}' is a legacy alias for '{new}' ({what}); "
            "update your config",
            stacklevel=3,
        )
        return new
    if solver not in _SOLVERS:
        raise ValueError(f"unknown solver {solver!r}; one of {_SOLVERS} "
                         f"(or legacy alias {tuple(_SOLVER_ALIASES)})")
    return solver


class DeepEMD(nn.Module):
    """Encoder + DeepEMD matching / pretrain classifier."""

    # Driven by its own SUN-D loops (train/meta_tune_emd.py, eval/run_emd.py),
    # not the standard episodic meta-tune contract (see train/meta_tune.py).
    standard_episodic = False

    encoder: nn.Module
    n_classes: Optional[int] = None  # pre_train mode fc
    temperature: float = 12.5
    metric: str = "cosine"
    norm: str = "center"
    solver_reg: float = 0.05
    solver_iters: int = 100
    # 'sinkhorn_detached' = stop-gradient flows (the semantics of the
    # reference's cv2.EMD path: flows are computed on detached tensors,
    # gradients reach only `similarity_map * flow`, Network.py:114-124);
    # 'sinkhorn_unrolled' = flows differentiable through the unrolled Sinkhorn
    # iterations (the role of the reference's qpth training solver,
    # Network.py:77-80); 'sinkhorn_pallas' = stop-gradient flows via the fused
    # VMEM kernel; 'exact' = the reference's exact-EMD eval semantics
    # bit-for-bit via the first-party C++ simplex as a host callback (CPU
    # parity-grade mode — see `exact_flows`). Legacy aliases 'opencv' ->
    # 'sinkhorn_detached' and 'qpth' -> 'sinkhorn_unrolled' warn
    # (see _canonical_solver).
    solver: str = "sinkhorn_detached"
    feature_pyramid: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    def setup(self) -> None:
        if self.n_classes is not None:
            self.fc = nn.Dense(self.n_classes, dtype=self.dtype)

    def encode_nodes(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Images -> node features.

        x (B, H, W, 3)          -> dense nodes (B, Hf*Wf [+pyramid], C)
        x (B, P, H, W, 3) patches -> per-patch pooled nodes (B, P, C)
        """
        if x.ndim == 5:
            b, p = x.shape[:2]
            _, pooled = self.encoder(x.reshape((-1,) + x.shape[2:]), train)
            return pooled.reshape(b, p, -1)
        dense, _ = self.encoder(x, train)
        if self.feature_pyramid:
            return pyramid_nodes(dense, self.feature_pyramid)
        b, h, w, c = dense.shape
        return dense.reshape(b, h * w, c)

    def pre_train(self, x: jax.Array, train: bool = False) -> jax.Array:
        _, pooled = self.encoder(x, train)
        return self.fc(pooled)

    def meta(self, proto_nodes: jax.Array, query_nodes: jax.Array) -> jax.Array:
        """proto (..., way, N, C), query (..., Q, N, C) -> (..., Q, way)."""
        return emd_logits(
            proto_nodes, query_nodes,
            temperature=self.temperature, metric=self.metric, norm=self.norm,
            solver_reg=self.solver_reg, solver_iters=self.solver_iters,
            differentiable=self.solver == "sinkhorn_unrolled",
            solver_impl={"sinkhorn_pallas": "pallas", "exact": "exact"}.get(
                self.solver, "xla"),
        )

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # default apply = pretrain path (keeps init simple)
        if self.n_classes is not None:
            return self.pre_train(x, train)
        return self.encode_nodes(x, train)


@models.register("deepemd")
def make_deepemd(
    encoder: str = "visformer_micro_80",
    encoder_args: Optional[dict] = None,
    n_classes: Optional[int] = None,
    temperature: float = 12.5,
    metric: str = "cosine",
    norm: str = "center",
    solver_reg: float = 0.05,
    solver_iters: int = 100,
    solver: str = "sinkhorn_detached",
    feature_pyramid: Optional[Sequence[int]] = None,
    dtype: Any = jnp.float32,
) -> DeepEMD:
    enc = models.make(encoder, dtype=dtype, **(encoder_args or {}))
    return DeepEMD(
        encoder=enc, n_classes=n_classes, temperature=temperature,
        metric=metric, norm=norm, solver_reg=solver_reg,
        solver_iters=solver_iters, solver=_canonical_solver(solver),
        feature_pyramid=feature_pyramid, dtype=dtype,
    )

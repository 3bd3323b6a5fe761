"""Device mesh + sharding specs — the TPU-native replacement for DataParallel.

The reference's ONLY parallelism is single-process ``nn.DataParallel``
(SURVEY.md §2.8; e.g. ``sun_train_teacher/train_classifier.py:120-123``), with a
hand-rolled "broadcast support, shard queries" hack for SUN-D
(``meta_tuning_sun_d/train_meta.py:159``). Here parallelism is *declared*:

  * a ``Mesh`` over ICI with named axes — ``data`` (batch/episode parallelism)
    and ``model`` (tensor parallelism for the wide channel dims);
  * batches shard on ``data`` (episodes ride the leading axis, so episode
    parallelism == data parallelism, replacing the ``repeat(num_gpu, ...)``
    support-broadcast hack with a PartitionSpec);
  * large 2-D kernels (qkv / MLP / classifier Dense) shard their output
    features on ``model``; XLA inserts the all-reduces over ICI;
  * gradients need no explicit psum — ``jit`` + sharded batch does it.

BatchNorm note: under a sharded batch axis, ``jnp.mean`` over the batch is a
global (cross-replica) reduction, so batch stats are exact global-batch stats —
strictly better than DataParallel's per-replica stats drift.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Opt-in multi-host (DCN) initialization.

    Call once per process before any other jax API; afterwards
    ``jax.devices()`` spans every host and ``make_mesh`` lays DCN on the
    OUTERMOST axis dim so inner-axis collectives ride ICI. On managed TPU
    slices (GKE/TPU-VM metadata) all arguments auto-detect — pass them only
    for manual clusters. Returns the process count.

    No-op (returns 1) when the cluster is a single process and no
    coordinator is configured — single-host runs need no setup.
    """
    import os

    configured = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not configured and (num_processes or 1) <= 1:
        return 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()


def make_mesh(
    axes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh. Default: 1-D ``data`` mesh over all (global) devices.

    Multi-host: after ``init_distributed``, ``jax.devices()`` is globally
    ordered process-major, so the FIRST axis in ``axes`` varies slowest
    across processes — put the data-parallel axis first and DCN traffic is
    pure gradient psum while ``model``-axis collectives stay on ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {axes} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch or episode) axis on ``data``."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def param_shardings(
    mesh: Mesh,
    params: Any,
    min_features: int = 256,
    axis: str = "model",
) -> Any:
    """Tensor-parallel sharding tree for a param pytree.

    2-D kernels whose output features are wide and divisible by the ``model``
    axis size shard on that axis (column parallel); everything else replicates.
    With a size-1 model axis this degrades to pure data parallelism.
    """
    if axis in mesh.shape:
        tp = mesh.shape[axis]
    else:
        tp = 1

    def rule(leaf):
        shape = np.shape(leaf)
        if (
            tp > 1
            and len(shape) == 2
            and shape[1] >= min_features
            and shape[1] % tp == 0
        ):
            return NamedSharding(mesh, P(None, axis))
        if (
            tp > 1
            and len(shape) == 4
            and shape[3] >= min_features
            and shape[3] % tp == 0
        ):
            # conv kernels: shard output channels
            return NamedSharding(mesh, P(None, None, None, axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def episode_shardings(mesh: Mesh, shot_ndim: int = 6, query_ndim: int = 5):
    """(x_shot, x_query) shardings: both shard the episode axis on ``data``.

    This subsumes the reference's replicated-support pattern: within one
    episode the support IS replicated relative to its queries because they
    live on the same shard."""
    return (
        NamedSharding(mesh, P("data", *([None] * (shot_ndim - 1)))),
        NamedSharding(mesh, P("data", *([None] * (query_ndim - 1)))),
    )

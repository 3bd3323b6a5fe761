"""Worker process for the multi-host (DCN) test.

Forms a 2-process JAX CPU cluster (4 emulated devices per process -> 8 global),
builds the process-major global ``data`` mesh, and runs one data-parallel
pretrain step on a global batch assembled from process-local shards. Prints
``LOSS <value>`` — the parent asserts both processes report the same finite
loss (the gradient psum crossed the process boundary).

Usage: python _multihost_worker.py <coordinator> <num_processes> <process_id>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    from fewshot_vit_tpu.parallel import init_distributed, make_mesh
    from fewshot_vit_tpu.parallel.mesh import batch_sharding, replicated

    n = init_distributed(coordinator_address=coordinator,
                         num_processes=num_processes, process_id=process_id)
    assert n == num_processes, n
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes  # global view
    assert len(jax.local_devices()) == 4

    from fewshot_vit_tpu.core import models
    import fewshot_vit_tpu.models  # noqa: F401
    import fewshot_vit_tpu.heads  # noqa: F401
    from fewshot_vit_tpu.train.state import TrainState
    from fewshot_vit_tpu.train.steps import make_pretrain_step

    mesh = make_mesh({"data": 4 * num_processes})

    model = models.make("classifier", encoder="convnet4",
                        classifier_args={"n_classes": 8})
    variables = model.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)))
    tx = optax.sgd(0.1)
    state = TrainState.create(variables, tx)
    state = jax.device_put(state, replicated(mesh))

    # global batch 16 = 2 per device; each process owns rows [8*pid, 8*pid+8)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (16, 80, 80, 3), dtype=np.uint8)
    labels = rng.integers(0, 8, (16,)).astype(np.int32)
    img_shard = jax.make_array_from_process_local_data(
        batch_sharding(mesh, 4), images[8 * process_id: 8 * process_id + 8])
    lab_shard = jax.make_array_from_process_local_data(
        batch_sharding(mesh, 1), labels[8 * process_id: 8 * process_id + 8])

    # jit auto-partitions from the input shardings; the gradient mean over the
    # global batch is the cross-process psum (the "DCN" hop in production)
    step = make_pretrain_step(model, tx)
    state, metrics = step(state, img_shard, lab_shard, jax.random.key(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"LOSS {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()

"""HLO collective audit for the mesh programs (VERDICT r3, next-round item 7).

The sharded==unsharded equality tests (test_train.py::TestShardedStep,
test_export.py) pin *numerics*, but a resharding regression that silently
all-gathers the replicated image array per step, or gathers per-episode
activations across chips, would pass them and only surface as multi-chip
slowness nobody on this 1-real-chip box can measure. This file compiles the
same mesh programs the CLIs build (on the emulated 8-device CPU mesh) and
asserts the partitioned HLO contains ONLY the expected collective structure —
the SPMD contract of SURVEY.md §2.8's "broadcast support, shard queries"
pattern as PartitionSpecs:

  * episode/data-parallel programs: gradient + metric reductions
    (``all-reduce``) and at most tiny bookkeeping gathers (per-episode
    accuracy vectors, step counters) — never a data-sized buffer;
  * the dp x tp pretrain step additionally moves tensor-parallel activation
    shards, but still must never materialize the full image batch through a
    collective.

Parsing is on the compiled executable's HLO text (post-GSPMD partitioning),
so anything XLA actually scheduled is visible, including async
``*-start/done`` forms.
"""

import math
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from fewshot_vit_tpu.heads import Classifier, DeepEMD, LinearClassifier, MetaBaseline, TokenLabel
from fewshot_vit_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
from fewshot_vit_tpu.train import TrainState, make_optimizer, make_pretrain_step

from .test_heads_eval import TinyEncoder
from .test_train import small_batch

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}
_SHAPE_RE = re.compile(r"([a-z]+\d*)\[([\d,]*)\]")
_OPS = ("all-gather", "all-reduce", "reduce-scatter", "all-to-all",
        "collective-permute")


def _shape_bytes(shape_text: str) -> int:
    """Total bytes of every array shape in an HLO result-type string
    (handles tuples: ``(f32[4,8]{...}, f32[8]{...})``)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        n = math.prod(int(d) for d in dims.split(",") if d) if dims else 1
        total += n * _DTYPE_BYTES.get(dtype, 4)
    return total


def collect_collectives(hlo_text: str):
    """[(op, result_bytes, line)] for every collective instruction."""
    out = []
    for line in hlo_text.splitlines():
        s = line.strip()
        for op in _OPS:
            # "%name = f32[..] all-reduce(" / "all-reduce-start(" — not the
            # computation name ("%region_all-reduce..") or attribute text
            if re.search(rf"= [^=]*\b{op}(-start)?\(", s):
                lhs = s.split(f" {op}", 1)[0]
                out.append((op, _shape_bytes(lhs), s))
                break
    return out


def compiled_hlo(jitted, *args) -> str:
    return jitted.lower(*args).compile().as_text()


def assert_data_parallel_contract(hlo: str, data_bytes: int, what: str,
                                  gather_budget: int = 16 * 1024):
    """The strict contract for pure data/episode-parallel programs: reduction
    traffic (grad/metric all-reduces, or the tiny partial-result all-gathers
    XLA:CPU sometimes emits in their place) is fine, but nothing data-sized
    moves through ANY collective, and gathers stay bookkeeping-tiny."""
    cols = collect_collectives(hlo)
    for op, nbytes, line in cols:
        assert nbytes < data_bytes, (
            f"{what}: {op} moves {nbytes}B >= data buffer {data_bytes}B — a "
            f"resharding regression gathered a data-sized array:\n  {line[:200]}"
        )
        if op in ("all-gather", "all-to-all", "collective-permute"):
            assert nbytes <= gather_budget, (
                f"{what}: {op} of {nbytes}B exceeds the bookkeeping budget "
                f"({gather_budget}B):\n  {line[:200]}"
            )
    # the program must actually BE parallel: some cross-chip reduction exists
    # (GSPMD may lower a logical all-reduce as a small all-gather + local
    # reduce on CPU, so require any collective, not specifically all-reduce)
    assert cols, (
        f"{what}: no collectives at all — the sharded program is computing "
        "redundantly on every chip (sharding annotations lost?)"
    )


@pytest.fixture()
def devices8():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 emulated devices")
    return d[:8]


class TestEpisodeParallelPrograms:
    def test_eval_run_program(self, devices8):
        """The eval program under --mesh-data episode parallelism
        (eval/run.py): variables+images replicated, idx sharded on the
        in-batch episode axis. Expected: per-episode accs psummed/raked,
        no image gathers."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fewshot_vit_tpu.eval.episodic import _eval_run_fn

        mesh = make_mesh({"data": 8}, devices8)
        way, shot, query, epb = 4, 1, 3, 8
        head = MetaBaseline(encoder=TinyEncoder())
        images, labels = small_batch(n=96, img=16, n_classes=6)
        xs0 = jnp.zeros((1, way, shot, 16, 16, 3))
        xq0 = jnp.zeros((1, way * query, 16, 16, 3))
        variables = head.init(jax.random.key(0), xs0, xq0)

        run = _eval_run_fn(head, way, shot, query, epb,
                           (0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
        idx = np.random.default_rng(0).integers(
            0, 96, (3, epb * way * (shot + query)), dtype=np.int32)
        variables = jax.device_put(variables, replicated(mesh))
        images_d = jax.device_put(images, replicated(mesh))
        idx_d = jax.device_put(
            jnp.asarray(idx.reshape(3, epb, -1)).reshape(3, -1),
            NamedSharding(mesh, P(None, "data")))
        hlo = compiled_hlo(run, variables, images_d, idx_d)
        cols = collect_collectives(hlo)
        # eval has no gradients: NO reduction may be data-sized, and only
        # bookkeeping-tiny gathers (the (batches, epb) acc stack) are allowed
        for op, nbytes, line in cols:
            assert nbytes < images.nbytes, (
                f"eval: {op} moves a data-sized buffer:\n  {line[:200]}")
            assert nbytes <= 16 * 1024, (
                f"eval: {op} of {nbytes}B exceeds bookkeeping budget:\n  {line[:200]}")

    def test_meta_tune_epoch_program(self, devices8):
        """The meta-tune EPOCH program under `mesh:` (train/meta_tune.py)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fewshot_vit_tpu.data.sampler import EpisodeSampler
        from fewshot_vit_tpu.train.loop import make_meta_tune_epoch

        mesh = make_mesh({"data": 8}, devices8)
        way, shot, query, epb = 4, 1, 3, 8
        head = MetaBaseline(encoder=TinyEncoder())
        images, labels = small_batch(n=120, img=16, n_classes=6)
        xs0 = jnp.zeros((1, way, shot, 16, 16, 3))
        xq0 = jnp.zeros((1, way * query, 16, 16, 3))
        variables = head.init(jax.random.key(0), xs0, xq0)
        tx = make_optimizer(variables["params"], "sgd", lr=1e-2)
        state = jax.device_put(TrainState.create(variables, tx), replicated(mesh))
        images_d = jax.device_put(images, replicated(mesh))
        sampler = EpisodeSampler(np.asarray(labels), 3, way, shot + query, epb)
        idx = np.stack(list(sampler.epoch(np.random.default_rng(0)))).astype(np.int32)
        idx_d = jax.device_put(jnp.asarray(idx), NamedSharding(mesh, P(None, "data")))
        epoch_fn = make_meta_tune_epoch(head, tx, way, shot, query, epb)
        hlo = compiled_hlo(epoch_fn, state, images_d, idx_d, jax.random.key(3))
        assert_data_parallel_contract(hlo, images.nbytes, "meta_tune epoch")

    def test_sun_epoch_program(self, devices8):
        """The SUN EPOCH program under `mesh:` (train/sun.py): dp batches,
        replicated frozen teacher."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fewshot_vit_tpu.train.loop import batch_indices, make_sun_epoch

        mesh = make_mesh({"data": 8}, devices8)
        student = TokenLabel(encoder=TinyEncoder(), n_classes=6)
        teacher = TokenLabel(encoder=TinyEncoder(), n_classes=6)
        images, labels = small_batch(n=64, img=16)
        sv = student.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        tv = teacher.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))
        tx = make_optimizer(sv["params"], "adamw", lr=1e-3)
        state = jax.device_put(TrainState.create(sv, tx), replicated(mesh))
        tv = jax.device_put(tv, replicated(mesh))
        images_d = jax.device_put(images, replicated(mesh))
        labels_d = jax.device_put(labels, replicated(mesh))
        epoch_fn = make_sun_epoch(student, teacher, tx, soft_k=2, bg_tokens=1)
        idx = batch_indices(64, 16, np.random.default_rng(0))
        idx_d = jax.device_put(jnp.asarray(idx),
                               NamedSharding(mesh, P(None, "data")))
        hlo = compiled_hlo(epoch_fn, state, tv, images_d, labels_d, idx_d,
                           jax.random.key(2))
        assert_data_parallel_contract(hlo, images.nbytes, "sun epoch")

    def test_sund_episode_parallel_epoch_program(self, devices8):
        """The SUN-D (DeepEMD) epoch program with the task batch's EPISODE
        axis sharded (train/meta_tune_emd.py under `mesh:` — the reference's
        DataParallel scatter-episodes pattern). Per-episode patch/node
        activations must stay chip-local; only episode-mean grads + metrics
        reduce."""
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fewshot_vit_tpu.train.meta_tune_emd import (
            make_emd_episode_fn,
            make_emd_epoch_fn,
            make_patch_fn,
        )

        mesh = make_mesh({"data": 8}, devices8)
        way, shot, query, epb = 2, 1, 2, 8
        head = DeepEMD(encoder=TinyEncoder(), solver_iters=5)
        variables = head.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        patch_fn = make_patch_fn("fcn", [2], 4, 2.0, 16, train=True)
        episode_fn = make_emd_episode_fn(head, way, shot, query, patch_fn,
                                         (0.5,) * 3, (0.5,) * 3, sfc=False,
                                         train=True)
        labels = jnp.tile(jnp.arange(way), query)
        rng = np.random.default_rng(1)
        images = rng.integers(0, 256, (24, 16, 16, 3)).astype(np.uint8)
        images_d = jax.device_put(jnp.asarray(images), NamedSharding(mesh, P()))
        idx_d = jax.device_put(
            jnp.asarray(rng.integers(0, 24, (2, epb, way * (shot + query))),
                        jnp.int32),
            NamedSharding(mesh, P(None, "data", None)))
        vs = jax.device_put(variables, NamedSharding(mesh, P()))
        tx = optax.sgd(1e-2, momentum=0.9)
        state = TrainState.create(vs, tx)
        # mesh= is how the CLI wires episode parallelism: it constrains the
        # per-episode grads to P("data") so the weight-grad convs stay
        # chip-local (without it GSPMD replicates them, gathering the episode
        # image batch — this test is what catches that)
        epoch_fn = make_emd_epoch_fn(episode_fn, tx, labels, epb, mesh=mesh)
        hlo = compiled_hlo(epoch_fn, state, images_d, idx_d, jax.random.key(3))
        assert_data_parallel_contract(hlo, images.nbytes, "sund epoch")


class TestDpTpProgram:
    def test_dp_tp_pretrain_step(self, devices8):
        """The 4x2 data x model pretrain step: tensor-parallel matmul shards
        legitimately reduce/move activations, but the full image batch must
        never materialize through a collective, and no single collective may
        move more than the model itself (which would mean grads or weights
        are being gathered instead of reduced/kept sharded)."""
        from fewshot_vit_tpu.models import Visformer

        mesh = make_mesh({"data": 4, "model": 2}, devices8)
        enc = Visformer(
            img_size=32, init_channels=16, embed_dim=64, depth=(1, 1, 1),
            num_heads=4, attn_stage="011", spatial_conv="100",
        )
        model = Classifier(encoder=enc,
                           classifier=LinearClassifier(6, name="classifier"))
        images, labels = small_batch(n=16, img=32)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        pshard = param_shardings(mesh, variables["params"], min_features=64)
        params = jax.tree_util.tree_map(jax.device_put, variables["params"], pshard)
        tx = make_optimizer(params, "adamw", lr=1e-3)
        state = TrainState.create(
            {"params": params, "batch_stats": variables["batch_stats"]}, tx)
        state = state.replace(
            batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
            step=jax.device_put(state.step, replicated(mesh)),
        )
        step = make_pretrain_step(model, tx)
        images_d = jax.device_put(images, batch_sharding(mesh, images.ndim))
        labels_d = jax.device_put(labels, batch_sharding(mesh, 1))
        hlo = compiled_hlo(step, state, images_d, labels_d, jax.random.key(1))
        cols = collect_collectives(hlo)
        assert cols, "dp_tp: no collectives — program not actually parallel"
        params_bytes = sum(
            np.prod(np.shape(p)) * 4 for p in jax.tree_util.tree_leaves(params))
        # the raw image batch itself must never be gathered (u8 or normalized
        # f32 form). Cross-batch BatchNorm stats DO legitimately move one
        # full-batch ACTIVATION per BN layer (the partitioner may implement
        # the global mean as all-gather + local reduce), so the bound is on
        # the image shape, not on activation bytes.
        img_dims = ",".join(str(d) for d in images.shape)
        for op, nbytes, line in cols:
            assert f"[{img_dims}]" not in line, (
                f"dp_tp: {op} materializes the full image batch:\n  {line[:200]}")
            assert nbytes <= params_bytes, (
                f"dp_tp: {op} moves {nbytes}B > model size {params_bytes}B — "
                f"weights/grads gathered instead of reduced/kept sharded:\n  {line[:200]}")

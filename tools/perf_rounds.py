"""Per-round perf regression tracker (VERDICT r3, next-round item 8).

The driver records only the headline bench number per round; a regression in
any OTHER hot path (SUN-D cached eval, SUN-D training, phase-1 training)
would be invisible. This tool measures the four tracked throughputs on the
real TPU, appends ONE JSON line per round to ``PERF_ROUNDS.jsonl`` (repo
root), and renders the round-over-round table for ``docs/PERF.md``.

Tracked metrics — configs are FIXED so rounds are comparable (changing a
config means adding a new column, never silently redefining one):

  * ``sunm_eval_eps_s``    — the bench.py headline: 5w1s full-re-encode
    MetaBaseline eval, visformer_micro_80, bf16, ep_per_batch 128,
    1024 episodes (episodes/s).
  * ``sund_cached_eval_eps_s`` — SUN-D grid DeepEMD eval, bf16 encoder,
    ``--cached`` node reuse, epb 16, 200 episodes padded to 208 (13 full
    groups — the divisor counts what actually ran), excluding the one-time
    dataset encode, min-of-3 timings (episodes/s).
  * ``sund_train_eps_s``   — SUN-D grid training step, bf16 encoder, bs=4
    ``grad_accum``, 4-step epoch-scan, min-of-6 (episodes/s).
  * ``sund_train_vmap_eps_s`` — same shapes on the VMAPPED task-batch path
    (bs=1, ``grad_accum: false`` — the config DEFAULT, and the branch the
    mesh episode parallelism runs), 16-step epoch-scan, min-of-6
    (episodes/s). Added r4 when that branch was rewritten (vmap-of-grad +
    NaN suffix mask); earlier rows are n/a.
  * ``phase1_img_s``       — phase-1 CE + on-device cropaug, bf16,
    batch 512, 10-step epoch-scan, min-of-8 (img/s).

Timing discipline per docs/PERF.md: double-warm with a host fetch each time
(only a fetch forces the axon relay), min-of-N on the shared relay, scan
programs so weights cross the relay once per program, not per step.

Run once per round on the TPU:  python tools/perf_rounds.py --round 4
Render the markdown table:      python tools/perf_rounds.py --table
"""

import argparse
import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PERF_ROUNDS.jsonl",
)
METRICS = ("sunm_eval_eps_s", "sund_cached_eval_eps_s", "sund_train_eps_s",
           "sund_train_vmap_eps_s", "phase1_img_s")


def measure_sund_cached_eval(repeats: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    from fewshot_vit_tpu.core import datasets, models
    from fewshot_vit_tpu.core import rng as rng_mod
    from fewshot_vit_tpu.data.sampler import EpisodeSampler
    from fewshot_vit_tpu.eval.emd_eval import (
        group_episode_indices,
        make_emd_cached_episode_fn,
        make_emd_eval_run_fn,
        make_emd_node_cache_fn,
    )
    from fewshot_vit_tpu.train.meta_tune_emd import make_patch_fn

    way, shot, query, n_episodes = 5, 1, 15, 200
    ds = datasets.make("synthetic", n_classes=20, n_per_class=600,
                       image_size=80, seed=0)
    labels = jnp.tile(jnp.arange(way), query)
    sampler = EpisodeSampler(ds.labels, n_episodes, way, shot + query, 1)
    idx = np.stack(list(sampler.epoch(rng_mod.np_rng(0))))
    idx = (idx.reshape(n_episodes, way, shot + query)
           .transpose(0, 2, 1).reshape(n_episodes, -1).astype(np.int32))
    patch_fn = make_patch_fn("grid", [2, 3], 9, 2.0, 80, False)

    head = models.make("deepemd", encoder="visformer_micro_80",
                       dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = head.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)))
    variables = jax.device_put(variables)
    images_dev = jax.device_put(ds.images)
    cache_fn = make_emd_node_cache_fn(head, patch_fn, ds.mean, ds.std)
    nodes_dev = cache_fn(variables, images_dev)
    np.asarray(nodes_dev[0, 0, 0])
    run = make_emd_eval_run_fn(
        make_emd_cached_episode_fn(head, way, shot, sfc=False), labels)
    grouped = group_episode_indices(idx, 16)
    # group_episode_indices pads 200 episodes to 13 full groups of 16 = 208;
    # the timed run executes ALL of them, so divide by the padded count. The
    # r1-r3 backfilled rows used the 200 divisor (~3.8% understated, see the
    # r4 row's note); the r4 row itself was re-measured with this arithmetic.
    n_executed = grouped.shape[0] * grouped.shape[1]
    idx_dev = jax.device_put(jnp.asarray(grouped))
    key = rng_mod.root_key(0)
    np.asarray(run(variables, nodes_dev, idx_dev, key))
    np.asarray(run(variables, nodes_dev, idx_dev, key))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(run(variables, nodes_dev, idx_dev, key))
        times.append(time.perf_counter() - t0)
    return n_executed / min(times)


def measure_sund_train(repeats: int = 6, steps: int = 4, bs: int = 4,
                       grad_accum: bool = True) -> float:
    import jax
    import jax.numpy as jnp

    from fewshot_vit_tpu.core import datasets, models
    from fewshot_vit_tpu.core import rng as rng_mod
    from fewshot_vit_tpu.data.sampler import EpisodeSampler
    from fewshot_vit_tpu.train.meta_tune_emd import (
        build_sund_optimizer,
        make_emd_episode_fn,
        make_emd_epoch_fn,
        make_patch_fn,
    )
    from fewshot_vit_tpu.train.state import TrainState

    way, shot, query = 5, 1, 15
    ds = datasets.make("synthetic", n_classes=20, n_per_class=200,
                       image_size=80, seed=0)
    images_dev = jax.device_put(ds.images)
    labels = jnp.tile(jnp.arange(way), query)
    patch_fn = make_patch_fn("grid", [2, 3], 9, 2.0, 80, True)
    sampler = EpisodeSampler(ds.labels, steps * bs, way, shot + query, 1)
    idx = np.stack(list(sampler.epoch(rng_mod.np_rng(0))))
    idx = (idx.reshape(steps * bs, way, shot + query)
           .transpose(0, 2, 1).reshape(steps, bs, -1).astype(np.int32))

    head = models.make("deepemd", encoder="visformer_micro_80",
                       dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = head.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)))
    variables = jax.device_put(variables)
    from fewshot_vit_tpu.core import Config

    tx = build_sund_optimizer(Config({}), 50)
    state = TrainState.create(variables, tx)
    episode_fn = make_emd_episode_fn(head, way, shot, query, patch_fn,
                                     ds.mean, ds.std, sfc=False, train=True)
    epoch_fn = make_emd_epoch_fn(episode_fn, tx, labels, bs,
                                 grad_accum=grad_accum)
    idx_dev = jnp.asarray(idx)
    key = rng_mod.root_key(0)
    state, ms = epoch_fn(state, images_dev, idx_dev, key)
    np.asarray(ms["loss"])
    state, ms = epoch_fn(state, images_dev, idx_dev, key)
    np.asarray(ms["loss"])
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, ms = epoch_fn(state, images_dev, idx_dev, key)
        np.asarray(ms["loss"])
        times.append((time.perf_counter() - t0) / steps)
    return bs / min(times)


def measure_phase1(repeats: int = 8, steps: int = 10) -> float:
    import jax
    import jax.numpy as jnp

    from fewshot_vit_tpu.core import models
    from fewshot_vit_tpu.data.augment import make_cropaug_fn
    from fewshot_vit_tpu.train import TrainState, make_optimizer, make_pretrain_step

    batch, n_classes = 512, 64
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, 80, 80, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, n_classes, (batch,)), jnp.int32)
    mean = std = (0.5, 0.5, 0.5)
    model = models.make("classifier", encoder="visformer_micro_80",
                        classifier_args={"n_classes": n_classes},
                        dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)))
    variables = jax.device_put(variables)
    tx = make_optimizer(variables["params"], "adamw", lr=5e-4)
    state = TrainState.create(variables, tx)
    aug = make_cropaug_fn(mean, std, out_size=80)
    step = make_pretrain_step(model, tx, preprocess_fn=aug, jit=False)
    keys = jax.random.split(jax.random.key(0), steps)

    @jax.jit
    def epoch(state, images, labels, keys):
        def body(s, k):
            s, m = step(s, images, labels, k)
            return s, m["loss"]
        s, losses = jax.lax.scan(body, state, keys)
        return s, losses[-1]

    state, loss = epoch(state, images, labels, keys)
    np.asarray(loss)
    state, loss = epoch(state, images, labels, keys)
    np.asarray(loss)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, loss = epoch(state, images, labels, keys)
        np.asarray(loss)
        times.append((time.perf_counter() - t0) / steps)
    return batch / min(times)


def render_table() -> str:
    rows = []
    if os.path.exists(ROWS_PATH):
        with open(ROWS_PATH) as f:
            rows = [json.loads(l) for l in f if l.strip()]
    header = ("| round | date | SUN-M eval eps/s | SUN-D cached eval eps/s "
              "| SUN-D train eps/s | SUN-D vmap train eps/s | phase-1 img/s |\n"
              "|---|---|---|---|---|---|---|")
    lines = [header]
    for r in rows:
        cells = [str(r.get("round", "?")), str(r.get("date", ""))]
        for m in METRICS:
            v = r.get(m)
            cells.append("n/a" if v is None else f"{v:,.1f}")
        note = r.get("note")
        if note:
            cells[1] += f" ({note})"
        lines.append("| " + " | ".join(cells) + " |")
    return "\n".join(lines)


def main():
    from fewshot_vit_tpu.core.watchdog import watchdog_reexec

    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="measure all four metrics and append a row")
    ap.add_argument("--table", action="store_true",
                    help="print the markdown table from PERF_ROUNDS.jsonl")
    ap.add_argument("--note", default=None)
    args = ap.parse_args()
    if args.table:
        print(render_table())
        return
    if args.round is None:
        ap.error("pass --round N to measure, or --table to render")
    watchdog_reexec(timeout_s=2400)

    from fewshot_vit_tpu.core.rng import enable_compilation_cache
    import fewshot_vit_tpu.models  # noqa: F401
    import fewshot_vit_tpu.heads  # noqa: F401
    import fewshot_vit_tpu.data.datasets  # noqa: F401

    enable_compilation_cache()
    sys.path.insert(0, os.path.dirname(ROWS_PATH))
    import bench

    row = {
        "round": args.round,
        "date": datetime.date.today().isoformat(),
    }
    if args.note:
        row["note"] = args.note
    row["sunm_eval_eps_s"] = round(bench.measure()["value"], 2)
    print(f"sunm_eval_eps_s        = {row['sunm_eval_eps_s']}", flush=True)
    row["sund_cached_eval_eps_s"] = round(measure_sund_cached_eval(), 1)
    print(f"sund_cached_eval_eps_s = {row['sund_cached_eval_eps_s']}", flush=True)
    row["sund_train_eps_s"] = round(measure_sund_train(), 2)
    print(f"sund_train_eps_s       = {row['sund_train_eps_s']}", flush=True)
    row["sund_train_vmap_eps_s"] = round(
        measure_sund_train(steps=16, bs=1, grad_accum=False), 2)
    print(f"sund_train_vmap_eps_s  = {row['sund_train_vmap_eps_s']}", flush=True)
    row["phase1_img_s"] = round(measure_phase1(), 0)
    print(f"phase1_img_s           = {row['phase1_img_s']}", flush=True)
    with open(ROWS_PATH, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    print(render_table())


if __name__ == "__main__":
    main()

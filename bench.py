"""Benchmark: training throughput (examples/s) of the flagship model on the
available accelerator, vs a single-process CPU baseline.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N}

``vs_baseline`` divides device throughput by a CPU-backend run of the same
jitted train step (stand-in for the reference's single-process CPU training;
the reference publishes no numbers — BASELINE.md). The CPU measurement is
cached in .bench_cpu_cache.json to keep repeat runs fast; delete the file to
re-measure.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

CACHE = Path(__file__).parent / ".bench_cpu_cache.json"

# ML-1M-scale synthetic workload
N_USERS, N_ITEMS, N_ROWS = 6040, 3706, 1_000_000
BATCH_SIZE = 8192
EMBED_SIZE = 64
WARMUP_STEPS, TIMED_STEPS = 8, 50


def build_workload():
    import numpy as np

    from librecommender_tpu.models import BPR

    rng = np.random.default_rng(0)

    class _FakeDataInfo:
        n_users = N_USERS
        n_items = N_ITEMS

    # bypass the pandas data pipeline: the bench measures the train step
    users = rng.integers(0, N_USERS, N_ROWS).astype(np.int32)
    items = rng.integers(0, N_ITEMS, N_ROWS).astype(np.int32)
    return users, items


def measure():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from librecommender_tpu.ops.initializers import truncated_normal
    from librecommender_tpu.ops.losses import bpr_loss
    from librecommender_tpu.parallel.mesh import aligned_rows

    users_all, items_all = build_workload()
    rng = jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    u_rows, i_rows = aligned_rows(N_USERS), aligned_rows(N_ITEMS)
    params = {
        "user_embed": truncated_normal(r1, (u_rows, EMBED_SIZE)),
        "item_embed": truncated_normal(r2, (i_rows, EMBED_SIZE)),
        "item_bias": jnp.zeros((i_rows,)),
    }
    optimizer = optax.adam(1e-3, eps=1e-5)
    opt_state = optimizer.init(params)

    def loss_fn(params, batch, rng):
        k1, k2 = jax.random.split(rng)
        neg = jax.random.randint(k1, batch["item"].shape, 0, N_ITEMS)
        resample = jax.random.randint(k2, batch["item"].shape, 0, N_ITEMS)
        neg = jnp.where(neg == batch["item"], resample, neg)
        ue = params["user_embed"][batch["user"]]
        pos = params["item_bias"][batch["item"]] + jnp.sum(
            ue * params["item_embed"][batch["item"]], axis=-1
        )
        negs = params["item_bias"][neg] + jnp.sum(
            ue * params["item_embed"][neg], axis=-1
        )
        return bpr_loss(pos, negs)

    @jax.jit
    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def batch_at(i):
        start = (i * BATCH_SIZE) % (N_ROWS - BATCH_SIZE)
        return {
            "user": users_all[start : start + BATCH_SIZE],
            "item": items_all[start : start + BATCH_SIZE],
        }

    base = jax.random.PRNGKey(1)
    for i in range(WARMUP_STEPS):
        params, opt_state, loss = step(params, opt_state, batch_at(i), jax.random.fold_in(base, i))
    loss.block_until_ready()
    t0 = time.perf_counter()
    for i in range(TIMED_STEPS):
        params, opt_state, loss = step(
            params, opt_state, batch_at(WARMUP_STEPS + i), jax.random.fold_in(base, 1000 + i)
        )
    loss.block_until_ready()
    elapsed = time.perf_counter() - t0
    return TIMED_STEPS * BATCH_SIZE / elapsed


def cpu_baseline():
    if CACHE.exists():
        return json.loads(CACHE.read_text())["cpu_examples_per_sec"]
    env = dict(os.environ, BENCH_FORCE_CPU="1")
    out = subprocess.run(
        [sys.executable, __file__, "--cpu-probe"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    value = float(out.stdout.strip().splitlines()[-1])
    CACHE.write_text(json.dumps({"cpu_examples_per_sec": value}))
    return value


def main():
    if "--cpu-probe" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        print(measure())
        return
    device_eps = measure()
    try:
        cpu_eps = cpu_baseline()
    except Exception:
        cpu_eps = None
    result = {
        "metric": "bpr_train_throughput",
        "value": round(device_eps, 1),
        "unit": "examples/s",
        "vs_baseline": round(device_eps / cpu_eps, 2) if cpu_eps else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Scaling-efficiency harness: examples/s at 1..N devices.

On real multi-chip/multi-host hardware this measures the BASELINE target
(>=85% efficiency at 2 hosts). Under the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) it validates the
sharded program structure — virtual-device numbers are NOT hardware
scaling numbers.

Prints one JSON line per device count.
"""
import json
import os
import sys

if "--force-cpu" in sys.argv or os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np
import pandas as pd

from librecommender_tpu.data import DatasetPure
from librecommender_tpu.models import BPR
from librecommender_tpu.parallel import build_mesh

N_USERS, N_ITEMS, N_ROWS = 6040, 3706, 200_000
BATCH = 8192
EPOCHS = 4


def measure(n_devices, sparse=False, model_parallel=1, n_rows=N_ROWS,
            n_items=N_ITEMS):
    rng = np.random.default_rng(0)
    frame = pd.DataFrame(
        {
            "user": rng.integers(0, N_USERS, n_rows),
            "item": rng.integers(0, n_items, n_rows),
            "label": np.ones(n_rows),
        }
    ).drop_duplicates(subset=["user", "item"])
    train_data, data_info = DatasetPure.build_trainset(frame)
    model = BPR("ranking", data_info, embed_size=64, n_epochs=EPOCHS,
                batch_size=BATCH, sparse_optimizer=sparse)
    mesh = (
        build_mesh(n_devices=n_devices, model_parallel=model_parallel)
        if n_devices > 1 else None
    )
    model.fit(train_data, neg_sampling=True, verbose=0, mesh=mesh)
    steady = model.trainer.epoch_times[1:]
    return len(train_data) / (sum(steady) / len(steady))


def main():
    total = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8) if c <= total]
    base = None
    for c in counts:
        eps = measure(c)
        if base is None:
            base = eps
        eff = eps / (base * c)
        print(json.dumps({
            "n_devices": c,
            "examples_per_sec": round(eps, 1),
            "scaling_efficiency": round(eff, 3),
        }))
    # sharded + row-sparse LazyAdam: tables row-shard over `model`, only
    # touched rows update (SURVEY §2.7 huge-vocab mandate; the scale story
    # needs a big vocab so the dense update's full-table traffic shows)
    if total >= 4:
        eps_sparse = measure(
            min(8, total), sparse=True, model_parallel=2,
            n_rows=400_000, n_items=500_000,
        )
        print(json.dumps({
            "n_devices": min(8, total),
            "mode": "sharded_sparse_500k_vocab",
            "examples_per_sec": round(eps_sparse, 1),
        }))


if __name__ == "__main__":
    main()

"""Benchmark: REAL training-loop throughput (examples/s) of BPR through the
framework's fit path (device-resident epoch scan), vs a CPU run of the same
program.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N}

``vs_baseline`` divides accelerator throughput by a CPU-backend run
(stand-in for the reference's single-process CPU training — the reference
publishes no numbers, BASELINE.md). The CPU measurement is cached in
.bench_cpu_cache.json; delete the file to re-measure.
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
WARMUP_EPOCHS, TIMED_EPOCHS = 1, 3


def measure(n_rows=N_ROWS, timed_epochs=TIMED_EPOCHS):
    import numpy as np
    import pandas as pd

    from librecommender_tpu.data import DatasetPure
    from librecommender_tpu.models import BPR

    rng = np.random.default_rng(0)
    frame = pd.DataFrame(
        {
            "user": rng.integers(0, N_USERS, n_rows),
            "item": rng.integers(0, N_ITEMS, n_rows),
            "label": np.ones(n_rows),
        }
    ).drop_duplicates(subset=["user", "item"])
    train_data, data_info = DatasetPure.build_trainset(frame)
    model = BPR(
        "ranking", data_info, embed_size=EMBED_SIZE,
        n_epochs=WARMUP_EPOCHS + timed_epochs, lr=0.01, batch_size=BATCH_SIZE,
    )
    model.fit(train_data, neg_sampling=True, verbose=0)
    # steady-state epochs (the first epoch includes the XLA compile)
    steady = model.trainer.epoch_times[WARMUP_EPOCHS:]
    return len(train_data) / (sum(steady) / len(steady))


def cpu_baseline():
    if CACHE.exists():
        return json.loads(CACHE.read_text())["cpu_examples_per_sec"]
    out = subprocess.run(
        [sys.executable, __file__, "--cpu-probe"],
        capture_output=True, text=True, timeout=900,
    )
    value = float(out.stdout.strip().splitlines()[-1])
    CACHE.write_text(json.dumps({"cpu_examples_per_sec": value}))
    return value


def main():
    if "--cpu-probe" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        print(measure(n_rows=N_ROWS // 4, timed_epochs=1))
        return
    device_eps = measure()
    try:
        cpu_eps = cpu_baseline()
    except Exception:
        cpu_eps = None
    result = {
        "metric": "bpr_fit_throughput",
        "value": round(device_eps, 1),
        "unit": "examples/s",
        "vs_baseline": round(device_eps / cpu_eps, 2) if cpu_eps else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

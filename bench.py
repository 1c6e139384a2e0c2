"""Benchmark: REAL training-loop throughput of seven model families through
the framework's fit path (device-resident epoch scan), with a roofline
account per model, vs a CPU run of the same program.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N,
     "extra": {...}}

Headline metric stays ``bpr_fit_throughput`` (continuity with round 1);
``extra`` carries bpr/din/lightgcn/two_tower/youtube_retrieval/
transformer/sim with examples/s, FLOPs/example (XLA cost analysis — near
exact), achieved TFLOP/s and %MFU against the chip's bf16 peak, achieved
HBM bandwidth, and the model's measured bound.

Methodology (round-3 upgrade over the pre-fusion estimates):
- ``achieved_gbs``/``hbm_pct``: the xplane trace of one real fit epoch
  carries per-op post-fusion ``bytes_accessed``; summing over leaf
  device ops gives the epoch's HBM traffic, scaled by steady
  examples/s. On large tiled matmul fusions the counter models operand
  tile RE-READS, some served on-chip — each op's bytes are therefore
  capped at peak bandwidth x its measured duration (an op physically
  cannot move more HBM bytes than that), making ``hbm_pct <= 100`` by
  construction; the clipped volume is reported as
  ``onchip_reread_bytes_per_example``. Far tighter than the old
  pre-fusion estimate everywhere (BPR: 31.8% bogus -> 15.4% measured).
- ``bound``/``time_breakdown_pct``: the same trace's device time
  aggregated by hardware unit via op provenance (gather/scatter/sort vs
  MXU matmul vs copies vs vector) — names the limiting unit directly
  instead of inferring it from a static roofline.

``vs_baseline`` divides accelerator throughput by a CPU-backend run
(stand-in for the reference's single-process CPU training — the reference
publishes no numbers, BASELINE.md). The CPU measurement is cached in
.bench_cpu_cache.json; delete the file to re-measure.
"""
import collections
import glob
import gzip
import json
import os
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

CACHE = Path(__file__).parent / ".bench_cpu_cache.json"

# ML-1M-scale synthetic workload (BENCH_ROWS overrides for smoke tests)
N_USERS, N_ITEMS, N_ROWS = 6040, 3706, int(os.environ.get("BENCH_ROWS", 1_000_000))
BATCH_SIZE = 8192
EMBED_SIZE = 64
WARMUP_EPOCHS, TIMED_EPOCHS = 1, 3

# bf16 MXU peak per chip by device kind (TFLOP/s); f32 data still runs
# through the MXU's bf16 path on v5e
PEAK_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v4": 275.0}
PEAK_HBM_GBS = {"TPU v5 lite": 819.0, "TPU v5e": 819.0, "TPU v4": 1228.0}

# models measured; first entries are the long-standing headline trio.
# sim_fast = SIM(long_history_grad=False): the SIM paper's two-stage
# training practice — deletes the B*long_max_len-row backward scatter
# that pins default SIM at the per-row hardware constant
# (docs/tpu_performance.md "SIM long-history floor").
MODELS = ("bpr", "din", "lightgcn", "two_tower", "youtube_retrieval",
          "transformer", "sim", "sim_fast")
LISTWISE = {"two_tower", "youtube_retrieval"}  # in-batch/sampled negatives


def _pure_frame(n_rows):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(0)
    return pd.DataFrame({
        "user": rng.integers(0, N_USERS, n_rows),
        "item": rng.integers(0, N_ITEMS, n_rows),
        "label": np.ones(n_rows),
    }).drop_duplicates(subset=["user", "item"])


def _feat_frame(n_rows):
    import numpy as np

    frame = _pure_frame(n_rows)
    rng = np.random.default_rng(1)
    sex = rng.choice(["m", "f"], N_USERS)
    age = rng.integers(16, 60, N_USERS)
    genre = rng.choice(["a", "b", "c", "d", "e", "f", "g"], N_ITEMS)
    frame["sex"] = sex[frame.user]
    frame["age"] = (age[frame.user] - 35.0) / 25.0
    frame["genre"] = genre[frame.item]
    return frame


def _step_cost(model, train_data, listwise):
    """FLOPs of one jitted grad step (XLA cost analysis — near exact)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = BATCH_SIZE
    batch = {
        "user": jnp.zeros((n,), jnp.int32),
        "item": jnp.zeros((n,), jnp.int32),
        "label": jnp.ones((n,), jnp.float32),
        "weight": jnp.ones((n,), jnp.float32),
    }
    if not listwise:
        batch["item_neg"] = jnp.zeros((n, 1), jnp.int32)
    extras = getattr(model, "batch_extras", lambda td: None)(train_data)
    if extras:
        for k, v in extras.items():
            batch[k] = jnp.asarray(np.asarray(v[:n]))
    step = jax.jit(lambda p, b: jax.grad(model.loss_fn)(p, b, jax.random.PRNGKey(0)))
    try:
        compiled = step.lower(model.params, batch).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


_CONTAINER_CATS = {"while", "conditional", "call"}


def _bucket(category, tf_op):
    """Map a leaf device op to the hardware unit it exercises."""
    t = (tf_op or "").lower()
    if ("scatter" in t or "gather" in t or "sort" in t
            or category in ("dynamic-slice", "dynamic-update-slice", "sort")):
        return "gather_scatter_sort"
    if "dot" in t or "conv" in t or "einsum" in t or "matmul" in t \
            or category == "convolution":
        return "matmul"
    if category in ("data formatting", "copy", "copy-done", "copy-start"):
        return "copy_format"
    return "vector_elementwise"


def _trace_stats(profile_dir, peak_gbs=None):
    """MEASURED stats from the xplane trace of one real fit epoch:
    per-op ``bytes_accessed`` summed over leaf device ops (post-fusion,
    hardware-counted) plus a time breakdown by hardware unit — the
    model's measured bound.

    Per-op physical cap (round-4 fix for the >100% LightGCN row): an op
    cannot move more HBM bytes than peak bandwidth x its measured
    duration — counter bytes beyond that limit are operand tile
    RE-READS served on-chip (VMEM/CMEM), not HBM traffic. Capping each
    op at ``dur * peak`` makes ``hbm_pct <= 100`` by construction while
    staying exact for every op below the roofline; the clipped total is
    also reported so the size of the correction is visible."""
    try:
        files = sorted(glob.glob(
            f"{profile_dir}/plugins/profile/*/*.trace.json.gz"
        ))
        if not files:
            return None
        ev = json.load(gzip.open(files[-1]))["traceEvents"]
        buckets = collections.Counter()
        total_bytes = 0
        clipped_bytes = 0
        for e in ev:
            a = e.get("args", {})
            cat = (a.get("hlo_category") or "").strip()
            if e.get("ph") != "X" or not cat or cat in _CONTAINER_CATS:
                continue
            buckets[_bucket(cat, a.get("tf_op", ""))] += e["dur"]
            b = int(a.get("raw_bytes_accessed",
                          a.get("bytes_accessed", 0)) or 0)
            if peak_gbs:
                # dur is us; peak_gbs GB/s -> bytes/us = peak_gbs * 1e3
                cap = e["dur"] * peak_gbs * 1e3
                if b > cap:
                    clipped_bytes += b - cap
                    b = cap
            total_bytes += b
        total = sum(buckets.values())
        if not total:
            return None
        top = buckets.most_common(4)
        out = {
            "epoch_bytes": total_bytes,
            "time_breakdown_pct": {
                k: round(100.0 * v / total, 1) for k, v in top
            },
            "bound": top[0][0],
        }
        if clipped_bytes:
            out["onchip_reread_bytes_clipped"] = int(clipped_bytes)
        return out
    except Exception:
        return None


def _fit_throughput(model, train_data, neg_sampling, profile_dir):
    model.fit(train_data, neg_sampling=neg_sampling, verbose=0,
              profile_dir=profile_dir)
    times = model.trainer.epoch_times
    # epoch 1 compiles; epoch 2 carries the profiler overhead when traced
    steady = times[2:] if profile_dir and len(times) > 2 else times[1:]
    return len(train_data) / (sum(steady) / len(steady))


def _build(name, n_rows):
    from librecommender_tpu.data import DatasetFeat, DatasetPure
    from librecommender_tpu.models import (
        BPR, DIN, SIM, LightGCN, Transformer, TwoTower, YouTubeRetrieval,
    )

    epochs = WARMUP_EPOCHS + TIMED_EPOCHS
    seq_kw = dict(recent_num=10)
    if name in ("bpr", "lightgcn"):
        train_data, data_info = DatasetPure.build_trainset(_pure_frame(n_rows))
        if name == "bpr":
            model = BPR("ranking", data_info, embed_size=EMBED_SIZE,
                        n_epochs=epochs, lr=0.01, batch_size=BATCH_SIZE)
        else:
            model = LightGCN("ranking", data_info, embed_size=EMBED_SIZE,
                             n_epochs=epochs, lr=0.001,
                             batch_size=BATCH_SIZE, n_layers=3)
        return model, train_data
    train_data, data_info = DatasetFeat.build_trainset(
        _feat_frame(n_rows), user_col=["sex", "age"], item_col=["genre"],
        sparse_col=["sex", "genre"], dense_col=["age"],
    )
    # batch_size counts negatives too for pointwise models (reference
    # adjust_batch_size semantics): 2*BATCH_SIZE keeps the measured
    # geometry at BATCH_SIZE positives + BATCH_SIZE negatives per step
    if name == "din":
        model = DIN("ranking", data_info, embed_size=EMBED_SIZE,
                    n_epochs=epochs, lr=0.001, batch_size=2 * BATCH_SIZE,
                    hidden_units=(128, 64, 32), **seq_kw)
    elif name == "transformer":
        model = Transformer("ranking", data_info, embed_size=EMBED_SIZE,
                            n_epochs=epochs, lr=0.001,
                            batch_size=2 * BATCH_SIZE,
                            hidden_units=(128, 64, 32), **seq_kw)
    elif name in ("sim", "sim_fast"):
        model = SIM("ranking", data_info, embed_size=EMBED_SIZE,
                    n_epochs=epochs, lr=0.001, batch_size=2 * BATCH_SIZE,
                    hidden_units=(128, 64, 32), long_max_len=50,
                    search_topk=10,
                    long_history_grad=(name == "sim"), **seq_kw)
    elif name == "two_tower":
        model = TwoTower("ranking", data_info, embed_size=EMBED_SIZE,
                         n_epochs=epochs, lr=0.001, batch_size=BATCH_SIZE,
                         loss_type="softmax", hidden_units=(128, 64, 32))
    elif name == "youtube_retrieval":
        model = YouTubeRetrieval("ranking", data_info, embed_size=EMBED_SIZE,
                                 n_epochs=epochs, lr=0.001,
                                 batch_size=BATCH_SIZE,
                                 loss_type="sampled_softmax",
                                 hidden_units=(128, 64, 32))
    else:
        raise ValueError(name)
    return model, train_data


def measure(name, n_rows=N_ROWS, with_cost=True, with_profile=True):
    import jax

    model, train_data = _build(name, n_rows)
    listwise = name in LISTWISE
    if with_cost:
        model.build_model()
        flops_step = _step_cost(model, train_data, listwise)
    else:
        flops_step = 0.0
    profile_dir = tempfile.mkdtemp(prefix=f"bench_{name}_") \
        if with_profile else None
    eps = _fit_throughput(model, train_data, not listwise, profile_dir)
    out = {"examples_per_s": round(eps, 1)}
    # per-step examples: pointwise feat models interleave B/2 positives +
    # B/2 negatives in a batch of model.batch_size; the throughput count
    # is positives (len(train_data) rows/epoch), so scale step costs by
    # positives per step
    pos_per_step = BATCH_SIZE
    if flops_step:
        flops_ex = flops_step / pos_per_step
        achieved = eps * flops_ex
        out["flops_per_example"] = round(flops_ex, 1)
        out["achieved_tflops"] = round(achieved / 1e12, 3)
        kind = jax.devices()[0].device_kind
        peak = next(
            (v for k, v in PEAK_TFLOPS.items() if kind.startswith(k)), None
        )
        if peak:
            out["mfu_pct"] = round(100.0 * achieved / 1e12 / peak, 2)
    if profile_dir:
        kind = jax.devices()[0].device_kind
        peak_bw = next(
            (v for k, v in PEAK_HBM_GBS.items() if kind.startswith(k)),
            None,
        )
        stats = _trace_stats(profile_dir, peak_gbs=peak_bw)
        if stats:
            # measured bandwidth: the traced epoch's hardware-counted HBM
            # bytes per example (per-op capped at peak x duration — see
            # _trace_stats), times steady-state examples/s
            clipped = stats.pop("onchip_reread_bytes_clipped", 0)
            bytes_ex = stats.pop("epoch_bytes") / len(train_data)
            gbs = eps * bytes_ex / 1e9
            out["measured_bytes_per_example"] = round(bytes_ex, 1)
            out["achieved_gbs"] = round(gbs, 1)
            if peak_bw:
                out["hbm_pct"] = round(100.0 * gbs / peak_bw, 2)
            if clipped:
                out["onchip_reread_bytes_per_example"] = round(
                    clipped / len(train_data), 1
                )
            out.update(stats)
    return out


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


def _emit(extra, cpu_eps=None):
    bpr = extra.get("bpr") or {}
    device_eps = bpr.get("examples_per_s")
    print(json.dumps({
        "metric": "bpr_fit_throughput",
        "value": device_eps,
        "unit": "examples/s",
        "vs_baseline": round(device_eps / cpu_eps, 2)
        if (device_eps and cpu_eps) else None,
        "extra": extra,
    }), flush=True)


def _watchdogs(extra):
    """The shared-tunnel TPU can block INDEFINITELY (backend init after an
    outage, or queued work from a killed client) — exceptions are handled
    per-model, hangs are not. Two daemon watchdogs keep the driver's
    round-end run from producing nothing: device init gets 300s; the whole
    bench gets 3600s and then emits best-so-far."""
    import threading

    device_ok = threading.Event()

    def device_probe():
        import jax

        jax.devices()
        device_ok.set()

    def device_guard():
        if not device_ok.wait(300):
            _emit({"error": "device init timed out (TPU tunnel unavailable)"})
            os._exit(3)

    def overall_guard():
        time.sleep(3600)
        extra.setdefault("error", "bench wall-clock watchdog fired")
        _emit(extra)
        os._exit(4)

    threading.Thread(target=device_probe, daemon=True).start()
    threading.Thread(target=device_guard, daemon=True).start()
    threading.Thread(target=overall_guard, daemon=True).start()


def main():
    if "--cpu-probe" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        print(measure("bpr", n_rows=N_ROWS // 4, with_cost=False,
                      with_profile=False)["examples_per_s"])
        return
    details = Path(__file__).parent / "BENCH_DETAILS.json"
    extra = {}
    _watchdogs(extra)
    # BENCH_MODELS=lightgcn,two_tower re-measures a subset (details file
    # then holds only that subset — for variance probes, not the driver)
    subset = os.environ.get("BENCH_MODELS")
    models = tuple(subset.split(",")) if subset else MODELS
    for name in models:
        try:
            extra[name] = measure(name)
        except Exception as exc:  # keep the headline alive on any failure
            extra[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        details.write_text(json.dumps(extra, indent=2))  # survive timeouts
    try:
        cpu_eps = cpu_baseline()
    except Exception:
        cpu_eps = None
    _emit(extra, cpu_eps)


if __name__ == "__main__":
    main()

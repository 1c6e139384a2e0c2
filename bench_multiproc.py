"""Multi-process (gloo) weak-scaling rehearsal: 1 -> 2 -> 4 OS processes.

The BASELINE north star (>=85% efficiency at 2 hosts) needs real ICI/DCN;
this harness rehearses the measurement END TO END on CPU so collective-
overhead bugs surface before hardware: P processes x 2 virtual CPU devices
each, coordinated by ``jax.distributed.initialize`` with gloo, tables
row-sharded over the ``model`` axis, batch split over ``data`` — the exact
sharding recipe of the TPU path. Weak scaling: rows and global batch scale
with P, per-device work constant, so perfect scaling = flat epoch time.

Per-collective accounting: process 0 traces one epoch (jax.profiler) and
aggregates device-op durations whose HLO names mark cross-process
collectives (all-reduce / all-gather / collective-permute / all-to-all),
reporting the fraction of device time spent communicating.

HONEST CAVEAT (also in PARITY.md): gloo over localhost is NOT ICI — these
numbers validate the machinery and the methodology, not TPU scaling.

Usage: python bench_multiproc.py [max_procs]   # prints one JSON line per P
"""
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

_WORKER = r"""
import glob, gzip, json, os, sys, time
pid, nproc, port, out_path, trace_dir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
)
# big-vocab + touched-row-compaction config (round 5): production-shaped
# tables where the batch touches ~8% of rows — the regime the compacted
# all-gather is built for
big = os.environ.get("BENCH_MULTIPROC_BIG") == "1"
vocab_scale = 10 if big else 1
# pin each process to ONE core: per-process compute capacity is constant
# across P, so the weak-scaling curve isolates coordination/collective
# overhead instead of measuring localhost core contention
os.sched_setaffinity(0, {pid % os.cpu_count()})
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
if nproc > 1:
    jax.distributed.initialize("127.0.0.1:" + port, num_processes=nproc,
                               process_id=pid)
sys.path.insert(0, "__REPO__")
import numpy as np, pandas as pd
from librecommender_tpu.data import DatasetPure
from librecommender_tpu.models import BPR
from librecommender_tpu.parallel import build_mesh

# weak scaling: rows/batch scale with nproc, per-device share constant
BASE_ROWS, BASE_BATCH = 120_000, 4096
rng = np.random.default_rng(0)
n_rows = BASE_ROWS * nproc
frame = pd.DataFrame({
    "user": rng.integers(0, 6040 * vocab_scale, n_rows),
    "item": rng.integers(0, 3706 * vocab_scale, n_rows),
    "label": np.ones(n_rows),
}).drop_duplicates(subset=["user", "item"])
train_data, data_info = DatasetPure.build_trainset(frame)
mesh = build_mesh(n_devices=2 * nproc, model_parallel=2)
m = BPR("ranking", data_info, embed_size=64, n_epochs=4,
        batch_size=BASE_BATCH * nproc)
if os.environ.get("BENCH_MULTIPROC_DENSE") == "1":
    m.grad_compaction = False  # counterfactual: dense all-reduce at big vocab
if big:
    # grad_compaction='auto' (the default) engages here: touched ids per
    # data shard (B_local user ids + 2*B_local item ids) are far fewer
    # than table rows, so the cross-process payload is the compacted
    # (ids, rows) all-gather instead of the dense-table all-reduce
    D = 64
    dense_payload = sum(
        (n + 1) * D * 4 for n in (data_info.n_users, data_info.n_items)
    )
    t_local = 3 * BASE_BATCH  # user + item + neg ids per shard
    compact_payload = nproc * t_local * (D + 1) * 4
else:
    # tables smaller than the batch's touched set: auto keeps the dense
    # all-reduce (compacting would move MORE bytes)
    dense_payload = compact_payload = None
if pid == 0 and trace_dir:
    # epoch 1 compiles; trace epoch 2+ via the fit hook
    m.fit(train_data, neg_sampling=True, verbose=0, mesh=mesh,
          profile_dir=trace_dir)
else:
    m.fit(train_data, neg_sampling=True, verbose=0, mesh=mesh)
steady = m.trainer.epoch_times[2:] if trace_dir else m.trainer.epoch_times[1:]
eps = len(train_data) / (sum(steady) / len(steady))
result = {"pid": pid, "examples_per_sec": eps, "rows": len(train_data)}
if dense_payload is not None:
    result["dense_grad_payload_bytes_per_step"] = dense_payload
    result["compacted_payload_bytes_per_step"] = compact_payload
if pid == 0 and trace_dir:
    # aggregate collective time from the xplane trace
    try:
        files = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
        ev = json.load(gzip.open(files[-1]))["traceEvents"]
        coll = total = 0.0
        per = {}
        for e in ev:
            if e.get("ph") != "X":
                continue
            name = (e.get("name") or "").lower()
            args = e.get("args", {})
            lname = (args.get("long_name") or args.get("hlo_op") or name).lower()
            dur = e.get("dur", 0)
            if not args:
                continue
            total += dur
            for marker in ("all-reduce", "all-gather", "allreduce",
                           "allgather", "collective-permute", "all-to-all",
                           "reduce-scatter"):
                if marker in name or marker in lname:
                    coll += dur
                    per[marker] = per.get(marker, 0.0) + dur
                    break
        result["collective_us"] = coll
        result["traced_total_us"] = total
        result["per_collective_us"] = per
    except Exception as exc:  # noqa: BLE001
        result["trace_error"] = str(exc)
np.save(out_path, np.asarray([eps]))
print("RESULT " + json.dumps(result), flush=True)
"""


def run(nproc, port):
    with tempfile.TemporaryDirectory() as td:
        tdir = Path(td)
        script = tdir / "worker.py"
        script.write_text(
            _WORKER.replace("__REPO__", str(Path(__file__).parent))
        )
        env = {**os.environ, "PALLAS_AXON_POOL_IPS": ""}
        trace_dir = str(tdir / "trace")
        procs = []
        for pid in range(nproc):
            procs.append(subprocess.Popen(
                [sys.executable, str(script), str(pid), str(nproc), port,
                 str(tdir / f"o{pid}.npy"),
                 trace_dir if pid == 0 else ""],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            ))
        logs = [p.communicate(timeout=900)[0].decode() for p in procs]
        for p, log in zip(procs, logs):
            if p.returncode != 0:
                raise RuntimeError(log[-3000:])
        for line in logs[0].splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
    raise RuntimeError("no RESULT line from process 0")


def main():
    max_procs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    # sweep both configs: the legacy small-vocab one (auto compaction
    # stays off — tables are smaller than the touched set) and the
    # big-vocab one where touched-row compaction carries the step
    configs = [("small_vocab", False), ("big_vocab_compacted", True)]
    if os.environ.get("BENCH_MULTIPROC_ONLY") in ("small", "big"):
        keep = os.environ["BENCH_MULTIPROC_ONLY"] == "big"
        configs = [c for c in configs if c[1] is keep]
    for label, big in configs:
        os.environ["BENCH_MULTIPROC_BIG"] = "1" if big else "0"
        base = None
        for nproc, port in [(1, "23471"), (2, "23472"), (4, "23474")]:
            if nproc > max_procs:
                break
            r = run(nproc, port)
            eps = r["examples_per_sec"]
            if base is None:
                base = eps
            coll_pct = (
                round(100.0 * r["collective_us"] / r["traced_total_us"], 1)
                if r.get("traced_total_us") else None
            )
            out = {
                "config": label,
                "processes": nproc,
                "devices": 2 * nproc,
                "examples_per_sec": round(eps, 1),
                # weak scaling: efficiency = throughput / (P * single-proc)
                "weak_scaling_efficiency": round(eps / (base * nproc), 3),
                "collective_time_pct": coll_pct,
                "per_collective_us": r.get("per_collective_us"),
                "caveat": "gloo-over-localhost CPU rehearsal, not ICI",
            }
            for k in ("dense_grad_payload_bytes_per_step",
                      "compacted_payload_bytes_per_step"):
                if k in r:
                    out[k] = r[k]
            print(json.dumps(out))


if __name__ == "__main__":
    main()

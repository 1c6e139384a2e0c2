"""Model/online serving families at the FULL ML-1M catalog: native C++
tier (tiled jaxpr interpreter) vs the Python aiohttp/XLA tier, measured
back-to-back in alternating rounds so both see identical host conditions
(the shared VM's throughput drifts +/-20% over minutes — sequential
whole-tier runs are not comparable).

Reference analog being matched: actix-web -> TF Serving scoring hop
(libserving/actix_serving/src/tf_deploy.rs, online_deploy_grpc.rs); here
the native tier executes the exported program IN-PROCESS (tiled across a
worker pool) and the Python tier runs the XLA-jitted scorer behind
aiohttp.

Usage: python parity/bench_model_serving.py [--rounds 4] [--requests 800]
       (expects /tmp/synth_ml1m from `python parity/synthetic.py`)
"""
import argparse
import json
import tempfile
import time
from pathlib import Path

import numpy as np
import pandas as pd

from bench_serving import _post, hammer


def median_of(rows, key):
    return float(np.median([r[key] for r in rows]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--requests", type=int, default=800)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--data", default="/tmp/synth_ml1m")
    args = ap.parse_args()

    from librecommender_tpu.data import DatasetFeat
    from librecommender_tpu.models import DIN
    from librecommender_tpu.serving import serialization
    from librecommender_tpu.serving.native_server import (
        export_native,
        start_native_server,
    )

    feat_df = pd.read_csv(Path(args.data) / "train.csv")
    feat_train, feat_info = DatasetFeat.build_trainset(
        feat_df[["user", "item", "label", "sex", "age", "genre"]],
        user_col=["sex", "age"], item_col=["genre"],
        sparse_col=["sex", "genre"], dense_col=["age"],
    )
    din = DIN("ranking", feat_info, embed_size=16, n_epochs=1,
              batch_size=8192, recent_num=10, hidden_units=(64, 32))
    din.fit(feat_train, neg_sampling=True, verbose=0)

    feat_users = list(feat_info.user2id.keys())
    rng = np.random.default_rng(1)
    items_pool = list(feat_info.item2id.keys())
    model_payloads = [
        {"user": int(u), "n_rec": 10} for u in rng.choice(feat_users, 256)
    ]
    online_payloads = [
        {"user": int(u), "n_rec": 10,
         "seq": [int(i) for i in rng.choice(items_pool, 5)],
         "user_feats": {"sex": "f", "age": 0.3}}
        for u in rng.choice(feat_users, 256)
    ]

    # BENCH_SERVING_ISOLATE=1 pins both servers to cores 0..n-2 and the
    # load-generating bench process to the last core — the minimal
    # approximation of an off-host load generator on one VM (the round-5
    # campaign measured the native p99 tail to be client/server core
    # collisions, not scoring)
    import os as _os

    isolate = _os.environ.get("BENCH_SERVING_ISOLATE") == "1"
    ncpu = _os.cpu_count() or 4
    if isolate and ncpu >= 2:
        server_cpus = set(range(ncpu - 1))
        _os.sched_setaffinity(0, {ncpu - 1})  # client core
        _os.environ.setdefault("NATIVE_TILE_THREADS", str(max(1, ncpu - 2)))
        _os.environ.setdefault("NATIVE_SCORING_PERMITS",
                               str(max(1, ncpu - 2)))
    with tempfile.TemporaryDirectory() as td:
        art = export_native(Path(td) / "m", din)
        nproc, nport = start_native_server(art, n_threads=args.threads)
        if isolate and ncpu >= 2:
            try:
                _os.sched_setaffinity(nproc.pid, server_cpus)
            except Exception:
                pass

        # python tier in its OWN process (launch.py, the container entry
        # point) — an in-process aiohttp app would share the GIL with the
        # hammer threads and measure the client, not the server
        import os
        import socket
        import subprocess
        import sys

        serialization.save_online(td + "/py", din)
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            pport = s.getsockname()[1]
        env = dict(os.environ, SERVING_KIND="online",
                   ARTIFACT_PATH=td + "/py", PORT=str(pport),
                   REDIS_HOST="", JAX_PLATFORMS="cpu",
                   PALLAS_AXON_POOL_IPS="")
        pproc = subprocess.Popen(
            [sys.executable, "-m", "librecommender_tpu.serving.launch"],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        if isolate and ncpu >= 2:
            try:
                os.sched_setaffinity(pproc.pid, server_cpus)
            except Exception:
                pass
        for _ in range(600):  # model load + first jit can take a while
            try:
                _post(pport, "/online/recommend", online_payloads[0])
                break
            except Exception:
                time.sleep(0.5)

        _post(nport, "/model/recommend", model_payloads[0])
        _post(pport, "/online/recommend", model_payloads[0])

        rows = {k: [] for k in
                ("native_model", "native_online", "py_model", "py_online")}
        try:
            for rnd in range(args.rounds):
                rows["native_model"].append(hammer(
                    nport, "/model/recommend", model_payloads,
                    args.threads, args.requests))
                rows["py_model"].append(hammer(
                    pport, "/online/recommend", model_payloads,
                    args.threads, args.requests))
                rows["native_online"].append(hammer(
                    nport, "/online/recommend", online_payloads,
                    args.threads, args.requests))
                rows["py_online"].append(hammer(
                    pport, "/online/recommend", online_payloads,
                    args.threads, args.requests))
                print(f"round {rnd}:",
                      {k: v[-1] for k, v in rows.items()}, flush=True)
        finally:
            nproc.kill()
            nproc.wait()
            pproc.kill()
            pproc.wait()

        out = {
            k: {m: round(median_of(v, m), 2)
                for m in ("req_per_s", "p50_ms", "p99_ms")}
            for k, v in rows.items()
        }
        print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

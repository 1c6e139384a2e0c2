"""Serving-tier throughput bench: native C++ server vs Python aiohttp apps.

The reference ships load-test tools without published numbers
(libserving/sanic_serving/benchmark.py, actix_serving/src/bin/benchmark.rs);
this measures ours on the ML-1M-scale synthetic: requests/s and p50/p99
latency for the knn and embed endpoint families, native vs Python, over
N concurrent client threads of sequential POSTs.

Usage: python parity/bench_serving.py [--requests 2000] [--threads 8]
"""
import argparse
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd


def _post(port, url, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{url}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def hammer(port, url, payloads, n_threads, n_requests):
    """n_threads workers issue sequential POSTs over PERSISTENT (keep-alive)
    connections until n_requests total — one http.client connection per
    worker, mirroring a production client pool (both tiers speak HTTP/1.1
    keep-alive; per-request TCP setup would otherwise dominate)."""
    import http.client

    latencies = []
    lock = threading.Lock()
    counter = {"n": 0}

    def worker(tid):
        rng = np.random.default_rng(tid)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        local = []
        while True:
            with lock:
                if counter["n"] >= n_requests:
                    break
                counter["n"] += 1
            payload = payloads[rng.integers(0, len(payloads))]
            body = json.dumps(payload)
            t0 = time.perf_counter()
            try:
                conn.request("POST", url, body=body,
                             headers={"Content-Type": "application/json"})
                resp = conn.getresponse()
                resp.read()
            except Exception:
                conn.close()
                conn = http.client.HTTPConnection(
                    "127.0.0.1", port, timeout=30
                )
                continue
            local.append(time.perf_counter() - t0)
        conn.close()
        with lock:
            latencies.extend(local)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat = np.sort(latencies)
    return {
        "req_per_s": round(len(lat) / wall, 1),
        "p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 2),
        "p99_ms": round(float(lat[int(len(lat) * 0.99)]) * 1e3, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=2000)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--data", default="/tmp/synth_ml1m")
    args = ap.parse_args()

    from librecommender_tpu.data import DatasetPure
    from librecommender_tpu.models import BPR, ItemCF
    from librecommender_tpu.serving.native_server import (
        export_native,
        start_native_server,
    )
    from librecommender_tpu.serving import serialization, store
    from librecommender_tpu.serving.app import create_app

    train_df = pd.read_csv(Path(args.data) / "train.csv")[
        ["user", "item", "label", "time"]
    ]
    train, data_info = DatasetPure.build_trainset(train_df)
    users = list(data_info.user2id.keys())
    payloads = [
        {"user": int(u), "n_rec": 10}
        for u in np.random.default_rng(0).choice(users, 256)
    ]
    results = {}

    def native_hammer(port, url, n=None):
        """Drive the server with the C++ load generator (one persistent
        connection per thread) — measures the SERVER, not the Python GIL."""
        import subprocess

        from librecommender_tpu.serving.native_server import build_benchmark

        bench_bin = build_benchmark()
        out = subprocess.run(
            [str(bench_bin), "127.0.0.1", str(port), url,
             str(args.threads), str(n or max(args.requests * 10, 50000)),
             str(len(users))],
            capture_output=True, text=True, timeout=600,
        )
        return json.loads(out.stdout)

    # ----- knn family (ItemCF) -----
    cf = ItemCF("ranking", data_info, k_sim=20)
    cf.fit(train, neg_sampling=True, verbose=0)
    with tempfile.TemporaryDirectory() as td:
        art = export_native(Path(td) / "knn", cf)
        proc, port = start_native_server(art, n_threads=args.threads)
        try:
            _post(port, "/knn/recommend", payloads[0])  # warmup
            results["native_knn"] = hammer(
                port, "/knn/recommend", payloads, args.threads, args.requests
            )
            results["native_knn_cpp_client"] = native_hammer(
                port, "/knn/recommend"
            )
        finally:
            proc.kill()
            proc.wait()

    # ----- embed family (BPR) -----
    bpr = BPR("ranking", data_info, embed_size=64, n_epochs=1, batch_size=8192)
    bpr.fit(train, neg_sampling=True, verbose=0)
    with tempfile.TemporaryDirectory() as td:
        art = export_native(Path(td) / "embed", bpr)
        proc, port = start_native_server(art, n_threads=args.threads)
        try:
            _post(port, "/embed/recommend", payloads[0])
            results["native_embed"] = hammer(
                port, "/embed/recommend", payloads, args.threads, args.requests
            )
            results["native_embed_cpp_client"] = native_hammer(
                port, "/embed/recommend"
            )
        finally:
            proc.kill()
            proc.wait()

    # ----- model/online families (DIN, in-process native program) -----
    from librecommender_tpu.data import DatasetFeat
    from librecommender_tpu.models import DIN

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
    model_payloads = [
        {"user": int(u), "n_rec": 10}
        for u in rng.choice(feat_users, 256)
    ]
    items_pool = list(feat_info.item2id.keys())
    online_payloads = [
        {"user": int(u), "n_rec": 10,
         "seq": [int(i) for i in rng.choice(items_pool, 5)],
         "user_feats": {"sex": "f", "age": 0.3}}
        for u in rng.choice(feat_users, 256)
    ]
    with tempfile.TemporaryDirectory() as td:
        art = export_native(Path(td) / "model", din)
        proc, port = start_native_server(art, n_threads=args.threads)
        try:
            _post(port, "/model/recommend", model_payloads[0])  # warmup
            results["native_model"] = hammer(
                port, "/model/recommend", model_payloads,
                args.threads, args.requests,
            )
            _post(port, "/online/recommend", online_payloads[0])
            results["native_online"] = hammer(
                port, "/online/recommend", online_payloads,
                args.threads, args.requests,
            )
            # model requests are ms-scale (full catalog forward), not
            # the us-scale knn/embed lookups: size the C++ load run down
            results["native_model_cpp_client"] = native_hammer(
                port, "/model/recommend", n=args.requests
            )
        finally:
            proc.kill()
            proc.wait()

    # ----- python aiohttp tier (same models) -----
    try:
        from aiohttp import web

        for name, model, kind, kind_payloads in (
                ("py_knn", cf, "knn", payloads),
                ("py_embed", bpr, "embed", payloads),
                ("py_online", din, "online", online_payloads)):
            payloads = kind_payloads
            with tempfile.TemporaryDirectory() as td:
                serialize = getattr(serialization, f"save_{kind}")
                serialize(td, model)
                st = store.DictStore()
                getattr(store, f"{kind}2store")(td, st)
                app = create_app(kind, st)
                runner = web.AppRunner(app)
                import asyncio

                loop = asyncio.new_event_loop()

                def run_loop(loop=loop, runner=runner):
                    asyncio.set_event_loop(loop)
                    loop.run_until_complete(runner.setup())
                    site = web.TCPSite(runner, "127.0.0.1", 0)
                    loop.run_until_complete(site.start())
                    ports = [
                        s.getsockname()[1]
                        for s in site._server.sockets  # noqa: SLF001
                    ]
                    loop.call_soon(ports_box.append, ports[0])
                    loop.run_forever()

                ports_box = []
                th = threading.Thread(target=run_loop, daemon=True)
                th.start()
                for _ in range(100):
                    if ports_box:
                        break
                    time.sleep(0.05)
                port = ports_box[0]
                _post(port, f"/{kind}/recommend", payloads[0])
                results[name] = hammer(
                    port, f"/{kind}/recommend", payloads,
                    args.threads, args.requests,
                )
                loop.call_soon_threadsafe(loop.stop)
    except Exception as exc:  # noqa: BLE001
        results["python_tier_error"] = str(exc)[:200]

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

"""Serving latency/throughput benchmark (reference parity:
libserving/sanic_serving/benchmark.py + actix_serving/src/bin/benchmark.rs).

Usage:
    python -m librecommender_tpu.serving.benchmark --url http://127.0.0.1:8000 \
        --endpoint /embed/recommend --n-requests 2000 --concurrency 32 \
        --users 1 2 3
"""
import argparse
import asyncio
import json
import time

import numpy as np


async def _worker(session, url, payloads, latencies, it):
    while True:
        idx = next(it, None)
        if idx is None:
            return
        t0 = time.perf_counter()
        async with session.post(url, json=payloads[idx % len(payloads)]) as resp:
            await resp.read()
            assert resp.status == 200
        latencies.append(time.perf_counter() - t0)


async def run_benchmark(url, payloads, n_requests, concurrency):
    import aiohttp

    latencies = []
    it = iter(range(n_requests))
    t0 = time.perf_counter()
    async with aiohttp.ClientSession() as session:
        await asyncio.gather(*[
            _worker(session, url, payloads, latencies, it)
            for _ in range(concurrency)
        ])
    wall = time.perf_counter() - t0
    lat = np.asarray(latencies) * 1000.0
    return {
        "requests": len(lat),
        "wall_s": round(wall, 2),
        "rps": round(len(lat) / wall, 1),
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p95_ms": round(float(np.percentile(lat, 95)), 2),
        "p99_ms": round(float(np.percentile(lat, 99)), 2),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--url", default="http://127.0.0.1:8000")
    parser.add_argument("--endpoint", default="/embed/recommend")
    parser.add_argument("--n-requests", type=int, default=1000)
    parser.add_argument("--concurrency", type=int, default=16)
    parser.add_argument("--n-rec", type=int, default=10)
    parser.add_argument("--users", type=int, nargs="+", default=[1])
    args = parser.parse_args()
    payloads = [{"user": u, "n_rec": args.n_rec} for u in args.users]
    result = asyncio.run(
        run_benchmark(
            args.url + args.endpoint, payloads, args.n_requests, args.concurrency
        )
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()

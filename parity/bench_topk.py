"""Timing harness: pallas_topk vs the XLA materializing path.

Timing-integrity protocol: varied inputs per rep (regenerated keys) plus a
forced readback of a reduced scalar, so neither caching nor async dispatch
inflates numbers. Run serially (one TPU client at a time).
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from librecommender_tpu.ops.pallas_topk import pallas_topk


def xla_topk(u, v, k):
    return jax.lax.top_k(u @ v.T, k)


def timeit(fn, args_fn, reps=5):
    # warmup / compile
    out = fn(*args_fn(0))
    jax.block_until_ready(out)
    times = []
    for r in range(1, reps + 1):
        args = args_fn(r)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[1]))  # forced readback
        times.append(time.perf_counter() - t0)
    return min(times), sum(times) / len(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--u", type=int, default=256)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--tile-n", type=int, default=2048)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    U, N, D, K = args.u, args.n, args.d, args.k
    N_pad = -(-N // args.tile_n) * args.tile_n

    def make(r):
        ku, kv = jax.random.split(jax.random.PRNGKey(r))
        u = jax.random.normal(ku, (U, D), jnp.float32)
        v = jax.random.normal(kv, (N_pad, D), jnp.float32)
        v = v.at[N:].set(-1e9)
        return u, v

    dt = jnp.bfloat16 if args.bf16 else None
    pl_fn = jax.jit(
        lambda u, v: pallas_topk(u, v, K, tile_n=args.tile_n, compute_dtype=dt)
    )
    t_min, t_avg = timeit(pl_fn, make, args.reps)
    print(f"pallas  min {t_min*1e3:8.2f} ms  avg {t_avg*1e3:8.2f} ms")

    if not args.skip_xla:
        xla_fn = jax.jit(lambda u, v: xla_topk(u, v, K))
        x_min, x_avg = timeit(xla_fn, make, args.reps)
        print(f"xla     min {x_min*1e3:8.2f} ms  avg {x_avg*1e3:8.2f} ms")
        print(f"ratio (xla/pallas, >1 = pallas wins): {x_min/t_min:.2f}x")

    if not args.skip_xla:
        # correctness spot check (materializes the score matrix — only at
        # sizes where the XLA path fits)
        u, v = make(0)
        ids_p, sc_p = pl_fn(u, v)
        sc_x, ids_x = xla_topk(u, v, K)
        agree = float(jnp.mean((ids_p == ids_x).astype(jnp.float32)))
        print(f"id agreement vs lax.top_k: {agree:.4f}")


if __name__ == "__main__":
    main()

"""Microbench: alternatives to XLA's embedding-grad scatter-add.

The per-index-row floor (~7ns/row, PARITY.md) makes the backward
scatter-adds the largest step component for BPR/DIN. Candidates measured
here, all computing ``out[v] = sum_{i: ids[i]==v} grads[i]``:

  scatter        zeros.at[ids].add(grads)            (the XLA floor)
  onehot_f32     one_hot(ids).T @ grads, f32         (XLA, materializes one-hot)
  onehot_bf16    same with bf16 one-hot/grads        (XLA)
  pallas_bf16    fused kernel: one-hot generated in VMEM (never HBM),
                 bf16 MXU matmul, f32 accumulate
  pallas_f32     same with f32 (v5e decomposes f32 matmul -> ~3x bf16 cost)

Cost model: matmul does 2*V*D flops per scattered row, so the MXU path
wins only when V*D is small — at D=64 and bf16 peak the crossover is
V ~= 10-20k rows. Bench tables (V=3.7k/6k) sit below it.

Timing: R scatter ops inside ONE jitted fori_loop (per-op time = total/R),
ids varied per iteration via fold_in, checksummed readback — immune to
tunnel dispatch latency and CSE.
"""
import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def pallas_segsum(ids, grads, n_rows, tile_v=256, dtype=jnp.bfloat16):
    """(B,) int32 ids + (B, D) grads -> (V, D) f32 segment sum via fused
    one-hot MXU matmul; the (TV, B) one-hot tile lives only in VMEM."""
    B, D = grads.shape
    V = -(-n_rows // tile_v) * tile_v

    def kernel(ids_ref, grads_ref, out_ref):
        v0 = pl.program_id(0) * tile_v
        iota = jax.lax.broadcasted_iota(jnp.int32, (tile_v, B), 0) + v0
        onehot = (iota == ids_ref[0, :][None, :]).astype(dtype)
        out_ref[:, :] = jnp.dot(
            onehot, grads_ref[:, :].astype(dtype),
            preferred_element_type=jnp.float32,
        )

    out = pl.pallas_call(
        kernel,
        grid=(V // tile_v,),
        in_specs=[
            pl.BlockSpec((1, B), lambda v: (0, 0)),
            pl.BlockSpec((B, D), lambda v: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_v, D), lambda v: (v, 0)),
        out_shape=jax.ShapeDtypeStruct((V, D), jnp.float32),
    )(ids.reshape(1, B), grads)
    return out[:n_rows]


def make_variants(V, B, D):
    def scatter(ids, grads):
        return jnp.zeros((V, D), jnp.float32).at[ids].add(grads)

    def onehot(ids, grads, dt):
        oh = (ids[:, None] == jnp.arange(V)[None, :]).astype(dt)  # (B, V)
        return jnp.dot(oh.T, grads.astype(dt), preferred_element_type=jnp.float32)

    return {
        "scatter": scatter,
        "onehot_f32": lambda i, g: onehot(i, g, jnp.float32),
        "onehot_bf16": lambda i, g: onehot(i, g, jnp.bfloat16),
        "pallas_bf16": lambda i, g: pallas_segsum(i, g, V, dtype=jnp.bfloat16),
        "pallas_f32": lambda i, g: pallas_segsum(i, g, V, dtype=jnp.float32),
    }


def time_op(op, V, B, D, reps=200):
    grads = jax.random.normal(jax.random.PRNGKey(0), (B, D), jnp.float32)

    @jax.jit
    def prog(key, grads):
        def body(i, acc):
            ids = jax.random.randint(
                jax.random.fold_in(key, i), (B,), 0, V, jnp.int32
            )
            out = op(ids, grads)
            return acc + out[0, 0]
        return jax.lax.fori_loop(0, reps, body, 0.0)

    # subtract the id-generation overhead measured with a free op
    out = prog(jax.random.PRNGKey(1), grads)
    jax.block_until_ready(out)
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        out = prog(jax.random.PRNGKey(2 + r), grads)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--reps", type=int, default=200)
    args = ap.parse_args()
    D = args.d

    # correctness first
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (8192,), 0, 3700, jnp.int32)
    grads = jax.random.normal(key, (8192, D), jnp.float32)
    ref = jnp.zeros((3712, D), jnp.float32).at[ids].add(grads)
    got = pallas_segsum(ids, grads, 3712, dtype=jnp.float32)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"pallas_f32 max rel err vs scatter: {err:.2e}")
    got16 = pallas_segsum(ids, grads, 3712, dtype=jnp.bfloat16)
    err16 = float(jnp.max(jnp.abs(ref - got16)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"pallas_bf16 max rel err vs scatter: {err16:.2e}")

    # baseline loop overhead (op = ids sum, no scatter)
    for V, B in [(3712, 8192), (3712, 16384), (6144, 8192), (16384, 8192),
                 (131072, 8192)]:
        print(f"\nV={V} B={B} D={D}")
        variants = make_variants(V, B, D)
        if V > 20000:  # one-hot paths blow VMEM/time at big V
            variants = {k: v for k, v in variants.items()
                        if k in ("scatter", "pallas_bf16")}
        for name, op in variants.items():
            try:
                t = time_op(op, V, B, D, args.reps)
                print(f"  {name:12s} {t*1e6:8.1f} us  ({t/B*1e9:5.2f} ns/row)")
            except Exception as exc:
                print(f"  {name:12s} FAILED: {type(exc).__name__}: {str(exc)[:120]}")


if __name__ == "__main__":
    main()

"""MXU-matmul embedding gather / segment-sum (Pallas).

Why: profiled BPR training (BENCH_r03) spends ~90% of device time in
gather/scatter/sort ops at ~5% of HBM bandwidth — TPU gathers and
scatter-adds pay a per-index-row cost (~7 ns/row) regardless of row width,
so embedding lookups and their backward scatter-adds are the step's floor.

The fix for small/medium vocabularies: express the lookup as a one-hot
matmul. A (B,) gather from a (R, D) table is ``onehot(B, R) @ table``; its
transpose (the gradient scatter-add) is ``onehot.T @ grads``. On the MXU
those run at matmul speed — and these kernels generate the one-hot TILES
ON THE FLY in VMEM (ids vs iota compare), so the (B, R) one-hot never
touches HBM. HBM traffic is just ids + table + output; the arithmetic is
B*R*D MACs plus B*R one-hot compares on the VPU, so the form wins only
for small vocabularies — measured crossover on a v5e is R ~ 2k
(docs/tpu_performance.md "scatter floor" study).

``mxu_gather(table, ids)`` is a drop-in for ``table[ids]`` with a
custom_vjp whose backward is the segment-sum kernel, so a training step
that routes its table lookups through it contains NO gather/scatter ops
for those tables. Duplicate ids sum in fixed tile order (deterministic,
but a different float association than XLA's scatter-add — equal to
~1 ulp). Off-TPU backends run the same kernels under the Pallas
interpreter, keeping CPU tests exact.

Reference counterpart being beaten: the Cython Hogwild row updates
(_bpr.pyx:30) — the reference's answer to the same per-row cost on CPU.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row-tile of the table axis; tables are padded to multiples of this
# (parallel/mesh.ROW_ALIGN) so the grid needs no remainder masking
ROW_TILE = 128
# measured crossover vs the per-row gather/scatter floor on a v5e (see
# docs/tpu_performance.md): at R=6144/B=16384 the best-tiled kernel runs
# 288us vs 183us for the plain gather (compare+dot work scales with R);
# the one-hot form wins only for small vocabularies
AUTO_MAX_ROWS = 2048


def _interpret():
    return jax.default_backend() != "tpu"


def _batch_tile(b):
    # larger batch tiles amortize per-grid-step overhead (tile sweep on
    # v5e: TB=512 -> 663us, TB=2048 -> ~300us at R=6144)
    for t in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if b % t == 0:
            return t
    return None


def _row_tile(r):
    # whole table per block when it fits VMEM comfortably (the auto path
    # caps tables at AUTO_MAX_ROWS anyway); 128-row tiles otherwise
    return r if r <= 8192 else ROW_TILE


def _gather_kernel(ids_ref, table_ref, out_ref, *, row_tile):
    j = pl.program_id(1)
    ids = ids_ref[:, 0]                                   # (TB,)
    rows = j * row_tile + jax.lax.broadcasted_iota(
        jnp.int32, (1, row_tile), 1
    )                                                     # (1, TR)
    onehot = (ids[:, None] == rows).astype(jnp.float32)   # (TB, TR)
    part = jnp.dot(onehot, table_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = part

    @pl.when(j != 0)
    def _():
        out_ref[:] = out_ref[:] + part


def _segsum_kernel(ids_ref, vals_ref, out_ref, *, row_tile):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ids = ids_ref[:, 0]                                   # (TB,)
    rows = i * row_tile + jax.lax.broadcasted_iota(
        jnp.int32, (row_tile, 1), 0
    )                                                     # (TR, 1)
    onehot_t = (rows == ids[None, :]).astype(jnp.float32)  # (TR, TB)
    part = jnp.dot(onehot_t, vals_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = part

    @pl.when(j != 0)
    def _():
        out_ref[:] = out_ref[:] + part


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_call(table, ids, interpret=False):
    R, D = table.shape
    B = ids.shape[0]
    TB, TR = _batch_tile(B), _row_tile(R)
    ids2 = ids.astype(jnp.int32).reshape(B, 1)
    return pl.pallas_call(
        functools.partial(_gather_kernel, row_tile=TR),
        grid=(B // TB, R // TR),
        in_specs=[
            pl.BlockSpec((TB, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, D), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        interpret=interpret,
    )(ids2, table)


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _segsum_call(ids, vals, n_rows, interpret=False):
    B, D = vals.shape
    TB, TR = _batch_tile(B), _row_tile(n_rows)
    ids2 = ids.astype(jnp.int32).reshape(B, 1)
    return pl.pallas_call(
        functools.partial(_segsum_kernel, row_tile=TR),
        grid=(n_rows // TR, B // TB),
        in_specs=[
            pl.BlockSpec((TB, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, D), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, D), jnp.float32),
        interpret=interpret,
    )(ids2, vals)


def _rows_ok(r):
    # whole-table blocks need f32 sublane alignment (8); tiled tables 128
    return (r % 8 == 0) if r <= 8192 else (r % ROW_TILE == 0)


def segment_sum_mxu(ids, vals, n_rows):
    """``zeros((n_rows, D)).at[ids].add(vals)`` as on-the-fly one-hot
    matmuls (no scatter). Requires aligned rows and a tileable batch;
    falls back to the scatter-add otherwise."""
    if not _rows_ok(n_rows) or _batch_tile(ids.shape[0]) is None:
        return jnp.zeros((n_rows, vals.shape[1]), vals.dtype).at[ids].add(vals)
    return _segsum_call(ids, vals, n_rows, interpret=_interpret())


@jax.custom_vjp
def mxu_gather(table, ids):
    """Drop-in ``table[ids]`` whose forward AND backward run as MXU
    matmuls (see module doc). table (R, D) f32, ids (B,) int -> (B, D)."""
    return _gather_call(table, ids, interpret=_interpret())


def _mxu_gather_fwd(table, ids):
    return mxu_gather(table, ids), (ids, table.shape[0])


def _mxu_gather_bwd(res, g):
    ids, n_rows = res
    return segment_sum_mxu(ids, g, n_rows), None


mxu_gather.defvjp(_mxu_gather_fwd, _mxu_gather_bwd)


def table_lookup(table, ids, use_mxu):
    """``table[ids]`` or the MXU form; ids of any shape (flattened and
    restored around the kernel's (B,) contract)."""
    if not use_mxu or not _rows_ok(table.shape[0]):
        return table[ids]
    flat = ids.reshape(-1)
    if _batch_tile(flat.shape[0]) is None:
        return table[ids]
    out = mxu_gather(table, flat)
    return out.reshape(*ids.shape, table.shape[1])


def auto_enable(n_rows_per_table, requested):
    """Resolve an ``mxu_gather`` model knob: True/False are explicit;
    "auto" enables on TPU when every table is under the crossover size."""
    if requested in (True, False):
        return requested
    return (jax.default_backend() == "tpu"
            and max(n_rows_per_table) <= AUTO_MAX_ROWS)

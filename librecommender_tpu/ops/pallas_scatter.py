"""Pallas TPU kernel: streaming scatter-add of row gradients into a
VMEM-resident embedding-table accumulator.

Targets the SIM long-history backward (docs/tpu_performance.md "SIM
long-history floor"): XLA lowers ``zeros(R, D).at[ids].add(rows)`` for
N=B*L gathered rows to a scalar-core-driven dynamic-update-slice loop
measured at ~7.1 ns/row — 22x above the pure HBM cost of streaming the
(N, D) rows once. When the table fits VMEM (R*D*4 well under the ~64 MB
v5e VMEM), this kernel keeps the ACCUMULATOR on-chip and streams the row
gradients through the implicit grid pipeline (block DMA double-buffered
by Pallas), so HBM sees each gradient row exactly once and the table
once at the end; the per-row accumulate is a VPU add into VMEM.

Reference counterpart: the embedding-gradient sparse apply inside TF's
``tf.scatter_add``-based optimizers (libreco's TF1 graphs); here it is
the backward of the long-history token gather (models/sim.py).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(ids_ref, rows_ref, acc_ref, *, chunk, n_valid):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    base = step * chunk

    def body(j, _):
        @pl.when(base + j < n_valid)
        def _():
            r = ids_ref[j]
            acc_ref[r, :] += rows_ref[j, :]
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


# table bytes that comfortably coexist with the streamed chunks in VMEM
VMEM_TABLE_LIMIT = 8 << 20

# tests flip this to run the backward kernel in the Pallas interpreter on
# CPU (exact); production leaves it False
_INTERPRET = False


@functools.lru_cache(maxsize=None)
def _gather_rows_op(n_rows):
    @jax.custom_vjp
    def f(table, ids):
        return table[ids]

    def fwd(table, ids):
        return table[ids], ids

    def bwd(ids, g):
        d = g.shape[-1]
        grad = scatter_add_rows(
            ids.reshape(-1), g.reshape(-1, d).astype(jnp.float32),
            n_rows, interpret=_INTERPRET,
        )
        return grad.astype(g.dtype), None

    f.defvjp(fwd, bwd)
    return f


def gather_rows(table, ids):
    """``table[ids]`` whose BACKWARD scatter-add runs through the
    VMEM-accumulator kernel instead of XLA's autodiff scatter. Forward is
    the plain XLA gather (already at the per-row floor). Use when the
    table fits VMEM and ids count >> table rows — the SIM long-history
    regime (N = B*L = 110x the table rows at bench geometry)."""
    return _gather_rows_op(int(table.shape[0]))(table, ids)


def use_pallas_grad_scatter(table_shape, n_ids):
    """Auto gate: TPU backend, table fits the VMEM accumulator, and the
    gather is in the many-rows-per-table-row regime where the autodiff
    scatter dominates the step."""
    r, d = table_shape
    return (
        jax.default_backend() == "tpu"
        and r * d * 4 <= VMEM_TABLE_LIMIT
        and n_ids >= 4 * r
    )


@functools.partial(
    jax.jit, static_argnames=("n_rows", "chunk", "interpret")
)
def scatter_add_rows(ids, rows, n_rows, chunk=2048, interpret=False):
    """``zeros((n_rows, D)).at[ids].add(rows)`` with the accumulator held
    in VMEM. ``ids``: (N,) int32; ``rows``: (N, D) f32. N is padded up to
    a chunk multiple internally; padded slots are masked off in-kernel."""
    n, d = rows.shape
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        ids = jnp.pad(ids, (0, n_pad - n))
        rows = jnp.pad(rows, ((0, n_pad - n), (0, 0)))
    grid = n_pad // chunk
    return pl.pallas_call(
        functools.partial(_scatter_kernel, chunk=chunk, n_valid=n),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((n_rows, d), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_rows, d), rows.dtype),
        interpret=interpret,
    )(ids.astype(jnp.int32), rows)

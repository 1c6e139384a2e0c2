"""Device-mesh construction and sharding rules.

This layer has no reference counterpart (the reference is single-process;
SURVEY.md §2.7): scaling is first-class here. The design follows the
standard JAX recipe: a 2D ``Mesh(('data', 'model'))``; batches shard over
``data`` (pure DP); embedding tables row-shard over ``model`` so huge vocabs
split across devices, with XLA inserting the all-to-all / all-gather
collectives for gathers and scatter-add gradient updates over ICI.
"""
import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Embedding-table leaf names that are row-sharded over the model axis.
TABLE_KEYS = ("user_embed", "item_embed", "sparse_embed")

# All embedding tables allocate row counts rounded up to this multiple so
# they (a) row-shard evenly across any model axis up to this size and
# (b) align with the TPU's 8-sublane tiling. Rows beyond vocab+OOV are
# never indexed; their gradients are zero.
ROW_ALIGN = 8


def aligned_rows(n_ids):
    """Table rows for ``n_ids`` real ids + 1 OOV row, aligned to ROW_ALIGN."""
    return -(-(n_ids + 1) // ROW_ALIGN) * ROW_ALIGN


def build_mesh(n_devices=None, model_parallel=1, devices=None):
    """2D mesh (data, model); model_parallel=1 degenerates to pure DP."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = devices.size
    assert n % model_parallel == 0, (n, model_parallel)
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def param_spec(path_key):
    """PartitionSpec for a params leaf by its dict key.

    Embedding tables are row-sharded over `model`; small dense params are
    replicated (their grads all-reduce over `data`).
    """
    if any(k in path_key for k in TABLE_KEYS):
        return P("model")
    return P()


def _leaf_specs(params):
    def spec_for(path, leaf):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        return param_spec(key)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh):
    """Place a params pytree on the mesh per `param_spec` rules."""
    specs = _leaf_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def params_shardings(params, mesh):
    specs = _leaf_specs(params)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs)


def shard_batch(batch, mesh):
    """Shard every batch array over the data axis (first dim)."""
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def batch_shardings(batch, mesh):
    sharding = NamedSharding(mesh, P("data"))
    return {k: sharding for k in batch}

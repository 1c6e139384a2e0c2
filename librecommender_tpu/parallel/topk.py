"""Distributed full-catalog top-k over row-sharded item embeddings.

No reference counterpart (SURVEY.md §2.7): the reference scores the whole
catalog on one process. Here item embeddings are row-sharded over the mesh's
devices; each shard computes local scores + local top-k, candidates are
all-gathered (k per shard, not the full catalog), and the global top-k is the
merge — the standard sharded-retrieval recipe, expressed with `shard_map` so
the collective rides ICI.
"""
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

shard_map = jax.shard_map


def distributed_topk(user_embeds, item_embeds, k, mesh, axis="model",
                     n_items=None):
    """user_embeds (U, D) replicated; item_embeds (N, D) row-sharded over
    ``axis``. Returns (ids (U, k), scores (U, k)) global.

    N is padded internally to a multiple of the axis size; padded rows are
    masked out of every shard's local top-k.
    """
    import numpy as np

    n_shards = mesh.shape[axis]
    item_embeds = np.asarray(item_embeds, np.float32)
    N = item_embeds.shape[0]
    n_items = N if n_items is None else n_items
    pad = -N % n_shards
    if pad:
        item_embeds = np.pad(item_embeds, ((0, pad), (0, 0)))
        N += pad
    shard_size = N // n_shards

    def local_fn(u, v):
        # u: (U, D) replicated; v: (shard_size, D) local rows
        shard_idx = jax.lax.axis_index(axis)
        scores = u @ v.T                                      # (U, shard)
        local_ids = jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 1
        ) + shard_idx * shard_size
        scores = jnp.where(local_ids < n_items, scores, -jnp.inf)
        loc_scores, loc_ids = jax.lax.top_k(scores, min(k, shard_size))
        glob_ids = loc_ids + shard_idx * shard_size
        # gather candidates from every shard
        all_scores = jax.lax.all_gather(loc_scores, axis, axis=0)  # (S, U, k)
        all_ids = jax.lax.all_gather(glob_ids, axis, axis=0)
        S, U, kk = all_scores.shape
        cat_scores = jnp.transpose(all_scores, (1, 0, 2)).reshape(U, S * kk)
        cat_ids = jnp.transpose(all_ids, (1, 0, 2)).reshape(U, S * kk)
        best_scores, pos = jax.lax.top_k(cat_scores, k)
        best_ids = jnp.take_along_axis(cat_ids, pos, axis=1)
        return best_ids, best_scores

    spec_rep = P()
    spec_shard = P(axis)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec_rep, spec_shard),
        out_specs=(spec_rep, spec_rep),
        axis_names={axis},
        check_vma=False,  # post-all_gather results are replicated over `axis`
    )
    return jax.jit(fn)(
        jnp.asarray(user_embeds, jnp.float32), jnp.asarray(item_embeds, jnp.float32)
    )

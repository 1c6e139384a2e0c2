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


def distributed_topk(user_embeds, item_embeds, k, mesh, axis="model"):
    """user_embeds (U, D) replicated; item_embeds (N, D) row-sharded over
    ``axis``. Returns (ids (U, k), scores (U, k)) global.

    N must divide by the axis size (tables are ROW_ALIGN-padded; pad rows
    score -inf via the caller masking or simply never win with -inf rows).
    """
    n_shards = mesh.shape[axis]
    N = item_embeds.shape[0]
    assert N % n_shards == 0, (N, n_shards)
    shard_size = N // n_shards

    def local_fn(u, v):
        # u: (U, D) replicated; v: (shard_size, D) local rows
        scores = u @ v.T                                      # (U, shard)
        loc_scores, loc_ids = jax.lax.top_k(scores, min(k, shard_size))
        shard_idx = jax.lax.axis_index(axis)
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

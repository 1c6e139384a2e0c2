"""Feature-embedding computation over the flat sparse index space.

Reference parity: libreco/tfops/features.py:6-151 (sparse embeds with
multi-sparse combiners sum/mean/sqrtn, dense-value embeddings, sequence
feature aggregation). All lookups are plain gathers on a single flat table —
one embedding matrix indexed by the global offset layout produced by
``feature/sparse.py`` — which XLA turns into efficient dynamic-gathers and,
under pjit, into all-to-all exchanges for row-sharded tables.
"""
import jax.numpy as jnp


def sparse_embeds(table, sparse_indices):
    """Flat-table lookup: (V, D) x (B, F) int -> (B, F, D)."""
    return table[sparse_indices]


def dense_embeds(table, dense_values):
    """Per-field dense embedding scaled by the value.

    table (F_dense, D); dense_values (B, F_dense) -> (B, F_dense, D).
    Mirrors `compute_dense_feats` (libreco/tfops/features.py:121): each dense
    field owns one embedding vector multiplied by the scalar feature value.
    """
    return table[None, :, :] * dense_values[:, :, None]


def combine_multi_sparse(embeds, sparse_indices, multi_sparse_info, combiner):
    """Pool multi-sparse field groups into one embedding per group.

    embeds (B, F, D) laid out per the expanded sparse columns; group g spans
    ``field_offset[g] : field_offset[g] + field_len[g]``. Positions holding
    the group's OOV index (pad) are excluded from mean/sqrtn denominators,
    matching safe_embedding_lookup_sparse semantics
    (libreco/tfops/features.py:47-90). Returns (B, F', D) with
    F' = F - sum(field_len) + n_groups; non-grouped fields keep their order.
    """
    if combiner == "normal" or multi_sparse_info is None:
        return embeds
    offsets = list(multi_sparse_info.field_offset)
    lens = list(multi_sparse_info.field_len)
    oovs = list(multi_sparse_info.feat_oov)
    in_group = set()
    group_of = {}
    for g, (o, l) in enumerate(zip(offsets, lens)):
        for pos in range(o, o + l):
            in_group.add(pos)
        group_of[o] = g

    pieces = []
    f = 0
    F = embeds.shape[1]
    while f < F:
        if f in group_of:
            g = group_of[f]
            o, l = offsets[g], lens[g]
            seg = embeds[:, o : o + l, :]                       # (B, l, D)
            valid = (sparse_indices[:, o : o + l] != oovs[g]).astype(seg.dtype)
            summed = jnp.sum(seg * valid[:, :, None], axis=1)   # (B, D)
            count = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1.0)
            if combiner == "sum":
                pooled = summed
            elif combiner == "mean":
                pooled = summed / count
            elif combiner == "sqrtn":
                pooled = summed / jnp.sqrt(count)
            else:
                raise ValueError(f"unknown multi_sparse combiner: {combiner}")
            pieces.append(pooled[:, None, :])
            f = o + l
        elif f in in_group:  # pragma: no cover - defensive, offsets cover these
            f += 1
        else:
            pieces.append(embeds[:, f : f + 1, :])
            f += 1
    return jnp.concatenate(pieces, axis=1)


def seq_mask(seq, pad_id):
    """(B, L) int seq -> (B, L) bool valid mask. Sequences are right-aligned
    and padded with ``pad_id`` (= n_items, the item OOV id)."""
    return seq != pad_id


def seq_mean_pool(item_table, seq, pad_id):
    """Mean-pool item embeddings over a behavior sequence, ignoring padding.

    seq (B, L) int inner item ids. Reference `combine_seq_features`
    (libreco/tfops/features.py:151) + YouTubeRanking mean pooling.
    """
    embeds = item_table[seq]                                     # (B, L, D)
    mask = (seq != pad_id).astype(embeds.dtype)
    summed = jnp.sum(embeds * mask[:, :, None], axis=1)
    return summed / jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)

"""On-device full-catalog scoring and top-k retrieval.

Replaces the reference's numpy argpartition ranking
(libreco/recommendation/ranking.py:10,76) and its nmslib/faiss ANN indexes
(libreco/bases/embed_base.py:415) with exact blocked matmul + `lax.top_k` on
TPU. Consumed-item filtering happens on device via a padded consumed matrix;
the host only receives the final (k) ids/scores per user.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(3,))
def _topk_scores(user_embeds, item_embeds, consumed, k):
    """user_embeds (U, D); item_embeds (N, D); consumed (U, C) int padded
    with -1. Returns (ids, scores) of shape (U, k)."""
    scores = user_embeds @ item_embeds.T                        # (U, N)
    n_items = item_embeds.shape[0]
    if consumed is not None and consumed.shape[1] > 0:
        u_idx = jnp.arange(scores.shape[0])[:, None]
        cols = jnp.clip(consumed, 0, n_items - 1)
        mask_val = jnp.where(consumed >= 0, -jnp.inf, 0.0)
        scores = scores.at[u_idx, cols].add(mask_val)
    top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_ids, top_scores


def topk_from_embeddings(user_embeds, item_embeds, n_rec, user_consumed=None,
                         user_ids=None, filter_consumed=True):
    """Exact top-n_rec per user with optional consumed filtering.

    Parameters are host numpy; computation runs jitted on device. ``k`` is
    padded to n_rec (consumed filtering is applied to the score matrix before
    top-k, so no over-fetch is needed).
    """
    user_embeds = jnp.asarray(np.atleast_2d(user_embeds), dtype=jnp.float32)
    item_embeds = jnp.asarray(item_embeds, dtype=jnp.float32)
    consumed = None
    if filter_consumed and user_consumed is not None and user_ids is not None:
        consumed = pad_consumed(user_consumed, user_ids)
    ids, scores = _topk_scores(user_embeds, item_embeds, consumed, int(n_rec))
    return np.asarray(ids), np.asarray(scores)


def pad_consumed(user_consumed, user_ids):
    """Build a (U, C) consumed matrix padded with -1; C is rounded up to a
    power of two so repeated calls reuse one compiled top-k program."""
    lists = [np.asarray(user_consumed.get(int(u), []), dtype=np.int64)
             for u in np.atleast_1d(user_ids)]
    max_len = max((len(c) for c in lists), default=0)
    if max_len == 0:
        return None
    width = 1 << (max_len - 1).bit_length()
    consumed = np.full((len(lists), width), -1, dtype=np.int32)
    for i, c in enumerate(lists):
        consumed[i, : len(c)] = c
    return jnp.asarray(consumed)


@functools.partial(jax.jit, static_argnums=(2,))
def topk_from_scores(scores, consumed, k):
    """Top-k over a precomputed (U, N) score matrix with consumed masking."""
    n_items = scores.shape[1]
    if consumed is not None and consumed.shape[1] > 0:
        u_idx = jnp.arange(scores.shape[0])[:, None]
        cols = jnp.clip(consumed, 0, n_items - 1)
        mask_val = jnp.where(consumed >= 0, -jnp.inf, 0.0)
        scores = scores.at[u_idx, cols].add(mask_val)
    top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_ids, top_scores

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


# above this many score-matrix elements the materializing path strains HBM
# (it OOMs outright at U*N ~ 4e9 on a 16G chip) and the streaming Pallas
# kernel is already ~2x faster (PARITY.md kernel table)
_PALLAS_SCORE_ELEMS = 100_000_000


def topk_from_embeddings(user_embeds, item_embeds, n_rec, user_consumed=None,
                         user_ids=None, filter_consumed=True):
    """Exact top-n_rec per user with optional consumed filtering.

    Parameters are host numpy; computation runs jitted on device. Small
    catalogs score through a materialized (U, N) matrix with on-device
    consumed masking; once U*N crosses ``_PALLAS_SCORE_ELEMS`` on a TPU
    backend the streaming Pallas kernel (ops/pallas_topk.py) takes over —
    it never materializes the score matrix, so the full-catalog recommend
    path keeps working (and 2x faster) at sizes where XLA OOMs. The Pallas
    path over-fetches k = n_rec + consumed_width and filters on host,
    mirroring the reference's serving candidate policy
    (libserving/sanic_serving/online_deploy.py: k = n_rec + len(consumed)).
    """
    user_embeds = np.atleast_2d(np.asarray(user_embeds, dtype=np.float32))
    item_embeds = np.asarray(item_embeds, dtype=np.float32)
    consumed = None
    if filter_consumed and user_consumed is not None and user_ids is not None:
        consumed = pad_consumed(user_consumed, user_ids, n_rec=int(n_rec),
                                n_items=int(item_embeds.shape[0]))

    n_users, n_items = user_embeds.shape[0], item_embeds.shape[0]
    if (
        n_users * n_items >= _PALLAS_SCORE_ELEMS
        and jax.default_backend() == "tpu"
    ):
        return _streaming_topk(user_embeds, item_embeds, n_rec, consumed)

    ids, scores = _topk_scores(
        jnp.asarray(user_embeds), jnp.asarray(item_embeds), consumed,
        int(n_rec),
    )
    return np.asarray(ids), np.asarray(scores)


def _streaming_topk(user_embeds, item_embeds, n_rec, consumed,
                    interpret=False):
    """Pallas streaming branch: over-fetch k = n_rec + max consumed count,
    filter consumed on host (candidate policy of the reference serving tier,
    libserving/sanic_serving/online_deploy.py), trim to n_rec."""
    from .pallas_topk import pallas_topk_padded

    n_users, n_items = user_embeds.shape[0], item_embeds.shape[0]
    width = 0
    if consumed is not None:
        width = int(np.asarray(consumed >= 0).sum(axis=1).max())
    # cap keeps the (tile_u, k) VMEM scratch bounded; a row underfills
    # only if >cap-n_rec of its consumed items land in the global top-cap
    kk = int(n_rec) + width
    if kk > 2048:
        kk = max(int(n_rec), 2048)
    kk = min(n_items, kk)
    ids, scores = pallas_topk_padded(
        user_embeds, item_embeds, kk, interpret=interpret
    )
    if width:
        cons = np.asarray(consumed)
        # drop consumed candidates per row, keep order, trim to n_rec
        keep = ~(ids[:, :, None] == cons[:, None, :]).any(-1)
        out_i = np.zeros((n_users, int(n_rec)), np.int32)
        out_s = np.full((n_users, int(n_rec)), -np.inf, np.float32)
        for r in range(n_users):
            sel = np.flatnonzero(keep[r])[: int(n_rec)]
            out_i[r, : len(sel)] = ids[r, sel]
            out_s[r, : len(sel)] = scores[r, sel]
        return out_i, out_s
    return ids[:, : int(n_rec)], scores[:, : int(n_rec)]


def pad_consumed(user_consumed, user_ids, n_rec=None, n_items=None):
    """Build a (U, C) consumed matrix padded with -1; C is rounded up to a
    power of two so repeated calls reuse one compiled top-k program.

    ``n_rec``/``n_items``: when given, a user whose unconsumed remainder
    can't fill ``n_rec`` gets an EMPTY row — the reference's can't-filter
    passthrough (libreco/recommendation/ranking.py:38 filters only when
    ``n_rec + len(consumed) <= n_items``)."""
    lists = [np.asarray(user_consumed.get(int(u), []), dtype=np.int64)
             for u in np.atleast_1d(user_ids)]
    if n_rec is not None and n_items is not None:
        lists = [c if n_rec + len(c) <= n_items else c[:0] for c in lists]
    max_len = max((len(c) for c in lists), default=0)
    if max_len == 0:
        return None
    width = 1 << (max_len - 1).bit_length()
    consumed = np.full((len(lists), width), -1, dtype=np.int32)
    for i, c in enumerate(lists):
        consumed[i, : len(c)] = c
    return jnp.asarray(consumed)


def topk_lastdim_small(x, k):
    """Exact top-k over a SHORT last axis via an (L, L) rank matrix.

    For short axes (e.g. SIM's GSU soft search over long_max_len<=~200),
    both ``jax.lax.top_k`` (full variadic sort) and k argmax-extraction
    passes lower to slow cross-lane index reductions on TPU (~6 ms/step
    each on (2, 8192, 50)). Ranking by pairwise comparison is pure
    elementwise+reduce: rank[l] = #{j: x_j > x_l} + #{j<l: x_j == x_l}
    (a permutation even under ties, resolving to the lowest index — the
    lax.top_k convention); the top-k values/indices then come from a
    (k, L) one-hot selection. O(L^2) work but single-pass and
    vectorization-friendly."""
    top_vals, top_idx, _ = topk_lastdim_small_onehot(x, k)
    return top_vals, top_idx


def topk_lastdim_small_onehot(x, k):
    """topk_lastdim_small that also returns the (…, k, L) selection
    one-hot, letting callers express the downstream row selection as an
    einsum (whose backward is an einsum too) instead of an advanced-index
    gather + backward scatter-add at the per-index-row floor."""
    L = x.shape[-1]
    gt = x[..., None, :] > x[..., :, None]              # [l, j]: x_j > x_l
    eq = x[..., None, :] == x[..., :, None]
    jlt = jnp.arange(L)[None, :] < jnp.arange(L)[:, None]
    rank = jnp.sum(gt, axis=-1) + jnp.sum(eq & jlt, axis=-1)  # (..., L)
    onehot = rank[..., None, :] == jnp.arange(k)[:, None]     # (..., k, L)
    pos = jnp.arange(L, dtype=jnp.int32)
    top_idx = jnp.sum(jnp.where(onehot, pos, 0), axis=-1, dtype=jnp.int32)
    # where (not multiply) keeps -inf selections exact and NaN-free
    top_vals = jnp.sum(jnp.where(onehot, x[..., None, :], 0.0), axis=-1)
    return top_vals, top_idx, onehot


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

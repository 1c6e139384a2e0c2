"""IVF approximate nearest-neighbor index, on-device.

Reference parity: the faiss IVF index built by `save_faiss_index`
(libserving/serialization/embed.py:42) and the nmslib HNSW option
(libreco/bases/embed_base.py:415) — replaced by a TPU-native inverted-file
index: spherical k-means clustering (Lloyd iterations as jitted matmuls),
padded inverted lists in HBM, and a two-stage search (score centroids →
probe the top `n_probe` clusters → exact dot product over their members).

Sub-linear in the catalog: per query the search scores C centroids +
n_probe * max_cluster_size members instead of all N items.
"""
import functools
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def _kmeans(vectors, n_clusters, iters, rng):
    """Spherical k-means: cosine assignment, mean re-centering."""
    n, d = vectors.shape
    normed = vectors / jnp.maximum(
        jnp.linalg.norm(vectors, axis=1, keepdims=True), 1e-8
    )
    init_idx = jax.random.choice(rng, n, (n_clusters,), replace=False)
    centroids = normed[init_idx]

    def step(centroids, _):
        sims = normed @ centroids.T                         # (N, C)
        assign = jnp.argmax(sims, axis=1)
        one_hot = jax.nn.one_hot(assign, n_clusters, dtype=vectors.dtype)
        sums = one_hot.T @ normed                           # (C, D)
        counts = jnp.sum(one_hot, axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), centroids)
        new = new / jnp.maximum(jnp.linalg.norm(new, axis=1, keepdims=True), 1e-8)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    assign = jnp.argmax(normed @ centroids.T, axis=1)
    return centroids, assign


class IVFIndex:
    """Inverted-file index over item embeddings (inner-product search)."""

    def __init__(self, item_embeds, centroids, lists, counts):
        self.item_embeds = jnp.asarray(item_embeds, jnp.float32)
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.lists = jnp.asarray(lists)        # (C, L) padded with -1
        self.counts = jnp.asarray(counts)
        self.n_items = int(self.item_embeds.shape[0])

    @classmethod
    def build(cls, item_embeds, n_clusters=None, iters=20, seed=0):
        item_embeds = np.asarray(item_embeds, np.float32)
        n = item_embeds.shape[0]
        if n_clusters is None:
            n_clusters = max(4, int(np.sqrt(n)))
        n_clusters = min(n_clusters, n)
        centroids, assign = _kmeans(
            jnp.asarray(item_embeds), n_clusters, iters,
            jax.random.PRNGKey(seed),
        )
        assign = np.asarray(assign)
        counts = np.bincount(assign, minlength=n_clusters)
        max_len = int(counts.max()) if n else 1
        lists = np.full((n_clusters, max_len), -1, np.int32)
        cursor = np.zeros(n_clusters, np.int64)
        for i, c in enumerate(assign):
            lists[c, cursor[c]] = i
            cursor[c] += 1
        return cls(item_embeds, np.asarray(centroids), lists, counts)

    def search(self, queries, k, n_probe=8):
        """(U, D) queries -> (ids (U, k), scores (U, k)); approximate."""
        queries = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        n_probe = min(n_probe, self.centroids.shape[0])
        ids, scores = _ivf_search(
            queries, self.item_embeds, self.centroids, self.lists,
            int(k), int(n_probe),
        )
        return np.asarray(ids), np.asarray(scores)

    # --------------------------------------------------------- persistence
    def save(self, path, name="ivf_index"):
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path / name,
            item_embeds=np.asarray(self.item_embeds),
            centroids=np.asarray(self.centroids),
            lists=np.asarray(self.lists),
            counts=np.asarray(self.counts),
        )
        with open(path / f"{name}_meta.json", "w") as f:
            json.dump(
                {"n_items": self.n_items,
                 "n_clusters": int(self.centroids.shape[0])}, f,
            )

    @classmethod
    def load(cls, path, name="ivf_index"):
        arrays = np.load(Path(path) / f"{name}.npz")
        return cls(arrays["item_embeds"], arrays["centroids"],
                   arrays["lists"], arrays["counts"])


@functools.partial(jax.jit, static_argnames=("k", "n_probe"))
def _ivf_search(queries, item_embeds, centroids, lists, k, n_probe):
    U = queries.shape[0]
    c_scores = queries @ centroids.T                        # (U, C)
    _, top_c = jax.lax.top_k(c_scores, n_probe)             # (U, P)
    members = lists[top_c]                                  # (U, P, L)
    members = members.reshape(U, -1)                        # (U, P*L)
    valid = members >= 0
    safe = jnp.clip(members, 0, item_embeds.shape[0] - 1)
    cand = item_embeds[safe]                                # (U, P*L, D)
    scores = jnp.einsum("ud,upd->up", queries, cand)
    scores = jnp.where(valid, scores, -jnp.inf)
    kk = min(k, scores.shape[1])
    top_scores, pos = jax.lax.top_k(scores, kk)
    top_ids = jnp.take_along_axis(members, pos, axis=1)
    if kk < k:  # tiny catalogs: pad to k
        pad = k - kk
        top_ids = jnp.concatenate(
            [top_ids, jnp.full((U, pad), -1, top_ids.dtype)], axis=1
        )
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((U, pad), -jnp.inf)], axis=1
        )
    return top_ids, top_scores

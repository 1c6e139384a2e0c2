"""Device-side bipartite random walks for the i2i graph paradigm.

The reference generates walk pairs on the host inside the collator
(libreco/batch/collators.py:349 ``pairs_from_random_walk`` →
sampling/random_walks.py:21): item → random consumer → random item that
user consumed, repeated ``walk_length`` times per walk. Here the walk runs
INSIDE the jitted train step over the padded neighbor tables already
resident in HBM (graph/adjacency.py ``build_neighbor_table``): fresh walks
every step with zero host round-trips, static shapes throughout. Pairs the
reference would skip (walking back into the anchor) are weight-masked
instead of dropped.
"""
import jax
import jax.numpy as jnp


def walk_pairs(
    rng,
    start,
    item_nbr,
    item_deg,
    user_nbr,
    user_deg,
    num_walks,
    walk_len,
    focus_start,
):
    """(anchor, positive, valid) arrays of shape (B * num_walks * walk_len,).

    start : (B,) int32 start item nodes.
    item_nbr/item_deg : (n_items, T) padded consumers-of-item + counts.
    user_nbr/user_deg : (n_users, T) padded items-of-user + counts.
    focus_start : anchor every pair at the walk's start node (and
        invalidate returns to it); otherwise anchor at the current node
        (reference random_walks.py:33-39 semantics).
    """
    b = start.shape[0]
    cur = jnp.repeat(start, num_walks)  # (B*num_walks,)
    origin = cur
    anchors, positives, valids = [], [], []
    for _ in range(walk_len):
        rng, r1, r2 = jax.random.split(rng, 3)
        u_slot = jax.random.randint(r1, cur.shape, 0, item_nbr.shape[1])
        i_deg = jnp.maximum(item_deg[cur], 1.0).astype(jnp.int32)
        user = item_nbr[cur, jnp.mod(u_slot, i_deg)]
        i_slot = jax.random.randint(r2, cur.shape, 0, user_nbr.shape[1])
        u_deg = jnp.maximum(user_deg[user], 1.0).astype(jnp.int32)
        nxt = user_nbr[user, jnp.mod(i_slot, u_deg)]
        anchor = origin if focus_start else cur
        # a node with no recorded consumers cannot move: self-pairs and
        # dead-end hops are weight-masked, mirroring the reference's skip
        stuck = (item_deg[cur] <= 0.0) | (user_deg[user] <= 0.0)
        anchors.append(anchor)
        positives.append(nxt)
        valids.append((nxt != anchor) & ~stuck)
        cur = nxt
    # (walk_len, B*num_walks) -> row-major per start node: transpose so a
    # start node's pairs stay contiguous, matching the host ordering
    anchors = jnp.stack(anchors, axis=1).reshape(b * num_walks * walk_len)
    positives = jnp.stack(positives, axis=1).reshape(b * num_walks * walk_len)
    valids = jnp.stack(valids, axis=1).reshape(b * num_walks * walk_len)
    return anchors, positives, valids.astype(jnp.float32)


def i2i_negatives(rng, n_items, anchors, positives, num_neg, rounds=3,
                  logits=None, out_batch=False):
    """Item negatives with collision resampling against BOTH the anchor and
    the positive (reference sampling/negatives.py:17 semantics, ``items``
    exclusion included), all in-kernel. ``logits`` switches the proposal
    from uniform to categorical (popularity^temperature sampling);
    ``out_batch`` proposes other rows' positives instead (reference
    negatives_from_out_batch, sampling/negatives.py:46)."""
    shape = (anchors.shape[0], num_neg)

    def draw(r):
        if out_batch:
            rows = jax.random.randint(r, shape, 0, anchors.shape[0])
            return positives[rows]
        if logits is not None:
            return jax.random.categorical(r, logits, shape=shape).astype(
                jnp.int32
            )
        return jax.random.randint(r, shape, 0, n_items)

    rng, r = jax.random.split(rng)
    cand = draw(r)
    for _ in range(rounds):
        bad = (cand == anchors[:, None]) | (cand == positives[:, None])
        rng, r = jax.random.split(rng)
        cand = jnp.where(bad, draw(r), cand)
    return cand

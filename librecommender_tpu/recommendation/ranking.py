"""Host-side ranking utilities shared by score-matrix models.

Reference parity: libreco/recommendation/ranking.py:10 — consumed filtering
+ top-k + optional softmax^alpha stochastic recommendation. The heavy path
(full-catalog scoring) runs on device via ``ops/topk.py``; this module covers
the host-side variant used with precomputed numpy scores and the
``random_rec`` sampling mode.
"""
import numpy as np


def rank_recommendations(
    task,
    user_ids,
    model_scores,
    n_rec,
    n_items,
    user_consumed,
    filter_consumed=True,
    random_rec=False,
    return_scores=False,
    np_rng=None,
):
    """model_scores: (U, n_items) numpy. Returns (U, n_rec) item ids."""
    scores = np.array(model_scores, dtype=np.float64, copy=True).reshape(-1, n_items)
    users = np.atleast_1d(np.asarray(user_ids))
    if task == "ranking":
        scores = 1.0 / (1.0 + np.exp(-scores))  # probabilities for display
    if filter_consumed:
        for row, u in enumerate(users):
            consumed = user_consumed.get(int(u), ())
            if len(consumed) >= n_items:
                continue  # keep at least something recommendable
            scores[row, list(consumed)] = -np.inf
    ids = np.empty((len(users), n_rec), dtype=np.int64)
    out_scores = np.empty((len(users), n_rec), dtype=np.float64)
    for row in range(len(users)):
        s = scores[row]
        if random_rec:
            valid = np.isfinite(s)
            probs = np.exp(s[valid] - np.max(s[valid])) ** 0.75
            probs = probs / probs.sum()
            candidates = np.nonzero(valid)[0]
            rng = np_rng or np.random.default_rng()
            chosen = rng.choice(
                candidates, min(n_rec, len(candidates)), replace=False, p=probs
            )
            if len(chosen) < n_rec:  # fall back to top-k fill
                rest = np.argsort(-s)
                rest = rest[~np.isin(rest, chosen)][: n_rec - len(chosen)]
                chosen = np.concatenate([chosen, rest])
            ids[row] = chosen
        else:
            top = np.argpartition(-s, min(n_rec, n_items - 1))[:n_rec]
            ids[row] = top[np.argsort(-s[top])]
        out_scores[row] = s[ids[row]]
    if return_scores:
        return ids, out_scores
    return ids

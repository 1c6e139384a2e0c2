"""Swing: item-item substitution scores from user-pair co-consumption.

Reference parity: libreco/algorithms/swing.py:14 + rust/src/graph.rs:200 —
score(i, j) = sum over user pairs (u, v) co-consuming both of
1 / (alpha + |I_u ∩ I_v|); computed by the native C++ kernel with a pure-
Python fallback; top-k neighbor lists cached like the recfarm serialization.
Ranking task only.
"""
import numpy as np
from scipy.sparse import csr_matrix

from ..bases.cf_base import CfBase
from ..native import get_lib, swing_topk_native
from ..utils.misc import time_block
from ..utils.validate import check_fitting


class Swing(CfBase):
    cf_mode = "item"

    def __init__(
        self,
        task,
        data_info,
        top_k=20,
        alpha=1.0,
        max_cache_num=100_000_000,
        num_threads=0,
        seed=42,
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        if task != "ranking":
            raise ValueError("Swing is only suitable for ranking")
        super().__init__(task, data_info, "cosine", top_k, True, num_threads,
                         1, None, seed, None)
        self.alpha = alpha
        self.top_k = top_k

    def fit(
        self,
        train_data,
        neg_sampling,
        verbose=1,
        shuffle=True,
        eval_data=None,
        metrics=None,
        k=10,
        eval_batch_size=8192,
        eval_user_num=None,
        **kwargs,
    ):
        check_fitting(self, train_data, eval_data, neg_sampling, k)
        mat = train_data.sparse_interaction
        self.interaction = csr_matrix(
            (mat.data, mat.indices, mat.indptr),
            shape=(self.n_users, self.n_items),
        )
        ui = self.interaction.copy()
        ui.data = np.ones_like(ui.data)
        ui.sort_indices()
        iu = ui.T.tocsr()
        iu.sort_indices()
        with time_block("swing scores", verbose):
            if get_lib() is not None:
                self.sim_ids, self.sim_vals = swing_topk_native(
                    ui, iu, self.alpha, self.top_k, self.num_threads
                )
            else:
                self.sim_ids, self.sim_vals = _swing_fallback(
                    ui, iu, self.alpha, self.top_k
                )
        self.post_fit()
        if verbose > 1 and eval_data is not None:
            from ..evaluation.evaluate import print_metrics

            print_metrics(
                self, eval_data=eval_data, metrics=metrics,
                eval_batch_size=eval_batch_size, k=k,
                sample_user_num=eval_user_num, seed=self.seed,
                neg_sampling=neg_sampling,
            )

    def _predict_pair(self, u, i):
        if u >= self.n_users or i >= self.n_items:
            return 0.0
        consumed = set(self.user_consumed.get(u, ()))
        nbrs = self.sim_ids[i]
        sims = self.sim_vals[i]
        valid = nbrs >= 0
        score = sum(
            s for n, s in zip(nbrs[valid], sims[valid]) if int(n) in consumed
        )
        return float(score)

    @property
    def default_pred(self):
        return 0.0

    def _user_scores(self, uid):
        consumed = np.asarray(list(self.user_consumed.get(uid, ())), np.int64)
        scores = np.full(self.n_items, -np.inf)
        if consumed.size == 0:
            return scores
        acc = np.zeros(self.n_items, np.float64)
        for c in consumed:
            nbrs = self.sim_ids[c]
            sims = self.sim_vals[c]
            valid = nbrs >= 0
            acc[nbrs[valid]] += sims[valid]
        nz = acc != 0.0
        scores[nz] = acc[nz]
        return scores


def _swing_fallback(user_items, item_users, alpha, k):
    """Pure-Python swing (tiny data / no g++)."""
    n_users, n_items = user_items.shape
    item_lists = [
        set(user_items.indices[user_items.indptr[u]:user_items.indptr[u + 1]])
        for u in range(n_users)
    ]
    scores = {}
    for i in range(n_items):
        users = item_users.indices[item_users.indptr[i]:item_users.indptr[i + 1]]
        for a in range(len(users)):
            for b in range(a + 1, len(users)):
                u, v = int(users[a]), int(users[b])
                inter = item_lists[u] & item_lists[v]
                if len(inter) < 2 or min(inter) != i:
                    continue
                w = 1.0 / (alpha + len(inter))
                for x1 in inter:
                    for x2 in inter:
                        if x1 != x2:
                            scores[(x1, x2)] = scores.get((x1, x2), 0.0) + w
    ids = np.full((n_items, k), -1, np.int32)
    sims = np.zeros((n_items, k), np.float32)
    per_item = {}
    for (i, j), s in scores.items():
        per_item.setdefault(i, []).append((s, j))
    for i, cands in per_item.items():
        cands.sort(key=lambda t: (-t[0], t[1]))
        for j, (s, it) in enumerate(cands[:k]):
            ids[i, j] = it
            sims[i, j] = s
    return ids, sims

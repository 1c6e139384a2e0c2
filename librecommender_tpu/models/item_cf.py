"""ItemCF: item-based neighborhood collaborative filtering.

Reference parity: libreco/algorithms/item_cf.py:10 (+ item_cf_rs.py:5):
top-k similar items from the native kernel; prediction averages the user's
ratings of items similar to the target; recommendation aggregates similarity
mass from the user's consumed items.
"""
import numpy as np

from ..bases.cf_base import CfBase


class ItemCF(CfBase):
    cf_mode = "item"

    def __init__(
        self,
        task,
        data_info,
        sim_type="cosine",
        k_sim=20,
        store_top_k=True,
        num_threads=0,
        min_common=1,
        mode=None,
        block_size=None,  # accepted for API familiarity (Rust-path memory knob); ignored
        seed=42,
        lower_upper_bound=None,
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        super().__init__(
            task, data_info, sim_type, k_sim, store_top_k, num_threads,
            min_common, mode, seed, lower_upper_bound,
        )

    def _predict_pair(self, u, i):
        if u >= self.n_users or i >= self.n_items:
            return self.default_pred
        nbrs = self.sim_ids[i]
        sims = self.sim_vals[i]
        valid = nbrs >= 0
        nbrs, sims = nbrs[valid], sims[valid]
        if nbrs.size == 0:
            return self.default_pred
        ratings = np.asarray(self.interaction[u, nbrs].todense()).ravel()
        rated = ratings != 0
        if not np.any(rated):
            return self.default_pred
        w = sims[rated]
        if self.task == "rating":
            return float(np.dot(w, ratings[rated]) / np.maximum(np.sum(np.abs(w)), 1e-10))
        return float(np.sum(w) / np.maximum(np.sum(np.abs(sims)), 1e-10))

    @property
    def default_pred(self):
        return self.global_mean if self.task == "rating" else 0.0

    def _user_scores(self, uid):
        consumed = np.asarray(list(self.user_consumed.get(uid, ())), np.int64)
        scores = np.full(self.n_items, -np.inf)
        if consumed.size == 0:
            return scores
        acc = np.zeros(self.n_items, np.float64)
        ratings = np.asarray(self.interaction[uid, consumed].todense()).ravel()
        for c, r in zip(consumed, ratings):
            nbrs = self.sim_ids[c]
            sims = self.sim_vals[c]
            valid = nbrs >= 0
            acc[nbrs[valid]] += sims[valid] * (r if self.task == "rating" else 1.0)
        nz = acc != 0.0
        scores[nz] = acc[nz]
        return scores

"""UserCF: user-based neighborhood collaborative filtering.

Reference parity: libreco/algorithms/user_cf.py:10 (+ user_cf_rs.py:5): the
top-k similar users come from the native kernel; prediction averages
neighbor labels weighted by similarity; recommendation aggregates
sim * rating over neighbors' consumption.
"""
import numpy as np

from ..bases.cf_base import CfBase


class UserCF(CfBase):
    cf_mode = "user"

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
        nbrs = self.sim_ids[u]
        sims = self.sim_vals[u]
        valid = nbrs >= 0
        nbrs, sims = nbrs[valid], sims[valid]
        if nbrs.size == 0:
            return self.default_pred
        ratings = np.asarray(
            self.interaction[nbrs, i].todense()
        ).ravel()
        rated = ratings != 0
        if not np.any(rated):
            return self.default_pred
        w = sims[rated]
        if self.task == "rating":
            return float(np.dot(w, ratings[rated]) / np.maximum(np.sum(np.abs(w)), 1e-10))
        # ranking: fraction of neighbor similarity mass that consumed i
        return float(np.sum(w) / np.maximum(np.sum(np.abs(sims)), 1e-10))

    @property
    def default_pred(self):
        return self.global_mean if self.task == "rating" else 0.0

    def _user_scores(self, uid):
        nbrs = self.sim_ids[uid]
        sims = self.sim_vals[uid]
        valid = nbrs >= 0
        nbrs, sims = nbrs[valid], sims[valid]
        scores = np.zeros(self.n_items, np.float64)
        if nbrs.size == 0:
            return np.full(self.n_items, -np.inf)
        sub = self.interaction[nbrs]                            # (k, n_items) CSR
        scores = np.asarray(sims[None, :] @ sub).ravel().astype(np.float64)
        scores[scores == 0.0] = -np.inf
        return scores

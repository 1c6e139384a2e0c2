"""Neighborhood collaborative filtering base (UserCF / ItemCF).

Reference parity: libreco/bases/cf_base.py:26 and the recfarm variant
cf_base_rs.py:14 — cosine/pearson/jaccard top-k neighbor computation through
the native C++ kernel (librecommender_tpu/native), rating prediction as
sim-weighted label average, ranking aggregation over neighbor consumption,
popular-item fallback when no neighbor information exists.
"""
import numpy as np
from scipy.sparse import csr_matrix

from .base import Base
from ..recommendation.cold_start import popular_recommendations
from ..utils.misc import colorize, time_block
from ..utils.similarities import (
    SIM_TYPES,
    fast_transpose,
    topk_similarities,
    update_topk_similarities,
)
from ..utils.validate import check_fitting


class CfBase(Base):
    cf_mode = None  # "user" or "item"

    def __init__(
        self,
        task,
        data_info,
        sim_type="cosine",
        k_sim=20,
        store_top_k=True,
        num_threads=0,
        min_common=1,
        mode=None,  # accepted for reference-API familiarity (invert/forward)
        seed=42,
        lower_upper_bound=None,
    ):
        super().__init__(task, data_info, lower_upper_bound, seed)
        if sim_type not in SIM_TYPES:
            raise ValueError(f"unknown sim_type: {sim_type}")
        self.sim_type = sim_type
        self.k_sim = k_sim
        self.num_threads = num_threads
        self.min_common = min_common
        self.sim_ids = None        # (n_rows, k_sim) padded with -1
        self.sim_vals = None
        self.interaction = None    # user-item CSR
        self._old_cf_state = None  # set by rebuild_model for incremental fit
        # hyperparams consumed by Base.fit are unused; CF has no SGD loop

    def build_model(self):
        pass

    def loss_fn(self, params, batch, rng):  # pragma: no cover
        raise NotImplementedError("CF models have no SGD loss")

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
        batch = csr_matrix(
            (mat.data, mat.indices, mat.indptr),
            shape=(self.n_users, self.n_items),
        )
        if self._old_cf_state is not None:
            # incremental retrain: merge the new batch into the saved
            # interactions and update only the touched neighbor lists
            # (reference rust/src/incremental.rs via cf_base_rs.py:192)
            old_ids, old_sims, old_inter = self._old_cf_state
            self._old_cf_state = None
            old_pad = old_inter.copy()
            old_pad.resize(self.n_users, self.n_items)  # vocab growth pad
            self.interaction = (old_pad + batch).tocsr()
            entity = (
                self.interaction if self.cf_mode == "user"
                else fast_transpose(self.interaction)
            )
            touched = np.unique(
                np.asarray(
                    train_data.user_indices if self.cf_mode == "user"
                    else train_data.item_indices
                )
            )
            with time_block(f"update {self.sim_type} sims", verbose):
                self.sim_ids, self.sim_vals = update_topk_similarities(
                    old_ids, old_sims, entity, touched, self.sim_type,
                    self.k_sim, self.min_common, self.num_threads,
                )
        else:
            self.interaction = batch
            entity = (
                self.interaction if self.cf_mode == "user"
                else fast_transpose(self.interaction)
            )
            with time_block(f"{self.sim_type} sims", verbose):
                self.sim_ids, self.sim_vals = topk_similarities(
                    entity, self.sim_type, self.k_sim,
                    self.min_common, self.num_threads,
                )
        n_with = int(np.sum(self.sim_ids[:, 0] >= 0))
        if verbose > 0:
            total = self.sim_ids.shape[0]
            print(
                colorize(
                    f"{n_with} of {total} {self.cf_mode}s have similar neighbors",
                    "cyan",
                )
            )
        self.post_fit()
        if verbose > 1 and eval_data is not None:
            from ..evaluation.evaluate import print_metrics

            print_metrics(
                self,
                eval_data=eval_data,
                metrics=metrics,
                eval_batch_size=eval_batch_size,
                k=k,
                sample_user_num=eval_user_num,
                seed=self.seed,
                neg_sampling=neg_sampling,
            )

    def post_fit(self):
        self.build_default_recs()

    def _default_rec_source(self, num):
        return np.asarray(
            [self.data_info.item2id[i] for i in self.data_info.popular_items[:num]]
        )

    # ------------------------------------------------------------- inference
    def predict(self, user, item, inner_id=False, cold_start="average"):
        users, items = self.convert_ids(user, item, inner_id)
        from ..native import get_lib

        lib = get_lib()
        if lib is not None:
            # native batch path (recfarm rust/src/inference.rs analog)
            from ..native import cf_predict_native

            preds = cf_predict_native(
                0 if self.cf_mode == "user" else 1,
                1 if self.task == "rating" else 0,
                self.sim_ids, self.sim_vals, self._sorted_interaction(),
                users, items, float(self.default_pred), self.num_threads,
            ).astype(np.float64)
        else:
            preds = np.empty(len(users), np.float64)
            for n, (u, i) in enumerate(zip(users, items)):
                preds[n] = self._predict_pair(int(u), int(i))
        if self.task == "rating":
            preds = np.clip(preds, self.lower_bound, self.upper_bound)
        return preds[0] if preds.size == 1 else preds

    def _sorted_interaction(self):
        """Interaction CSR with sorted indices (native predict
        binary-searches rows; scipy sums may leave rows unsorted)."""
        if not getattr(self.interaction, "has_sorted_indices", True):
            self.interaction.sort_indices()
        return self.interaction

    def _predict_pair(self, u, i):
        raise NotImplementedError

    def recommend_user(
        self,
        user,
        n_rec,
        inner_id=False,
        cold_start="average",
        filter_consumed=True,
        random_rec=False,
    ):
        raw_users = np.atleast_1d(np.asarray(user))
        if cold_start not in ("average", "popular"):
            raise ValueError(f"Unknown cold start strategy: {cold_start}")
        result = {}
        uids, keys = [], []
        for u in raw_users:
            uids.append(
                int(u) if inner_id and 0 <= int(u) < self.n_users
                else self.data_info.user2id.get(u, -1) if not inner_id
                else -1
            )
            keys.append(u.item() if isinstance(u, np.generic) else u)

        from ..native import get_lib

        if get_lib() is not None:
            return self._recommend_native(
                uids, keys, raw_users, n_rec, inner_id, filter_consumed
            )
        for uid, key in zip(uids, keys):
            if uid < 0:
                result[key] = popular_recommendations(
                    self.data_info, inner_id=True, n_rec=n_rec
                )
                continue
            scores = self._user_scores(uid)
            if filter_consumed:
                consumed = list(self.user_consumed.get(uid, ()))
                # reference can't-filter passthrough (ranking.py:38)
                if n_rec + len(consumed) <= self.n_items:
                    scores[consumed] = -np.inf
            top = np.argpartition(-scores, min(n_rec, self.n_items - 1))[:n_rec]
            top = top[np.argsort(-scores[top])]
            finite = top[np.isfinite(scores[top])]
            if len(finite) < n_rec:  # popular fallback fill
                pops = popular_recommendations(
                    self.data_info, inner_id=True, n_rec=n_rec
                )
                fill = [p for p in pops if p not in set(finite)]
                finite = np.concatenate([finite, fill])[:n_rec]
            result[key] = finite.astype(np.int64)
        return self.finalize_rec(result, raw_users, inner_id)

    def _user_scores(self, uid):
        raise NotImplementedError

    def _recommend_native(self, uids, keys, raw_users, n_rec, inner_id,
                          filter_consumed):
        """Batch recommend through the C++ tier (similarities.cpp
        cf_recommend — the recfarm rust/src/inference.rs analog). Cold
        users fall back to popular recommendations like the Python path."""
        from ..native import cf_recommend_native

        pops = np.asarray(
            popular_recommendations(self.data_info, inner_id=True, n_rec=n_rec),
            np.int64,
        )
        result = {}
        warm = [(q, uid) for q, uid in enumerate(uids) if uid >= 0]
        # reference can't-filter passthrough (ranking.py:38): users whose
        # unconsumed remainder can't fill n_rec recommend UNFILTERED —
        # the native kernel takes one flag, so such users go in a second
        # call with filtering off (matches the Python path above)
        def _eff_filter(uid):
            return filter_consumed and (
                n_rec + len(self.user_consumed.get(uid, ())) <= self.n_items
            )

        for eff in (True, False):
            grp = [(q, uid) for q, uid in warm if _eff_filter(uid) == eff]
            if not grp:
                continue
            qs, warm_uids = zip(*grp)
            ids, _ = cf_recommend_native(
                0 if self.cf_mode == "user" else 1,
                1 if self.task == "rating" else 0,
                self.sim_ids, self.sim_vals, self._sorted_interaction(),
                np.asarray(warm_uids, np.int32), n_rec, eff,
                pops, self.num_threads,
            )
            for row, q in enumerate(qs):
                recs = ids[row]
                result[keys[q]] = recs[recs >= 0].astype(np.int64)
        for q, uid in enumerate(uids):
            if uid < 0:
                result[keys[q]] = pops
        return self.finalize_rec(result, raw_users, inner_id)

    # ------------------------------------------------------------- retrain
    def rebuild_model(self, path, model_name=None):
        """Prepare incremental similarity update from a saved model
        (reference libreco/bases/cf_base_rs.py:192: load the saved state,
        then ``fit`` on the merged trainset updates neighbor lists
        incrementally instead of recomputing from scratch)."""
        from pathlib import Path

        if model_name is not None:
            self.model_name = model_name
        arrays = np.load(Path(path) / f"{self.model_name}_cf.npz")
        if "inter_shape" in arrays:
            shape = tuple(arrays["inter_shape"])
        else:  # legacy save without explicit shape
            shape = (
                arrays["inter_indptr"].shape[0] - 1,
                int(arrays["inter_indices"].max(initial=-1)) + 1,
            )
        old_inter = csr_matrix(
            (arrays["inter_data"], arrays["inter_indices"], arrays["inter_indptr"]),
            shape=shape,
        )
        self._old_cf_state = (arrays["sim_ids"], arrays["sim_vals"], old_inter)
        return self

    # --------------------------------------------------------- persistence
    def save(self, path, model_name=None, **kwargs):
        from pathlib import Path

        if model_name is not None:
            self.model_name = model_name
        Path(path).mkdir(parents=True, exist_ok=True)
        from ..utils.save_load import save_default_recs, save_hyper_params

        save_hyper_params(path, self)
        save_default_recs(path, self)
        np.savez_compressed(
            Path(path) / f"{self.model_name}_cf",
            sim_ids=self.sim_ids,
            sim_vals=self.sim_vals,
            inter_data=self.interaction.data,
            inter_indices=self.interaction.indices,
            inter_indptr=self.interaction.indptr,
            inter_shape=np.asarray(self.interaction.shape, np.int64),
        )
        self.data_info.save(path, self.model_name)

    @classmethod
    def load(cls, path, model_name, data_info=None, **kwargs):
        from pathlib import Path

        from ..data.data_info import DataInfo
        from ..utils.save_load import load_default_recs, load_hyper_params

        if data_info is None:
            data_info = DataInfo.load(path, model_name)
        hparams = load_hyper_params(path, model_name)
        hparams.pop("model_class", None)
        model = cls(data_info=data_info, **hparams)
        model.model_name = model_name
        arrays = np.load(Path(path) / f"{model_name}_cf.npz")
        model.sim_ids = arrays["sim_ids"]
        model.sim_vals = arrays["sim_vals"]
        model.interaction = csr_matrix(
            (arrays["inter_data"], arrays["inter_indices"], arrays["inter_indptr"]),
            shape=(model.n_users, model.n_items),
        )
        model.default_recs = load_default_recs(path, model_name)
        model.loaded = True
        return model

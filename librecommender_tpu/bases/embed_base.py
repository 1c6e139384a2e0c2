"""Base for models reducible to a (user_embeds, item_embeds) dot product.

Reference parity: libreco/bases/embed_base.py:24 — post-fit embedding export
with OOV row (:257), knn search (:415-529, nmslib replaced by exact on-device
top-k), inference-only save of embeddings (:267). Covers SVD / SVDpp / ALS /
BPR / TwoTower / YouTubeRetrieval / RNN4Rec / Caser / WaveNet / graph models.
"""
from pathlib import Path

import numpy as np

from .base import Base
from ..ops.topk import topk_from_embeddings
from ..recommendation.cold_start import popular_recommendations
from ..recommendation.ranking import rank_recommendations


class EmbedBase(Base):
    def __init__(self, task, data_info, embed_size, lower_upper_bound=None, seed=42):
        super().__init__(task, data_info, lower_upper_bound, seed)
        self.embed_size = embed_size
        self.user_embeds_np = None  # (n_users + 1, D) with trailing OOV row
        self.item_embeds_np = None  # (n_items + 1, D)
        self.ann = None             # optional IVF index (init_ann)
        self.ann_n_probe = 8

    # -------------------------------------------------------------- contract
    def set_embeddings(self):
        """Compute ``user_embeds_np``/``item_embeds_np`` from ``self.params``.

        Implementations must produce arrays WITHOUT the OOV row; the base
        appends it as the mean of trained rows (reference
        ``assign_embedding_oov``, embed_base.py:257).
        """
        raise NotImplementedError

    def post_epoch(self):
        self.set_embeddings()

    def post_fit(self):
        self.set_embeddings()
        self.build_default_recs()

    def _append_oov(self, embeds):
        oov = np.mean(embeds, axis=0, keepdims=True)
        return np.vstack([embeds, oov]).astype(np.float32)

    def _default_rec_source(self, num):
        """Cold 'average' recs = top items for the OOV (mean) user."""
        ids, _ = topk_from_embeddings(
            self.user_embeds_np[-1], self.item_embeds_np[:-1],
            min(num, self.n_items), filter_consumed=False,
        )
        return ids[0]

    # ------------------------------------------------------------- inference
    def predict(self, user, item, inner_id=False, cold_start="average"):
        user, item = self.convert_ids(user, item, inner_id)
        preds = np.sum(
            self.user_embeds_np[user] * self.item_embeds_np[item], axis=1
        )
        if self.task == "rating":
            preds = np.clip(preds, self.lower_bound, self.upper_bound)
        else:
            preds = 1.0 / (1.0 + np.exp(-preds))
        return preds[0] if np.isscalar(user) or preds.size == 1 else preds

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
        inner_ids = np.empty(len(raw_users), dtype=np.int64)
        popular_mask = np.zeros(len(raw_users), dtype=bool)
        for i, u in enumerate(raw_users):
            if inner_id:
                uid = int(u) if 0 <= int(u) < self.n_users else -1
            else:
                uid = self.data_info.user2id.get(u, -1)
            if uid < 0:
                if cold_start == "popular":
                    popular_mask[i] = True
                    inner_ids[i] = self.n_users
                else:
                    inner_ids[i] = self.n_users  # OOV (average) row
            else:
                inner_ids[i] = uid

        result = {}
        main_idx = np.nonzero(~popular_mask)[0]
        if main_idx.size > 0:
            uids = inner_ids[main_idx]
            if self.ann is not None and not random_rec:
                ids = self._ann_recommend(uids, n_rec, filter_consumed)
            elif random_rec:
                scores = self.user_embeds_np[uids] @ self.item_embeds_np[:-1].T
                ids = rank_recommendations(
                    self.task,
                    uids,
                    scores,
                    n_rec,
                    self.n_items,
                    self.user_consumed,
                    filter_consumed=filter_consumed,
                    random_rec=True,
                    np_rng=self.data_info.np_rng,
                )
            else:
                ids, _ = topk_from_embeddings(
                    self.user_embeds_np[uids],
                    self.item_embeds_np[:-1],
                    n_rec,
                    user_consumed=self.user_consumed if filter_consumed else None,
                    user_ids=uids,
                    filter_consumed=filter_consumed,
                )
            for row, i in enumerate(main_idx):
                result[_key(raw_users[i])] = ids[row]
        for i in np.nonzero(popular_mask)[0]:
            result[_key(raw_users[i])] = popular_recommendations(
                self.data_info, inner_id=True, n_rec=n_rec
            )
        return self.finalize_rec(result, raw_users, inner_id)

    # ------------------------------------------------------------------ ANN
    def init_ann(self, index="ivf", n_clusters=None, n_probe=8, iters=20,
                 M=16, ef_construction=200, ef_search=200):
        """Build an approximate index over the item embeddings
        (reference `init_knn(approximate=True)` via nmslib,
        embed_base.py:415, and the faiss IVF serving index). Subsequent
        ``recommend_user`` calls search the index (over-fetching to cover
        consumed filtering) instead of scoring the full catalog.

        ``index``: "ivf" (k-means inverted lists, the serving-tier
        format) or "hnsw" (native graph index, the nmslib analog —
        measured recall/latency in docs/serving_guide.md)."""
        assert self.item_embeds_np is not None, "fit or load the model first"
        if index == "hnsw":
            from ..retrieval.hnsw import HNSWIndex

            self.ann = HNSWIndex.build(
                self.item_embeds_np[:-1], M=M,
                ef_construction=ef_construction, seed=self.seed,
            )
            self._ann_search_kw = {"ef_search": ef_search}
        else:
            from ..retrieval.ivf import IVFIndex

            self.ann = IVFIndex.build(
                self.item_embeds_np[:-1], n_clusters=n_clusters, iters=iters,
                seed=self.seed,
            )
            self._ann_search_kw = {"n_probe": n_probe}
        return self.ann

    def _ann_recommend(self, uids, n_rec, filter_consumed):
        max_consumed = max(
            (len(self.user_consumed.get(int(u), ())) for u in uids), default=0
        )
        fetch = n_rec + (max_consumed if filter_consumed else 0)
        ids, _ = self.ann.search(
            self.user_embeds_np[uids], fetch,
            **getattr(self, "_ann_search_kw", {"n_probe": 8}),
        )
        out = np.empty((len(uids), n_rec), np.int64)
        for r, u in enumerate(uids):
            consumed = (
                set(self.user_consumed.get(int(u), ())) if filter_consumed else ()
            )
            picked = [i for i in ids[r] if i >= 0 and i not in consumed][:n_rec]
            if len(picked) < n_rec:  # popular fallback fill
                pops = popular_recommendations(
                    self.data_info, inner_id=True, n_rec=n_rec + len(picked)
                )
                picked.extend(p for p in pops if p not in set(picked))
            out[r] = picked[:n_rec]
        return out

    # ----------------------------------------------------------- embeddings
    def get_user_id(self, user):
        """Raw user -> inner id; unknown raises (reference
        embed_base.py:333)."""
        if user not in self.data_info.user2id:
            raise ValueError(f"unknown user: {user}")
        return self.data_info.user2id[user]

    def get_item_id(self, item):
        if item not in self.data_info.item2id:
            raise ValueError(f"unknown item: {item}")
        return self.data_info.item2id[item]

    def get_user_embedding(self, user=None, include_bias=False):
        embeds = self.user_embeds_np[:-1] if user is None else self.user_embeds_np[
            self.convert_ids(user, user, False)[0]
        ]
        return embeds if include_bias else embeds[..., : self.embed_size]

    def get_item_embedding(self, item=None, include_bias=False):
        embeds = self.item_embeds_np[:-1] if item is None else self.item_embeds_np[
            self.convert_ids(item, item, False)[1]
        ]
        return embeds if include_bias else embeds[..., : self.embed_size]

    def init_knn(self, approximate, sim_type="cosine", M=100,
                 ef_construction=200, ef_search=200):
        """Initialize the knn-search space (reference embed_base.py:415).

        ``sim_type='cosine'`` searches normalized factor embeddings
        (bias excluded); ``'inner-product'`` searches the full exported
        embeddings, bias included. ``approximate=True`` builds the
        native HNSW graph index (retrieval/hnsw.py — the nmslib analog,
        with the same M / ef_construction / ef_search knobs).
        """
        if sim_type not in ("cosine", "inner-product"):
            raise ValueError(
                f"unknown sim_type: {sim_type}, "
                "only `cosine` and `inner-product` are supported"
            )
        self.sim_type = sim_type
        self.include_bias = sim_type == "inner-product"
        self.knn_approximate = bool(approximate)
        if approximate:
            from ..retrieval.hnsw import HNSWIndex

            self._knn_ef_search = ef_search
            self._knn_indexes = {}
            for side in ("user", "item"):
                base = self._knn_space(side)
                self._knn_indexes[side] = HNSWIndex.build(
                    base, M=min(M, 64), ef_construction=ef_construction,
                    seed=self.seed,
                )
        return self

    def _knn_space(self, side):
        """Embedding matrix (no OOV row) in the active knn space."""
        base = (self.user_embeds_np if side == "user" else self.item_embeds_np)[:-1]
        if not getattr(self, "include_bias", False):
            base = base[:, : self.embed_size]
        if getattr(self, "sim_type", "inner-product") == "cosine":
            base = base / np.maximum(
                np.linalg.norm(base, axis=1, keepdims=True), 1e-12
            )
        return base

    def _search_knn(self, side, inner_id, k):
        base = self._knn_space(side)
        query = base[inner_id]
        if getattr(self, "knn_approximate", False):
            index = self._knn_indexes[side]
            ids, _ = index.search(
                query[None], k + 1, ef_search=self._knn_ef_search
            )
            top = [int(t) for t in ids[0] if t >= 0]
        else:
            sims = base @ query
            top = np.argsort(-sims)[: k + 1]
        return [int(t) for t in top if t != inner_id][:k]

    def search_knn_users(self, user, k):
        """k most similar users (self excluded) in the ``init_knn`` space
        (defaults to exact inner product when ``init_knn`` wasn't called)."""
        uid = self.data_info.user2id.get(user)
        if uid is None:
            return None
        return [
            self.data_info.id2user[t] for t in self._search_knn("user", uid, k)
        ]

    def search_knn_items(self, item, k):
        iid = self.data_info.item2id.get(item)
        if iid is None:
            return None
        return [
            self.data_info.id2item[t] for t in self._search_knn("item", iid, k)
        ]

    # --------------------------------------------------------- persistence
    def save(self, path, model_name=None, inference_only=False, **kwargs):
        if model_name is not None:
            self.model_name = model_name
        if inference_only:
            Path(path).mkdir(parents=True, exist_ok=True)
            np.savez_compressed(
                Path(path) / f"{self.model_name}_embeddings",
                user_embed=self.user_embeds_np,
                item_embed=self.item_embeds_np,
            )
            from ..utils.save_load import save_default_recs, save_hyper_params

            save_hyper_params(path, self)
            save_default_recs(path, self)
            self.data_info.save(path, self.model_name)
        else:
            super().save(path, model_name=self.model_name)

    @classmethod
    def load(cls, path, model_name, data_info=None, **kwargs):
        embed_path = Path(path) / f"{model_name}_embeddings.npz"
        if embed_path.exists():
            from ..data.data_info import DataInfo
            from ..utils.save_load import load_default_recs, load_hyper_params

            if data_info is None:
                data_info = DataInfo.load(path, model_name)
            hparams = load_hyper_params(path, model_name)
            hparams.pop("model_class", None)
            model = cls(data_info=data_info, **hparams)
            model.model_name = model_name
            arrays = np.load(embed_path)
            model.user_embeds_np = arrays["user_embed"]
            model.item_embeds_np = arrays["item_embed"]
            model.default_recs = load_default_recs(path, model_name)
            model.loaded = True
            return model
        return super().load(path, model_name, data_info, **kwargs)

    def post_load(self):
        if self.params is not None:
            self.set_embeddings()


def _key(u):
    """Dict keys: keep raw user hashable/scalar."""
    return u.item() if isinstance(u, np.generic) else u

"""Offline batch recommender: the Spark ALS tier, TPU-native.

Mirrors distributed/spark/.../model/Recommender.scala:11-51 — implicit
ALS (rank 50, reg 0.01, 20 iterations) trained from a raw interaction
DataFrame, then batch recommendations for a user subset with optional
item-name mapping. The Spark cluster's scale-out role is played by the
TPU: ALS solves are XLA batched Cholesky on the MXU (models/als.py) and
recommendation scoring is full-catalog matmul sharded in user chunks.
"""
import numpy as np
import pandas as pd

from ..data.dataset import DatasetPure
from .evaluate import EvalRecommender


class Recommender:
    """train / transform / recommend_for_users, Recommender.scala:15-50."""

    def __init__(self, rank=50, reg=0.01, max_iter=20, implicit=True,
                 alpha=10, seed=42):
        self.rank = rank
        self.reg = reg
        self.max_iter = max_iter
        self.implicit = implicit
        self.alpha = alpha
        self.seed = seed
        self.model = None

    def train(self, df, evaluate=False, num=10, metrics="ndcg"):
        """Fit implicit ALS, or (evaluate=True) run the grid-search
        evaluation instead — exactly the reference's switch
        (Recommender.scala:15-33)."""
        if evaluate:
            # keep the evaluator so callers can read best_params/score
            self.eval_ = EvalRecommender(num=num, metrics=metrics)
            self.eval_.eval(df)
            return self
        train_data, data_info = DatasetPure.build_trainset(
            df[["user", "item", "label"]]
        )
        from ..models import ALS

        self.model = ALS(
            "ranking" if self.implicit else "rating",
            data_info,
            embed_size=self.rank,
            n_epochs=self.max_iter,
            reg=self.reg,
            alpha=self.alpha,
            seed=self.seed,
        )
        # implicit (ranking) ALS trains with sampled negatives per the
        # library convention; explicit (rating) ALS fits observed ratings
        self.model.fit(train_data, neg_sampling=self.implicit, verbose=0)
        return self

    def transform(self, df):
        """Append a ``prediction`` score per (user, item) row
        (Recommender.scala:36-38; cold pairs get the model's default,
        the coldStartStrategy="drop" analog is ``dropna`` on the col)."""
        preds = self.model.predict(
            df["user"].tolist(), df["item"].tolist()
        )
        out = df.copy()
        out["prediction"] = np.asarray(preds)
        return out

    def recommend_for_users(self, df, num, item_name_map=None):
        """Top-``num`` per distinct user in ``df`` as a long DataFrame
        (user, item, prob[, name]) — recommendForUserSubset +
        explode(recommendations), Recommender.scala:40-50."""
        users = pd.unique(df["user"])
        recs = self.model.recommend_user(
            user=list(users), n_rec=num, filter_consumed=True
        )
        rows_u, rows_i = [], []
        for u in users:
            items = recs[u.item() if isinstance(u, np.generic) else u]
            rows_u.extend([u] * len(items))
            rows_i.extend(list(items))
        # ONE batched predict over every (user, item) pair — not one
        # jitted call per user (this is the batch path; dispatch overhead
        # dominates per-user calls at offline scale)
        rows_p = self._rec_scores(rows_u, rows_i)
        out = pd.DataFrame({"user": rows_u, "item": rows_i, "prob": rows_p})
        if item_name_map:
            out["name"] = out["item"].map(
                lambda i: item_name_map.get(int(i))
            )
        return out

    def _rec_scores(self, users, items):
        try:
            # predict returns a bare scalar for a single pair; normalize
            return np.atleast_1d(np.asarray(
                self.model.predict(list(users), list(items))
            ))
        except (KeyError, TypeError, ValueError) as exc:
            # expected only for names-only callers (unknown raw ids /
            # models without a pair-predict path); anything else — a
            # broken model state, bad dtype deep in the scorer — should
            # surface, not silently degrade to NaN probabilities
            import logging

            logging.getLogger(__name__).warning(
                "offline recommender predict degraded to NaN scores: %s",
                exc,
            )
            return np.full(len(items), np.nan)


def load_item_names(path, sep="::", item_col=0, name_col=1,
                    encoding="iso-8859-1"):
    """movies.dat-style file -> {item_id: name} (the ItemNameConverter
    util, distributed/spark/.../utils/ItemNameConverter.scala:15)."""
    out = {}
    with open(path, encoding=encoding) as f:
        for line in f:
            parts = line.rstrip("\n").split(sep)
            if len(parts) > max(item_col, name_col):
                try:
                    out[int(parts[item_col])] = parts[name_col]
                except ValueError:
                    continue
    return out

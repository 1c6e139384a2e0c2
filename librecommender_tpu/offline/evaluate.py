"""Grid-search evaluators for the offline tier.

Mirror of distributed/spark/.../evaluate/: EvalRecommender.scala:17
(ALS rank x reg grid scored with ranking metrics on a per-user chrono
split), EvalClassifier.scala:15 and EvalRegressor.scala (param grids
scored with multiclass / regression metrics). Ranking metrics reuse
evaluation/metrics.py; the stratified chrono split is the library's own
``split_by_ratio_chrono`` (data/split.py:113), which splits each user's
rows chronologically — the DataSplitter.stratified_chrono_split
semantics (DataSplitter.scala:52-70).
"""
import numpy as np

from ..data.dataset import DatasetPure
from ..data.split import split_by_ratio_chrono
from ..evaluation.metrics import (
    average_precision_at_k,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
)


def stratified_chrono_split(df, train_frac=0.8):
    """Per-user chronological split (DataSplitter.scala:52-70)."""
    return split_by_ratio_chrono(df, test_size=1.0 - train_frac)


class EvalRecommender:
    """ALS grid search scored by a ranking metric at k
    (EvalRecommender.scala:34-64: rank in {20,50,100}, reg in
    {0.001,0.01,0.1}, 20 iterations, implicit)."""

    def __init__(self, num=10, metrics="ndcg", ranks=(20, 50, 100),
                 regs=(0.001, 0.01, 0.1), max_iter=20, seed=42):
        if metrics not in ("ndcg", "precision", "recall", "map"):
            raise ValueError("metrics must be ndcg/precision/recall/map")
        self.num = num
        self.metrics = metrics
        self.ranks = tuple(ranks)
        self.regs = tuple(regs)
        self.max_iter = max_iter
        self.seed = seed
        self.best_score = -np.inf
        self.best_params = None

    def eval(self, df, verbose=1):
        from ..models import ALS

        # fresh grid state per call: a previous eval's score must not
        # veto this dataset's legitimately-best combo
        self.best_score = -np.inf
        self.best_params = None
        train_df, test_df = stratified_chrono_split(df)
        train_data, data_info = DatasetPure.build_trainset(
            train_df[["user", "item", "label"]]
        )
        # ground truth: test items per user, known users/items only
        truth = {}
        for u, i in zip(test_df["user"], test_df["item"]):
            uid = data_info.user2id.get(u)
            iid = data_info.item2id.get(i)
            if uid is not None and iid is not None:
                truth.setdefault(u, set()).add(int(iid))
        users = sorted(truth)
        fn = {
            "precision": precision_at_k,
            "recall": recall_at_k,
            "map": average_precision_at_k,
            "ndcg": ndcg_at_k,
        }[self.metrics]

        round_no = 1
        for rank in self.ranks:
            for reg in self.regs:
                model = ALS(
                    "ranking", data_info, embed_size=rank, reg=reg,
                    n_epochs=self.max_iter, seed=self.seed,
                )
                model.fit(train_data, neg_sampling=True, verbose=0)
                recs = model.recommend_user(
                    user=list(users), n_rec=self.num, filter_consumed=True
                )
                scores = [
                    fn(truth[u],
                       [int(data_info.item2id[i]) for i in recs[u]
                        if i in data_info.item2id],
                       self.num)
                    for u in users
                ]
                score = float(np.mean(scores)) if scores else 0.0
                if score > self.best_score:
                    self.best_score = score
                    self.best_params = {"rank": rank, "reg": reg}
                if verbose:
                    print(f"round {round_no}: rank={rank}, reg={reg}, "
                          f"{self.metrics}@{self.num}={score:.4f}")
                round_no += 1
        if verbose:
            print(f"best params: {self.best_params}, "
                  f"score={self.best_score:.4f}")
        return self.best_params


def _accuracy(y_true, y_pred):
    return float((np.asarray(y_true) == np.asarray(y_pred)).mean())


def _f1_weighted(y_true, y_pred):
    """Weighted-average F1, the MulticlassClassificationEvaluator default
    (EvalClassifier.scala showScoreAndParam)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    classes = np.unique(y_true)
    f1s, weights = [], []
    for c in classes:
        tp = float(((y_pred == c) & (y_true == c)).sum())
        fp = float(((y_pred == c) & (y_true != c)).sum())
        fn = float(((y_pred != c) & (y_true == c)).sum())
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1s.append(2 * prec * rec / (prec + rec) if prec + rec else 0.0)
        weights.append(float((y_true == c).sum()))
    weights = np.asarray(weights) / max(sum(weights), 1.0)
    return float(np.sum(np.asarray(f1s) * weights))


def _fit_features_once(feature_pipeline, train_df, test_df):
    """Features don't depend on the model grid: fit the pipeline ONCE on
    the train split and transform both splits — removes the O(grid)
    refits (incl. the on-device SGNS stage) a naive per-combo train
    would pay, and keeps the caller's pipeline in use for EVERY combo."""
    from .pipeline import preprocess_pipeline

    pipe = feature_pipeline or preprocess_pipeline()
    x_train = pipe.fit_transform(train_df)
    x_test = pipe.transform(test_df)
    return x_train, x_test


class EvalClassifier:
    """Param grid over the classifier, scored by weighted F1 + accuracy
    on the chrono split (EvalClassifier.scala:15-57). Grid axes follow
    the algo: (step_size, max_iter) for "mlp"; (max_depth, n_trees) for
    "rf" — the reference's respective ParamGridBuilder axes."""

    def __init__(self, algo="mlp", step_sizes=(0.01, 0.05),
                 max_iters=(100, 300), max_depths=(3, 5),
                 n_trees=(50, 100), seed=42):
        self.algo = algo
        self.step_sizes = tuple(step_sizes)
        self.max_iters = tuple(max_iters)
        self.max_depths = tuple(max_depths)
        self.n_trees = tuple(n_trees)
        self.seed = seed
        self.best_score = -np.inf
        self.best_params = None

    def eval(self, df, feature_pipeline=None, verbose=1):
        from .supervised import _train_mlp, map_rating_label
        from .trees import RandomForest

        self.best_score = -np.inf
        self.best_params = None
        train_df, test_df = stratified_chrono_split(df)
        x_train, x_test = _fit_features_once(
            feature_pipeline, train_df, test_df
        )
        y_train = map_rating_label(train_df["rating"].to_numpy())
        y_true = map_rating_label(test_df["rating"].to_numpy())
        n_classes = int(max(y_train.max(), y_true.max())) + 1

        if self.algo == "mlp":
            grid = [{"step_size": lr, "max_iter": it}
                    for lr in self.step_sizes for it in self.max_iters]
        else:
            grid = [{"max_depth": d, "n_trees": t}
                    for d in self.max_depths for t in self.n_trees]
        for combo in grid:
            if self.algo == "mlp":
                import jax.numpy as jnp

                params, forward = _train_mlp(
                    x_train, y_train, (40, 10, n_classes),
                    combo["step_size"], combo["max_iter"], self.seed,
                    "classification",
                )
                pred = np.asarray(
                    forward(params, jnp.asarray(x_test))
                ).argmax(axis=1)
            else:
                rf = RandomForest(
                    n_trees=combo["n_trees"], max_depth=combo["max_depth"],
                    seed=self.seed,
                ).fit(x_train, y_train)
                pred = rf.predict(x_test)
            f1 = _f1_weighted(y_true, pred)
            acc = _accuracy(y_true, pred)
            if f1 > self.best_score:
                self.best_score = f1
                self.best_params = combo
            if verbose:
                print(", ".join(f"{k}={v}" for k, v in combo.items())
                      + f": f1={f1:.4f}, accuracy={acc:.4f}")
        if verbose:
            print(f"best params: {self.best_params}, "
                  f"f1={self.best_score:.4f}")
        return self.best_params


class EvalRegressor:
    """Param grid over the GBT regressor, scored by rmse/mae/r2
    (EvalRegressor.scala). Features are fitted once per split and shared
    across the grid (see _fit_features_once)."""

    def __init__(self, algo="gbdt", max_iters=(20, 50),
                 step_sizes=(0.01, 0.1), seed=42):
        self.algo = algo
        self.max_iters = tuple(max_iters)
        self.step_sizes = tuple(step_sizes)
        self.seed = seed
        self.best_score = np.inf
        self.best_params = None

    def eval(self, df, feature_pipeline=None, verbose=1):
        from ..evaluation.metrics import mae, r2, rmse
        from .supervised import _train_mlp
        from .trees import GradientBoostedTrees

        self.best_score = np.inf
        self.best_params = None
        train_df, test_df = stratified_chrono_split(df)
        x_train, x_test = _fit_features_once(
            feature_pipeline, train_df, test_df
        )
        y_train = np.asarray(train_df["rating"].to_numpy(), np.float64)
        y = np.asarray(test_df["rating"].to_numpy(), np.float64)

        for it in self.max_iters:
            for lr in self.step_sizes:
                combo = {"max_iter": it, "step_size": lr}
                if self.algo == "gbdt":
                    model = GradientBoostedTrees(
                        n_iter=it, learning_rate=lr, seed=self.seed,
                    ).fit(x_train, y_train)
                    pred = model.predict(x_test)
                else:  # mlp
                    import jax.numpy as jnp

                    params, forward = _train_mlp(
                        x_train, y_train, (40, 10, 1), lr, it, self.seed,
                        "regression",
                    )
                    pred = np.asarray(
                        forward(params, jnp.asarray(x_test))
                    )[:, 0]
                scores = {"rmse": rmse(y, pred), "mae": mae(y, pred),
                          "r2": r2(y, pred)}
                if scores["rmse"] < self.best_score:
                    self.best_score = scores["rmse"]
                    self.best_params = combo
                if verbose:
                    print(f"max_iter={it}, step_size={lr}: " + ", ".join(
                        f"{k}={v:.4f}" for k, v in scores.items()))
        if verbose:
            print(f"best params: {self.best_params}, "
                  f"rmse={self.best_score:.4f}")
        return self.best_params

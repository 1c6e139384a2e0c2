"""Sequence models + request-time dynamic state (reference
examples/seq_example.py and dyn_feature_example.py): train a behavior-
sequence model, then recommend with on-the-fly sequences and feature
overrides no training row ever contained."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import pandas as pd

from librecommender_tpu.data import DatasetFeat, split_by_ratio_chrono
from librecommender_tpu.evaluation import evaluate
from librecommender_tpu.models import SIM, DIN, Transformer, YouTubeRanking

data = pd.read_csv("/root/reference/tests/sample_data/sample_movielens_merged.csv")
train, evals = split_by_ratio_chrono(data, test_size=0.2)

sparse_col = ["sex", "occupation", "genre1"]
dense_col = ["age"]
user_col = ["sex", "age", "occupation"]
item_col = ["genre1"]

train_data, data_info = DatasetFeat.build_trainset(
    train, user_col, item_col, sparse_col, dense_col
)
eval_data = DatasetFeat.build_evalset(evals)

for cls, extra in (
    (DIN, {}),
    (Transformer, dict(num_tfm_layers=1)),
    (YouTubeRanking, {}),
    (SIM, dict(long_max_len=40, search_topk=10)),
):
    model = cls("ranking", data_info, embed_size=16, n_epochs=2,
                batch_size=2048, recent_num=10, **extra)
    model.fit(train_data, neg_sampling=True, verbose=1)
    print(cls.__name__, evaluate(
        model, eval_data, neg_sampling=True, metrics=["roc_auc"]))

    user = train["user"].iloc[0]
    # plain recommendation from the trained history
    print("history recs:", model.recommend_user(user=user, n_rec=5)[user])
    # request-time sequence override: "the user just watched these items"
    fresh_seq = train["item"].iloc[:6].tolist()
    print("dynamic-seq recs:",
          model.recommend_user(user=user, n_rec=5, seq=fresh_seq)[user])
    # cold user with ONLY a request-time sequence and features
    print("cold dynamic recs:",
          model.recommend_user(user=-1, n_rec=5, seq=fresh_seq,
                               user_feats={"sex": "F", "age": 0.3})[-1])

"""Feature-based CTR ranking (reference examples/feat_ranking_example.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import pandas as pd

from librecommender_tpu.data import DatasetFeat, split_by_ratio_chrono
from librecommender_tpu.evaluation import evaluate
from librecommender_tpu.models import DIN, FM, DeepFM, WideDeep

data = pd.read_csv("/root/reference/tests/sample_data/sample_movielens_merged.csv")
train, evals = split_by_ratio_chrono(data, test_size=0.2)
train = train.copy(); evals = evals.copy()
train["age"] = (train["age"] - 30.0) / 20.0   # normalize dense features
evals["age"] = (evals["age"] - 30.0) / 20.0

sparse_col = ["sex", "occupation", "genre1", "genre2", "genre3"]
dense_col = ["age"]
user_col = ["sex", "age", "occupation"]
item_col = ["genre1", "genre2", "genre3"]

train_data, data_info = DatasetFeat.build_trainset(
    train, user_col, item_col, sparse_col, dense_col
)
eval_data = DatasetFeat.build_evalset(evals)
print(data_info)

for cls in (FM, DeepFM, WideDeep, DIN):
    model = cls("ranking", data_info, embed_size=32, n_epochs=10,
                batch_size=2048, num_neg=2)
    model.fit(train_data, neg_sampling=True, verbose=1)
    print(cls.__name__, evaluate(
        model, eval_data, neg_sampling=True, metrics=["roc_auc", "ndcg"],
    ))

# request-time dynamic features + behavior sequence
model = DIN("ranking", data_info, embed_size=32, n_epochs=5, batch_size=2048)
model.fit(train_data, neg_sampling=True, verbose=0)
print(model.recommend_user(user=1, n_rec=7,
                           user_feats={"sex": "F", "age": 0.3},
                           seq=[1193, 661, 914]))

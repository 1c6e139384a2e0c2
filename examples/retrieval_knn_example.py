"""Two-tower retrieval + embedding knn search (reference examples/
two_tower_example.py + knn_embedding_example.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import pandas as pd

from librecommender_tpu.data import DatasetFeat, split_by_ratio_chrono
from librecommender_tpu.evaluation import evaluate
from librecommender_tpu.models import TwoTower, YouTubeRetrieval

data = pd.read_csv("/root/reference/tests/sample_data/sample_movielens_merged.csv")
train, evals = split_by_ratio_chrono(data, test_size=0.2)
train = train.copy(); evals = evals.copy()
train["age"] = (train["age"] - 30.0) / 20.0
evals["age"] = (evals["age"] - 30.0) / 20.0
train_data, data_info = DatasetFeat.build_trainset(
    train,
    user_col=["sex", "age", "occupation"],
    item_col=["genre1", "genre2", "genre3"],
    sparse_col=["sex", "occupation", "genre1", "genre2", "genre3"],
    dense_col=["age"],
)
eval_data = DatasetFeat.build_evalset(evals)

# in-batch softmax with popularity correction + SSL
model = TwoTower(
    "ranking", data_info, loss_type="softmax", embed_size=32, n_epochs=10,
    batch_size=2048, use_correction=True, remove_accidental_hits=True,
    ssl_pattern="rfm",
)
model.fit(train_data, neg_sampling=False, verbose=1)
print("TwoTower", evaluate(model, eval_data, neg_sampling=True,
                           metrics=["roc_auc", "recall", "ndcg"]))
print("similar items:", model.search_knn_items(item=1193, k=5))
print("dynamic user embedding:", model.dyn_user_embedding(user=1)[:4], "...")

retrieval = YouTubeRetrieval(
    "ranking", data_info, loss_type="sampled_softmax", embed_size=32,
    n_epochs=10, batch_size=2048,
)
retrieval.fit(train_data, neg_sampling=False, verbose=1)
print("YouTubeRetrieval", evaluate(retrieval, eval_data, neg_sampling=True,
                                   metrics=["roc_auc", "recall"]))

"""Multi-sparse (multi-value) feature handling (reference examples/
multi_sparse_processing_example.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import pandas as pd

from librecommender_tpu.data import DatasetFeat, split_by_ratio_chrono
from librecommender_tpu.models import FM

data = pd.read_csv("/root/reference/tests/sample_data/sample_movielens_merged.csv")
train, evals = split_by_ratio_chrono(data, test_size=0.2)

# genre1-3 already come pre-split: declare them one multi-sparse field that
# shares a single vocabulary + OOV slot, pooled with the sqrtn combiner
train_data, data_info = DatasetFeat.build_trainset(
    train,
    user_col=["sex", "occupation"],
    item_col=["genre1", "genre2", "genre3"],
    sparse_col=["sex", "occupation"],
    dense_col=None,
    multi_sparse_col=[["genre1", "genre2", "genre3"]],
    pad_val="missing",
)
print(data_info)
model = FM("ranking", data_info, embed_size=32, n_epochs=5, batch_size=2048,
           multi_sparse_combiner="sqrtn")
model.fit(train_data, neg_sampling=True, verbose=1)
print(model.recommend_user(user=1, n_rec=7))

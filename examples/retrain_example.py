"""Retraining with new users/items (reference examples/model_retrain_example.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import pandas as pd

from librecommender_tpu.data import DatasetPure, split_by_ratio_chrono
from librecommender_tpu.models import SVD

data = pd.read_csv(
    "/root/reference/tests/sample_data/sample_movielens_rating.dat",
    sep="::", names=["user", "item", "label", "time"], engine="python",
)
first_half = data.iloc[: len(data) // 2]
second_half = data.iloc[len(data) // 2 :]

# ---- period 1: train and save
train_data, data_info = DatasetPure.build_trainset(first_half)
model = SVD("ranking", data_info, embed_size=32, n_epochs=5, batch_size=2048)
model.fit(train_data, neg_sampling=True, verbose=1)
model.save("svd_model", "svd")

# ---- period 2: merge new data (new users/items appear), graft, refit
data_info = type(data_info).load("svd_model", "svd")
new_train, new_info = DatasetPure.merge_trainset(second_half, data_info)
print("vocab grew:", data_info.n_users, "->", new_info.n_users, "users")

model2 = SVD("ranking", new_info, embed_size=32, n_epochs=5, batch_size=2048)
model2.rebuild_model("svd_model", "svd")   # grafts old rows + Adam state
model2.fit(new_train, neg_sampling=True, verbose=1)
print(model2.recommend_user(user=second_half.user.iloc[0], n_rec=7))

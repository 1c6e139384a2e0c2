"""Incremental CF retrain: neighbor lists merge instead of recomputing.

Reference flow analog: tests/retrain/test_rs_cf_retrain.py (recfarm
incremental path)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import numpy as np
import pandas as pd

from librecommender_tpu.data import DatasetPure
from librecommender_tpu.models import UserCF

rng = np.random.default_rng(0)


def make(n_rows, user_lo, user_hi, seed):
    r = np.random.default_rng(seed)
    return pd.DataFrame({
        "user": r.integers(user_lo, user_hi, n_rows),
        "item": r.integers(0, 500, n_rows),
        "label": np.ones(n_rows),
    }).drop_duplicates(subset=["user", "item"])


# first fit on the initial data
first = make(20_000, 0, 300, seed=1)
train, data_info = DatasetPure.build_trainset(first)
model = UserCF("ranking", data_info, k_sim=20)
model.fit(train, neg_sampling=True, verbose=1)
model.save("ucf_dir", "UserCF")

# new interactions arrive (including brand-new users)
new = make(4_000, 250, 360, seed=2)
new_train, new_info = DatasetPure.merge_trainset(new, data_info)

# rebuild_model loads the saved neighbor lists + interactions; fit merges
# the new batch and updates only the touched rows
model2 = UserCF("ranking", new_info, k_sim=20)
model2.rebuild_model("ucf_dir", "UserCF")
model2.fit(new_train, neg_sampling=True, verbose=1)

user = int(new.user.iloc[0])
print("recs for", user, "->", model2.recommend_user(user=user, n_rec=5)[user])

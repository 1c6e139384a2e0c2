"""Split strategies + save/load + the rating task.

Covers the reference's split_data_example.py, save_load_example.py and
pure_rating_example.py in one script: every split flavor, a rating-task
fit with bounded predictions, and the save -> load -> identical
predictions contract.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import numpy as np
import pandas as pd

from librecommender_tpu.data import (
    DatasetPure,
    random_split,
    split_by_num,
    split_by_num_chrono,
    split_by_ratio,
    split_by_ratio_chrono,
)
from librecommender_tpu.models import SVD

rng = np.random.default_rng(0)
n = 30_000
frame = pd.DataFrame({
    "user": rng.integers(0, 300, n),
    "item": rng.integers(0, 500, n),
    "label": rng.integers(1, 6, n).astype(float),
    "time": rng.integers(1_500_000_000, 1_600_000_000, n),
})

# ---- every split flavor ---------------------------------------------------
train, evals, test = random_split(frame, multi_ratios=[0.8, 0.1, 0.1])
print(f"random_split: {len(train)}/{len(evals)}/{len(test)}")
tr, ev = split_by_ratio(frame, test_size=0.2)
print(f"split_by_ratio: {len(tr)}/{len(ev)} (last 20% of each user)")
tr, ev = split_by_num(frame, test_size=3)
print(f"split_by_num: {len(tr)}/{len(ev)} (last 3 interactions/user)")
tr, ev = split_by_ratio_chrono(frame, test_size=0.2)
print(f"split_by_ratio_chrono: {len(tr)}/{len(ev)} (time-ordered)")
tr, ev = split_by_num_chrono(frame, test_size=2)
print(f"split_by_num_chrono: {len(tr)}/{len(ev)}")

# ---- rating task: predictions live inside the observed score bounds -------
train_data, data_info = DatasetPure.build_trainset(tr)
eval_data = DatasetPure.build_evalset(ev)
model = SVD("rating", data_info, embed_size=16, n_epochs=3, lr=0.001,
            batch_size=2048)
model.fit(train_data, neg_sampling=False, verbose=2, eval_data=eval_data,
          metrics=["rmse", "mae"])
u, i = int(tr.user.iloc[0]), int(tr.item.iloc[0])
pred = float(np.asarray(model.predict(user=u, item=i)))
assert model.lower_bound <= pred <= model.upper_bound
print(f"rating predict({u}, {i}) = {pred:.3f} "
      f"(bounds {model.lower_bound}..{model.upper_bound})")

# ---- save -> load -> identical predictions --------------------------------
import tempfile

with tempfile.TemporaryDirectory() as td:
    model.save(td, "svd_rating")
    loaded = SVD.load(td, "svd_rating", data_info)
    pred2 = float(np.asarray(loaded.predict(user=u, item=i)))
    assert pred == pred2, (pred, pred2)
    print("save/load roundtrip: identical predictions")

"""Assigning changed user/item features after training.

Covers the reference's changing_feature_example.py: features drift in
production (a user ages, an item's genre gets re-tagged); the stored
feature tables can be updated IN PLACE via DataInfo.assign_user_features /
assign_item_features and the next predict/recommend uses the new values —
no refit required.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import numpy as np
import pandas as pd

from librecommender_tpu.data import DatasetFeat, split_by_ratio_chrono
from librecommender_tpu.models import DeepFM

df = pd.read_csv(
    "/root/reference/tests/sample_data/sample_movielens_merged.csv"
)
train_df, eval_df = split_by_ratio_chrono(df, test_size=0.2)
train_data, data_info = DatasetFeat.build_trainset(
    train_df, user_col=["sex", "age", "occupation"], item_col=["genre1"],
    sparse_col=["sex", "occupation", "genre1"], dense_col=["age"],
)
model = DeepFM("ranking", data_info, embed_size=16, n_epochs=2,
               batch_size=2048, use_bn=False)
model.fit(train_data, neg_sampling=True, verbose=1)

user = int(train_df.user.iloc[0])
item = int(train_df.item.iloc[0])
before = float(np.asarray(model.predict(user=user, item=item)))

# the user had a birthday and switched jobs: assign the new values from a
# fresh DataFrame (only listed users change; unknown columns are ignored)
new_user_rows = pd.DataFrame(
    {"user": [user], "age": [60], "occupation": [7], "sex": ["M"]}
)
data_info.assign_user_features(new_user_rows)
# the next predict detects the bumped feature_version and re-uploads the
# tables into the jitted scorer automatically
after = float(np.asarray(model.predict(user=user, item=item)))
print(f"predict(user={user}, item={item}): {before:.4f} -> {after:.4f} "
      "after feature reassignment")

# per-request override WITHOUT mutating stored tables: pass feats=
adhoc = float(np.asarray(model.predict(
    user=user, item=item, feats={"age": 21, "occupation": 3}
)))
print(f"request-time feats override: {adhoc:.4f} (stored tables untouched)")
recs = model.recommend_user(user=user, n_rec=5,
                            user_feats={"age": 21, "occupation": 3})
print("recommend with temporary features:", recs[user])

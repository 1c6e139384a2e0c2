"""Data workflows: split variants, a rating-task model, save/load, and
request-time feature reassignment (reference split_data_example.py,
pure_rating_example.py, save_load_example.py, changing_feature_example.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import pandas as pd

from librecommender_tpu.data import (
    DatasetFeat,
    random_split,
    split_by_num_chrono,
    split_by_ratio_chrono,
)
from librecommender_tpu.evaluation import evaluate
from librecommender_tpu.models import DeepFM

data = pd.read_csv("/root/reference/tests/sample_data/sample_movielens_merged.csv")

# --- every split family -----------------------------------------------------
train1, evals1, test1 = random_split(data, multi_ratios=[0.8, 0.1, 0.1])
train2, evals2 = split_by_ratio_chrono(data, test_size=0.2)
train3, evals3 = split_by_num_chrono(data, test_size=1)  # leave-one-out
print({name: len(t) for name, t in
       [("random", train1), ("ratio_chrono", train2), ("num_chrono", train3)]})

# --- rating task (labels are 1-5 scores, no negative sampling) --------------
sparse_col, dense_col = ["sex", "occupation", "genre1"], ["age"]
user_col, item_col = ["sex", "age", "occupation"], ["genre1"]
train_data, data_info = DatasetFeat.build_trainset(
    train2, user_col, item_col, sparse_col, dense_col
)
eval_data = DatasetFeat.build_evalset(evals2)
model = DeepFM("rating", data_info, embed_size=16, n_epochs=2, batch_size=2048)
model.fit(train_data, neg_sampling=False, verbose=1)
print("rating:", evaluate(model, eval_data, neg_sampling=False,
                          metrics=["rmse", "mae"]))
user, item = train2.user.iloc[0], train2.item.iloc[0]
print("predicted score:", model.predict(user=user, item=item))

# --- save / load -------------------------------------------------------------
model.save("/tmp/data_workflow_model", "deepfm")
loaded = DeepFM.load("/tmp/data_workflow_model", "deepfm", data_info)
assert abs(float(loaded.predict(user=user, item=item))
           - float(model.predict(user=user, item=item))) < 1e-6
print("save/load roundtrip OK")

# --- changing stored features at serving time --------------------------------
# (reference changing_feature_example.py: DataInfo.assign_user_features)
old_sex = data.loc[data.user == user, "sex"].iloc[0]
new_user_rows = pd.DataFrame({
    "user": [user], "sex": ["F" if old_sex == "M" else "M"], "age": [99],
    "occupation": [data.occupation.iloc[0]],
})
score_before = float(model.predict(user=user, item=item))
recs_before = model.recommend_user(user=user, n_rec=5)[user]
data_info.assign_user_features(new_user_rows)
score_after = float(model.predict(user=user, item=item))
recs_after = model.recommend_user(user=user, n_rec=5)[user]
print(f"score {score_before:.4f} -> {score_after:.4f} after feature change")
print("recs before:", list(recs_before), "after:", list(recs_after))

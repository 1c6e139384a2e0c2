"""Graph models in both paradigms + AOT export (reference
examples/graph_example.py territory): train GraphSage u2i and i2i — the
i2i walks run inside the jitted train step — then export a model-class-free
StableHLO serving artifact for a retrieval model."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import numpy as np
import pandas as pd

from librecommender_tpu.data import DatasetPure, split_by_ratio_chrono
from librecommender_tpu.evaluation import evaluate
from librecommender_tpu.models import GraphSage, PinSage, RNN4Rec

data = pd.read_csv(
    "/root/reference/tests/sample_data/sample_movielens_rating.dat",
    sep="::", names=["user", "item", "label", "time"], engine="python",
)
data["label"] = 1.0
train, evals = split_by_ratio_chrono(data, test_size=0.2)
train_data, data_info = DatasetPure.build_trainset(train)
eval_data = DatasetPure.build_evalset(evals)

# --- u2i: user-item pairs with sampled negatives --------------------------
u2i = GraphSage("ranking", data_info, loss_type="bpr", embed_size=16,
                n_epochs=2, batch_size=2048, num_layers=2)
u2i.fit(train_data, neg_sampling=True, verbose=1)
print("u2i:", evaluate(u2i, eval_data, neg_sampling=True, metrics=["roc_auc"]))

# --- i2i: item-item pairs from bipartite random walks (drawn in-kernel) ---
i2i = PinSage("ranking", data_info, loss_type="max_margin", embed_size=16,
              n_epochs=2, batch_size=2048, paradigm="i2i",
              num_walks=5, sample_walk_len=3, start_node="unpopular",
              focus_start=True, sampler="out-batch")
i2i.fit(train_data, neg_sampling=True, verbose=1)
print("i2i:", evaluate(i2i, eval_data, neg_sampling=True, metrics=["roc_auc"]))
user = train["user"].iloc[0]
print("i2i recs:", i2i.recommend_user(user=user, n_rec=5)[user])

# --- AOT export: score without the model class ----------------------------
from librecommender_tpu.serving import load_exported_dyn, save_exported

tower = RNN4Rec("ranking", data_info, embed_size=16, n_epochs=1,
                batch_size=2048, recent_num=10)
tower.fit(train_data, neg_sampling=True, verbose=0)
save_exported("/tmp/export_demo", "tower", tower)
scorer = load_exported_dyn("/tmp/export_demo", "tower")
uid = data_info.user2id[user]
print("exported top-5 (inner ids):", scorer.recommend([uid], 5)[0])
print("with a request-time sequence:",
      scorer.recommend([uid], 5, seqs=np.asarray(
          tower._convert_seq(train["item"].iloc[:6].tolist(), inner_id=False)
      )[None, :])[0])

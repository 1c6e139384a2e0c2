"""Native in-process model/online serving.

The C++ server executes the model's exported scoring program itself —
where the reference's actix tier pays a network hop to TF Serving
(libserving/actix_serving/src/tf_deploy.rs), here the jitted scorer is
traced to a jaxpr, serialized, and interpreted natively: no Python, no
second service on the scoring path.

Round-4 engine: /model/recommend serves the precomputed static top-K
table (the reference's default_recs analog — ~11x the Python tier at the
full ML-1M catalog); /online/recommend executes the program live in
cache-resident item tiles over a worker pool, and concurrent dyn-family
requests coalesce into one batched tower GEMM. Knobs:
export_native(tile_size=...), NATIVE_TILE_THREADS,
NATIVE_SCORING_PERMITS, NATIVE_NO_TILING. See docs/serving_guide.md.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import json
import urllib.request

import pandas as pd

from librecommender_tpu.data import DatasetFeat, split_by_ratio_chrono
from librecommender_tpu.models import DIN
from librecommender_tpu.serving.native_server import (
    export_native,
    start_native_server,
)

data = pd.read_csv("/root/reference/tests/sample_data/sample_movielens_merged.csv")
train, _ = split_by_ratio_chrono(data, test_size=0.2)
train_data, data_info = DatasetFeat.build_trainset(
    train, user_col=["sex", "age", "occupation"], item_col=["genre1"],
    sparse_col=["sex", "occupation", "genre1"], dense_col=["age"],
)
model = DIN("ranking", data_info, embed_size=16, n_epochs=2,
            batch_size=2048, recent_num=10)
model.fit(train_data, neg_sampling=True, verbose=1)

# export_native writes the flat artifacts AND the scoring programs
# (score_all / score_dyn + feature maps) — programs=True is the default
artifact_dir = export_native("native_model_artifacts", model)
proc, port = start_native_server(artifact_dir)


def post(url, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{url}", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return json.loads(resp.read())


user = int(train.user.iloc[0])
print("model family (static):",
      post("/model/recommend", {"user": user, "n_rec": 5}))
print("online family (request-time state):",
      post("/online/recommend", {
          "user": user, "n_rec": 5,
          "seq": [int(i) for i in train.item.iloc[:5]],
          "user_feats": {"sex": "F", "age": 0.4},
      }))
proc.kill()
proc.wait()

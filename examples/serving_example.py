"""Serving: export artifacts, hydrate a store, run HTTP apps (reference
libserving flows)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import pandas as pd

from librecommender_tpu.data import DatasetPure, split_by_ratio_chrono
from librecommender_tpu.models import BPR
from librecommender_tpu.serving import DictStore, embed2store, save_embed
from librecommender_tpu.serving.app import create_app, run_server
from librecommender_tpu.serving.native_server import (
    export_native,
    start_native_server,
)

data = pd.read_csv(
    "/root/reference/tests/sample_data/sample_movielens_rating.dat",
    sep="::", names=["user", "item", "label", "time"], engine="python",
)
train, _ = split_by_ratio_chrono(data, test_size=0.2)
train_data, data_info = DatasetPure.build_trainset(train)
model = BPR("ranking", data_info, embed_size=32, n_epochs=5, batch_size=2048)
model.fit(train_data, neg_sampling=True, verbose=1)

# Python tier: artifacts -> store -> aiohttp app
path = save_embed("embed_artifacts", model)
store = DictStore()          # RedisStore("localhost", 6379) in production
embed2store(path, store)

# native C++ tier (knn/embed endpoints over flat binaries)
proc, port = start_native_server(export_native("native_artifacts", model))
print(f"native server on port {port}; try:")
print(f"  curl -X POST 127.0.0.1:{port}/embed/recommend "
      "-d '{\"user\": 1, \"n_rec\": 7}'")
proc.kill()

# blocking Python server:
import os

if os.environ.get("SERVE"):  # blocking; opt in with SERVE=1
    run_server("embed", store, port=8000)  # POST /embed/recommend

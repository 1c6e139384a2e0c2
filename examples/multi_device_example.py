"""Multi-device training: DP batches + row-sharded embedding tables.

Run without TPUs via a virtual CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/multi_device_example.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import jax

# demo runs on a virtual 8-device CPU mesh so it works on any box; on a
# real multi-chip TPU slice drop these two lines (the configs must be set
# before the first jax operation)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pandas as pd

from librecommender_tpu.data import DatasetPure, split_by_ratio_chrono
from librecommender_tpu.models import BPR
from librecommender_tpu.parallel import build_mesh
from librecommender_tpu.parallel.topk import distributed_topk

data = pd.read_csv(
    "/root/reference/tests/sample_data/sample_movielens_rating.dat",
    sep="::", names=["user", "item", "label", "time"], engine="python",
)
train, _ = split_by_ratio_chrono(data, test_size=0.2)
train_data, data_info = DatasetPure.build_trainset(train)

mesh = build_mesh(model_parallel=2)      # Mesh(('data', 'model'))
print("mesh:", mesh)
model = BPR("ranking", data_info, embed_size=32, n_epochs=5, batch_size=2048)
model.fit(train_data, neg_sampling=True, verbose=1, mesh=mesh)

# distributed full-catalog retrieval: local top-k per item shard + merge
ids, scores = distributed_topk(
    model.user_embeds_np[:8], model.item_embeds_np[:-1], 10, mesh, axis="model"
)
print("top-10 for first 8 users:\n", ids)

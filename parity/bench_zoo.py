"""TPU fit-throughput sweep across the model zoo at ML-1M scale.

Emits one line per model (examples/s through the real fit path, steady
epochs after the compile epoch) into /tmp/zoo_bench.json. Run serially on
one chip; models that raise are recorded with the error.

Usage: python parity/bench_zoo.py [model ...]
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path("/tmp/zoo_bench.json")


def main():
    import numpy as np

    import bench
    from librecommender_tpu.data import DatasetFeat, DatasetPure
    from librecommender_tpu import models as M

    wanted = sys.argv[1:] or None
    B, D, EPOCHS = 8192, 64, 3

    pure_frame = bench._pure_frame(1_000_000)
    feat_frame = bench._feat_frame(1_000_000)
    feat_frame["label"] = 1.0

    pure_train, pure_info = DatasetPure.build_trainset(pure_frame)
    feat_train, feat_info = DatasetFeat.build_trainset(
        feat_frame, user_col=["sex", "age"], item_col=["genre"],
        sparse_col=["sex", "genre"], dense_col=["age"],
    )

    common = dict(embed_size=D, n_epochs=EPOCHS, batch_size=B)
    ZOO = {
        "SVD": ("pure", dict(), True),
        "SVDpp": ("pure", dict(), True),
        "BPR": ("pure", dict(lr=0.01), True),
        "FM": ("feat", dict(), True),
        "DeepFM": ("feat", dict(hidden_units=(128, 64, 32)), True),
        "WideDeep": ("feat", dict(lr={"wide": 0.01, "deep": 1e-3},
                                  hidden_units=(128, 64, 32)), True),
        "AutoInt": ("feat", dict(), True),
        "NCF": ("feat", dict(hidden_units=(128, 64, 32)), True),
        "YouTubeRanking": ("feat", dict(hidden_units=(128, 64, 32),
                                        recent_num=10), True),
        "DIN": ("feat", dict(hidden_units=(128, 64, 32), recent_num=10), True),
        "Transformer": ("feat", dict(recent_num=10, feat_agg_mode=None), True),
        # reference-style feature-augmented tokens (concat = BST default)
        "Transformer_feattok": ("feat", dict(recent_num=10), True),
        "SIM": ("feat", dict(recent_num=10, feat_agg_mode=None, long_max_len=50,
                             search_topk=10), True),
        "RNN4Rec": ("pure", dict(recent_num=10), True),
        "Caser": ("pure", dict(recent_num=10), True),
        "WaveNet": ("pure", dict(recent_num=10), True),
        "TwoTower": ("feat", dict(loss_type="softmax"), False),
        "YouTubeRetrieval": ("feat", dict(loss_type="sampled_softmax"), False),
        "LightGCN": ("pure", dict(n_layers=3), True),
        "NGCF": ("pure", dict(), True),
        "GraphSage": ("pure", dict(num_layers=2, num_neighbors=10), True),
        "GraphSage_i2i": ("pure", dict(num_layers=2, num_neighbors=10,
                                       paradigm="i2i", num_walks=10,
                                       sample_walk_len=5), True),
        "PinSage": ("pure", dict(num_layers=2, num_neighbors=10), True),
    }

    results = {}
    if OUT.exists():
        results = json.loads(OUT.read_text())
    for name, (kind, extra, neg) in ZOO.items():
        if wanted and name not in wanted:
            continue
        cls = getattr(M, name.split("_")[0])
        train = pure_train if kind == "pure" else feat_train
        info = pure_info if kind == "pure" else feat_info
        try:
            model = cls("ranking", info, **{**common, **extra})
            # batch_size counts negatives too (reference adjust_batch_size
            # semantics) — scale it so every family keeps B positives/step,
            # the geometry the recorded zoo numbers were measured at
            from librecommender_tpu.batch import adjust_batch_size

            model.batch_size = B * (B // adjust_batch_size(model, B))
            model.fit(train, neg_sampling=neg, verbose=0)
            ts = model.trainer.epoch_times[1:]
            eps = len(train) / (sum(ts) / len(ts))
            results[name] = {"examples_per_s": round(eps, 1),
                             "compile_s": round(model.trainer.epoch_times[0], 1)}
        except Exception as exc:
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:160]}
        OUT.write_text(json.dumps(results, indent=1))
        print(name, results[name], flush=True)


if __name__ == "__main__":
    main()

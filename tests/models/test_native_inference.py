"""Native CF inference tier (cf_predict / cf_recommend in
similarities.cpp — the recfarm rust/src/inference.rs analog) cross-checked
against the pure-Python CfBase paths (mirrors the reference's dual-tier
UserCF vs RsUserCF contract)."""
import numpy as np
import pytest

from librecommender_tpu.models import ItemCF, UserCF
from librecommender_tpu.native import get_lib


def _toggle_native(monkeypatch, enabled):
    if enabled:
        monkeypatch.delenv("LIBREC_TPU_NO_NATIVE", raising=False)
    else:
        monkeypatch.setenv("LIBREC_TPU_NO_NATIVE", "1")


def _fit(cls, task, pure_builds):
    train_data, *_, data_info = pure_builds
    model = cls(task, data_info, k_sim=10)
    model.fit(train_data, neg_sampling=task == "ranking", verbose=0)
    return model, data_info


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
@pytest.mark.parametrize("cls", [UserCF, ItemCF])
@pytest.mark.parametrize("task", ["rating", "ranking"])
def test_native_predict_matches_python(pure_builds, pure_frames, cls, task,
                                       monkeypatch):
    model, data_info = _fit(cls, task, pure_builds)
    train, *_ = pure_frames
    users = train["user"].to_numpy()[:120]
    items = train["item"].to_numpy()[:120]
    _toggle_native(monkeypatch, True)
    native = np.atleast_1d(model.predict(users, items))
    _toggle_native(monkeypatch, False)
    python = np.atleast_1d(model.predict(users, items))
    # float32 native accumulation vs float64 numpy
    np.testing.assert_allclose(native, python, rtol=1e-4, atol=1e-5)

    # unknown ids -> default prediction in both tiers
    _toggle_native(monkeypatch, True)
    cold_n = model.predict("no-such-user", "no-such-item")
    _toggle_native(monkeypatch, False)
    cold_p = model.predict("no-such-user", "no-such-item")
    assert cold_n == pytest.approx(cold_p)


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
@pytest.mark.parametrize("cls", [UserCF, ItemCF])
@pytest.mark.parametrize("task", ["rating", "ranking"])
def test_native_recommend_matches_python(pure_builds, pure_frames, cls, task,
                                         monkeypatch):
    model, data_info = _fit(cls, task, pure_builds)
    train, *_ = pure_frames
    users = np.unique(train["user"].to_numpy())[:40]
    n_rec = 7
    _toggle_native(monkeypatch, True)
    rec_nat = model.recommend_user(users, n_rec)
    _toggle_native(monkeypatch, False)
    rec_py = model.recommend_user(users, n_rec)
    for u in users:
        key = u.item() if isinstance(u, np.generic) else u
        a, b = np.asarray(rec_nat[key]), np.asarray(rec_py[key])
        assert a.shape == b.shape
        if np.array_equal(a, b):
            continue
        # the tiers may order exact score ties differently (the native
        # tie-break is deterministic id-asc; numpy argpartition is
        # arbitrary) — scores of the differing picks must be equal
        uid = data_info.user2id[key]
        scores = model._user_scores(uid)
        consumed = list(model.user_consumed.get(uid, ()))
        scores[consumed] = -np.inf
        only_a = [data_info.item2id[i] for i in set(a) - set(b)]
        only_b = [data_info.item2id[i] for i in set(b) - set(a)]
        np.testing.assert_allclose(
            np.sort(scores[only_a]), np.sort(scores[only_b]), rtol=1e-5
        )


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
@pytest.mark.parametrize("cls", [UserCF, ItemCF])
def test_native_recommend_cant_filter_passthrough(pure_builds, pure_frames,
                                                  cls, monkeypatch):
    """Deep n_rec (n_rec + |consumed| > n_items) triggers the reference's
    can't-filter passthrough (ranking.py:38): such users recommend
    UNFILTERED. A mixed batch exercises the native tier's two-group split
    (cf_base._recommend_native) — each group must match the Python tier."""
    model, data_info = _fit(cls, "ranking", pure_builds)
    train, *_ = pure_frames
    users = np.unique(train["user"].to_numpy())[:12]
    counts = {u: len(model.user_consumed.get(data_info.user2id[u], ()))
              for u in users}
    n_rec = model.n_items - min(counts.values()) - 1
    # mixed batch: some users filterable at this n_rec, some not
    assert n_rec >= 1
    _toggle_native(monkeypatch, True)
    rec_nat = model.recommend_user(users, n_rec)
    _toggle_native(monkeypatch, False)
    rec_py = model.recommend_user(users, n_rec)
    saw_passthrough = False
    for u in users:
        key = u.item() if isinstance(u, np.generic) else u
        uid = data_info.user2id[key]
        consumed = set(model.user_consumed.get(uid, ()))
        if n_rec + len(consumed) > model.n_items:
            saw_passthrough = True  # consumed items allowed back in
        assert len(rec_nat[key]) == len(rec_py[key]) == n_rec
        # exact-order parity modulo score ties, as in the test above
        a, b = np.asarray(rec_nat[key]), np.asarray(rec_py[key])
        if np.array_equal(a, b):
            continue
        scores = model._user_scores(uid)
        if n_rec + len(consumed) <= model.n_items:
            scores[list(consumed)] = -np.inf
        only_a = [data_info.item2id[i] for i in set(a) - set(b)]
        only_b = [data_info.item2id[i] for i in set(b) - set(a)]
        np.testing.assert_allclose(
            np.sort(scores[only_a]), np.sort(scores[only_b]), rtol=1e-5
        )
    assert saw_passthrough  # the deep group actually exercised the fix


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")
def test_native_recommend_cold_user_and_fill(pure_builds, monkeypatch):
    train_data, *_, data_info = pure_builds
    model = UserCF("ranking", data_info, k_sim=10)
    model.fit(train_data, neg_sampling=True, verbose=0)
    _toggle_native(monkeypatch, True)
    recs = model.recommend_user(["totally-new-user"], 5)
    assert len(recs["totally-new-user"]) == 5  # popular fallback
    # large n_rec forces the popular fill path on warm users too
    some_user = next(iter(data_info.user2id))
    big = model.recommend_user([some_user], model.n_items)
    assert len(big[some_user]) == len(set(big[some_user].tolist()))

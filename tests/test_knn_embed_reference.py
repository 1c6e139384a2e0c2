"""Ported reference knn/embedding battery (reference
tests/test_knn_embed.py): embedding getter shapes and bias columns,
approximate-vs-exact knn agreement (symmetric difference <= 1 of 10),
invalid sim_type, unknown-id getters."""
import numpy as np
import pytest

from librecommender_tpu.models import ALS, BPR, RNN4Rec


def _fit(cls, data_info, train_data, **kw):
    m = cls("ranking", data_info, embed_size=16, n_epochs=2, **kw)
    m.fit(train_data, neg_sampling=True, verbose=0)
    return m


def _compare_diff(a, b):
    return len(set(np.asarray(a).tolist()) ^ set(np.asarray(b).tolist()))


def _ptest_knn(model, user, item):
    assert model.get_user_embedding().shape[0] == model.n_users
    assert model.get_user_embedding().shape[1] == model.embed_size
    assert model.get_item_embedding().shape[0] == model.n_items
    assert model.get_item_embedding().shape[1] == model.embed_size
    with pytest.raises(ValueError):
        model.init_knn(approximate=True, sim_type="whatever")
    for sim_type in ("cosine", "inner-product"):
        model.init_knn(approximate=True, sim_type=sim_type)
        approx_u = model.search_knn_users(user, 10)
        approx_i = model.search_knn_items(item, 10)
        model.init_knn(approximate=False, sim_type=sim_type)
        exact_u = model.search_knn_users(user, 10)
        exact_i = model.search_knn_items(item, 10)
        assert _compare_diff(approx_u, exact_u) <= 1
        assert _compare_diff(approx_i, exact_i) <= 1
        assert model.sim_type == sim_type


def test_knn_embed(pure_builds, pure_frames):
    train_data, *_, data_info = pure_builds
    user = pure_frames[0].user.iloc[0]
    item = pure_frames[0].item.iloc[0]

    als = _fit(ALS, data_info, train_data, reg=5.0)
    _ptest_knn(als, user, item)

    bpr = _fit(BPR, data_info, train_data, batch_size=256)
    _ptest_knn(bpr, user, item)

    with pytest.raises(ValueError):
        bpr.get_user_id(-1)
    with pytest.raises(ValueError):
        bpr.get_item_id(-1)
    assert bpr.get_user_id(user) == data_info.user2id[user]


def test_get_embeddings(pure_builds):
    train_data, *_, data_info = pure_builds
    model = _fit(RNN4Rec, data_info, train_data, batch_size=256)
    assert model.get_user_embedding().shape[0] == model.n_users
    assert model.get_user_embedding(include_bias=False).shape[1] == model.embed_size
    # the exported rows carry one trailing bias column
    assert (
        model.get_user_embedding(include_bias=True).shape[1]
        == model.embed_size + 1
    )
    u = list(data_info.user2id)[0]
    assert model.get_user_embedding(user=u, include_bias=False).size == model.embed_size

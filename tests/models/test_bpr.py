import numpy as np
import pytest

from librecommender_tpu.evaluation import evaluate
from librecommender_tpu.models import BPR

from tests.utils_models import ptest_preds, ptest_recommends, ptest_save_load


def test_bpr_end_to_end(pure_builds, pure_frames, tmp_path):
    train_data, eval_data, test_data, data_info = pure_builds
    model = BPR(
        "ranking", data_info, embed_size=8, n_epochs=3, lr=0.02,
        batch_size=256, num_neg=1,
    )
    model.fit(
        train_data,
        neg_sampling=True,
        verbose=2,
        eval_data=eval_data,
        metrics=["roc_auc", "precision", "recall", "ndcg"],
    )
    ptest_preds(model, "ranking", pure_frames)
    ptest_recommends(model, data_info, pure_frames)
    ptest_save_load(model, BPR, data_info, pure_frames, tmp_path)
    result = evaluate(model, test_data, neg_sampling=True, metrics=["roc_auc", "ndcg"])
    assert np.isfinite(result["roc_auc"])


def test_bpr_learns_ranking(pure_builds):
    """AUC on train data should beat random after training."""
    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=16, n_epochs=10, lr=0.05, batch_size=512)
    model.fit(train_data, neg_sampling=True, verbose=0)
    result = evaluate(model, train_data, neg_sampling=True, metrics=["roc_auc"])
    assert result["roc_auc"] > 0.6


def test_bpr_requires_ranking(pure_builds):
    *_, data_info = pure_builds
    with pytest.raises(ValueError):
        BPR("rating", data_info)


def test_bpr_requires_neg_sampling(pure_builds):
    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, n_epochs=1)
    with pytest.raises(ValueError):
        model.fit(train_data, neg_sampling=False, verbose=0)


def test_bpr_inference_only_save(pure_builds, tmp_path):
    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=8, n_epochs=1, lr=0.02, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = str(tmp_path / "bpr_inference")
    model.save(path, inference_only=True)
    loaded = BPR.load(path, "BPR")
    uid = list(data_info.user2id)[0]
    np.testing.assert_allclose(
        np.asarray(model.predict(user=uid, item=list(data_info.item2id)[0])),
        np.asarray(loaded.predict(user=uid, item=list(data_info.item2id)[0])),
        rtol=1e-5,
    )


def test_bpr_norm_embed(pure_builds):
    train_data, *_, data_info = pure_builds
    model = BPR(
        "ranking", data_info, embed_size=8, n_epochs=1, lr=0.01,
        batch_size=256, norm_embed=True,
    )
    model.fit(train_data, neg_sampling=True, verbose=0)
    # exported layout: user [factors(D), 1], item [factors(D), bias]
    u_fac = model.user_embeds_np[: data_info.n_users, :8]
    i_fac = model.item_embeds_np[: data_info.n_items, :8]
    np.testing.assert_allclose(np.linalg.norm(u_fac, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(i_fac, axis=1), 1.0, rtol=1e-5)

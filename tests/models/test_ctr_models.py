"""Parametrized tests over the CTR/feature model family, mirroring the
reference's per-model test style (e.g. tests/models/test_deepfm.py)."""
import numpy as np
import pytest

from librecommender_tpu.evaluation import evaluate
from librecommender_tpu.models import FM, NCF, AutoInt, DeepFM, WideDeep

from tests.utils_models import ptest_preds, ptest_recommends, ptest_save_load

MODELS = {
    "FM": (FM, {}),
    "DeepFM": (DeepFM, {"hidden_units": (32, 16)}),
    "WideDeep": (WideDeep, {"hidden_units": (32, 16)}),
    "AutoInt": (AutoInt, {"att_embed_size": (8, 8), "num_heads": 2}),
    "NCF": (NCF, {"hidden_units": (32, 16)}),
}


@pytest.mark.parametrize("name", list(MODELS))
@pytest.mark.parametrize("task", ["rating", "ranking"])
def test_ctr_model_end_to_end(feat_builds, feat_frames, name, task, tmp_path):
    train_data, eval_data, test_data, data_info = feat_builds
    cls, extra = MODELS[name]
    neg_sampling = task == "ranking"
    model = cls(
        task, data_info, embed_size=8, n_epochs=1, batch_size=256, **extra
    )
    model.fit(
        train_data,
        neg_sampling=neg_sampling,
        verbose=1,
        eval_data=eval_data,
    )
    ptest_preds(model, task, feat_frames)
    ptest_recommends(model, data_info, feat_frames)
    ptest_save_load(model, cls, data_info, feat_frames, tmp_path)
    metrics = ["rmse"] if task == "rating" else ["roc_auc", "ndcg"]
    result = evaluate(model, test_data, neg_sampling=neg_sampling, metrics=metrics)
    for m in metrics:
        assert np.isfinite(result[m])


def test_fm_learns(feat_builds):
    train_data, *_, data_info = feat_builds
    model = FM("ranking", data_info, embed_size=16, n_epochs=15, lr=0.05, batch_size=512)
    model.fit(train_data, neg_sampling=True, verbose=0)
    result = evaluate(model, train_data, neg_sampling=True, metrics=["roc_auc"])
    assert result["roc_auc"] > 0.6


def test_wide_deep_lr_validation(feat_builds):
    *_, data_info = feat_builds
    with pytest.raises(ValueError):
        WideDeep("ranking", data_info, lr=0.01)
    model = WideDeep("ranking", data_info, lr={"wide": 0.01, "deep": 1e-4})
    assert model.lr == {"wide": 0.01, "deep": 1e-4}


def test_multi_sparse_combiners(feat_frames):
    """Multi-sparse field groups pool into one embedding per combiner."""
    import pandas as pd

    from librecommender_tpu.data import DatasetFeat

    train, evals, _ = feat_frames
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
    for combiner in ("sum", "mean", "sqrtn", "normal"):
        model = FM(
            "ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
            multi_sparse_combiner=combiner,
        )
        model.fit(train_data, neg_sampling=True, verbose=0)
        u = train.user.iloc[0]
        assert np.isfinite(
            np.asarray(model.predict(user=u, item=train.item.iloc[0]))
        ).all()


def test_predict_data_with_feats(feat_builds, feat_frames):
    """Batched DataFrame scoring with explicit feature columns
    (reference libreco/prediction/predict.py:95)."""
    import pandas as pd
    import pytest as _pytest

    from librecommender_tpu.models import DeepFM
    from librecommender_tpu.prediction import predict_data_with_feats

    train_data, *_, data_info = feat_builds
    frame = feat_frames[0].head(50).copy()
    model = DeepFM("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)

    preds = predict_data_with_feats(model, frame, batch_size=16)
    assert preds.shape == (50,)
    assert np.all((preds >= 0) & (preds <= 1))

    # changing a feature column changes scores
    flipped = frame.copy()
    flipped["sex"] = np.where(flipped["sex"] == "m", "f", "m")
    preds_f = predict_data_with_feats(model, flipped)
    assert not np.allclose(preds, preds_f)

    # unknown feature values fall to the OOV bucket rather than raising
    weird = frame.copy()
    weird["sex"] = "never-seen"
    preds_w = predict_data_with_feats(model, weird)
    assert np.all(np.isfinite(preds_w))

    # missing feature column raises like the reference
    with _pytest.raises(ValueError, match="doesn't exist"):
        predict_data_with_feats(model, frame.drop(columns=["genre"]))

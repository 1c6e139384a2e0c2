"""AOT StableHLO serving artifacts (jax.export) — SavedModel analog.

Reference contract: libserving/serialization/tfmodel.py:17,37-66 exports a
frozen graph scoreable without the training library; here the artifact is
(predict.stablehlo, score_all.stablehlo, params npz, meta json), loaded by
``load_exported`` with no model class involved.
"""
import numpy as np
import pytest

from librecommender_tpu.models import DIN, DeepFM
from librecommender_tpu.serving import load_exported, save_exported


@pytest.mark.parametrize("family", ["DeepFM", "DIN", "WideDeep", "Transformer", "SIM"])
def test_exported_matches_model(feat_builds, family, tmp_path):
    train_data, *_, data_info = feat_builds
    from librecommender_tpu.models import SIM, Transformer, WideDeep

    cls = {"DeepFM": DeepFM, "DIN": DIN, "WideDeep": WideDeep,
           "Transformer": Transformer, "SIM": SIM}[family]
    kwargs = {"recent_num": 5} if family == "DIN" else {}
    if family == "WideDeep":
        kwargs = {"lr": {"wide": 0.01, "deep": 1e-3}}
    elif family == "Transformer":
        # f32 so the exported program bit-matches the in-process scorer
        kwargs = {"recent_num": 5, "hidden_units": (16,), "compute_dtype": "f32"}
    elif family == "SIM":
        kwargs = {"recent_num": 4, "long_max_len": 12, "search_topk": 3,
                  "hidden_units": (16,)}
    model = cls("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=256, **kwargs)
    model.fit(train_data, neg_sampling=True, verbose=0)
    save_exported(tmp_path, "m", model)
    scorer = load_exported(tmp_path, "m")

    users = np.array([0, 1, 2, 0], dtype=np.int32)
    items = np.array([3, 1, 0, 5], dtype=np.int32)
    got = scorer.predict(users, items)
    want = model.predict(users, items, inner_id=True)
    np.testing.assert_allclose(got, np.asarray(want).reshape(-1), rtol=1e-5)

    # full-catalog scores at a DIFFERENT batch size (symbolic dim)
    scores = scorer.score_all(np.array([0, 4, 2], dtype=np.int32))
    assert scores.shape == (3, data_info.n_items)
    model._ensure_inference_fns()
    want_all = np.asarray(model._recommend_fn(
        model.params, np.array([0, 4, 2], dtype=np.int32), 3
    ))
    np.testing.assert_allclose(scores, want_all, rtol=1e-5)

    top = scorer.recommend(np.array([0], dtype=np.int32), 5)
    assert top.shape == (1, 5)


def test_exported_dyn_matches_model(pure_builds, tmp_path):
    """DynEmbed export: the AOT user tower reproduces dyn_user_embedding
    for stored AND request-time sequences (online SavedModel analog)."""
    from librecommender_tpu.models import RNN4Rec
    from librecommender_tpu.serving import load_exported_dyn, save_exported

    train_data, *_, data_info = pure_builds
    model = RNN4Rec("ranking", data_info, embed_size=8, n_epochs=1,
                    batch_size=256, recent_num=5)
    model.fit(train_data, neg_sampling=True, verbose=0)
    save_exported(tmp_path, "dyn", model)  # dispatches to the dyn export
    scorer = load_exported_dyn(tmp_path, "dyn")

    # stored recent sequence
    uid = 3
    seq = np.asarray(model.recent_seq_table)[uid][None, :].astype(np.int32)
    got = scorer.user_embedding([uid], seq)
    want = model.dyn_user_embedding(uid, inner_id=True)
    d = want.shape[0]
    np.testing.assert_allclose(got[0, :d], want, rtol=1e-5)

    # request-time sequence, two users at once (symbolic batch)
    req = model._convert_seq([1, 2, 3], inner_id=True)[None, :]
    reqs = np.concatenate([req, req]).astype(np.int32)
    got2 = scorer.user_embedding([uid, 0], reqs)
    want2 = model.dyn_user_embedding(uid, seq=[1, 2, 3], inner_id=True)
    np.testing.assert_allclose(got2[0, :d], want2, rtol=1e-5)

    scores = scorer.score_all([uid])
    assert scores.shape == (1, data_info.n_items)
    # parity with the model's cached embedding scoring
    want_scores = model.user_embeds_np[uid] @ model.item_embeds_np[
        : data_info.n_items].T
    np.testing.assert_allclose(scores[0], want_scores, rtol=1e-4, atol=1e-5)


def test_exported_rating_clip(pure_feat_rating, tmp_path):
    train_data, data_info = pure_feat_rating
    model = DeepFM("rating", data_info, embed_size=8, n_epochs=1,
                   batch_size=256)
    model.fit(train_data, neg_sampling=False, verbose=0)
    save_exported(tmp_path, "r", model)
    scorer = load_exported(tmp_path, "r")
    got = scorer.predict([0, 1], [0, 1])
    assert (got >= scorer.meta["lower_bound"]).all()
    assert (got <= scorer.meta["upper_bound"]).all()
    want = model.predict([0, 1], [0, 1], inner_id=True)
    np.testing.assert_allclose(got, np.asarray(want).reshape(-1), rtol=1e-5)


@pytest.fixture
def pure_feat_rating(feat_frames):
    import pandas as pd

    from librecommender_tpu.data import DatasetFeat

    train, *_ = feat_frames
    train = train.copy()
    rng = np.random.default_rng(0)
    train["label"] = rng.integers(1, 6, len(train)).astype(np.float64)
    train_data, data_info = DatasetFeat.build_trainset(
        train, user_col=["sex", "age"], item_col=["genre"],
        sparse_col=["sex", "genre"], dense_col=["age"],
    )
    return train_data, data_info

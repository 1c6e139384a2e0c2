"""Shared assertion helpers mirroring the reference's tests/utils_pred.py,
utils_reco.py and utils_save_load.py."""
import numpy as np


def ptest_preds(model, task, pure_data_frames):
    train_frame = pure_data_frames[0]
    known_user = train_frame.user.iloc[0]
    known_item = train_frame.item.iloc[0]
    pred = model.predict(user=known_user, item=known_item)
    pred = float(np.asarray(pred).ravel()[0])
    if task == "rating":
        assert model.lower_bound <= pred <= model.upper_bound
    else:
        assert 0.0 <= pred <= 1.0
    # cold pair
    cold_pred = model.predict(user=-999999, item=-999999)
    assert np.all(np.isfinite(np.asarray(cold_pred)))
    # batch
    users = train_frame.user.iloc[:5].tolist()
    items = train_frame.item.iloc[:5].tolist()
    batch_preds = np.asarray(model.predict(user=users, item=items))
    assert batch_preds.shape == (5,)
    assert np.all(np.isfinite(batch_preds))


def ptest_recommends(model, data_info, pure_data_frames, with_feats=False):
    train_frame = pure_data_frames[0]
    known_user = train_frame.user.iloc[0]
    n_rec = 7
    recs = model.recommend_user(user=known_user, n_rec=n_rec)
    assert len(recs[known_user]) == n_rec
    # all recommended items exist in the catalog
    assert all(i in data_info.item2id for i in recs[known_user])
    # consumed filtering
    uid = data_info.user2id[known_user]
    consumed = set(data_info.user_consumed[uid])
    rec_inner = {data_info.item2id[i] for i in recs[known_user]}
    assert not (rec_inner & consumed), "consumed items must be filtered"
    # batch recommend incl. a cold user
    batch = [known_user, train_frame.user.iloc[1], -111111]
    recs = model.recommend_user(user=batch, n_rec=n_rec)
    assert len(recs) == 3
    for u in batch:
        assert len(recs[u]) == n_rec
    # popular cold start
    recs_pop = model.recommend_user(user=-111111, n_rec=n_rec, cold_start="popular")
    assert len(recs_pop[-111111]) == n_rec


def ptest_save_load(model, cls, data_info, pure_data_frames, tmp_path):
    train_frame = pure_data_frames[0]
    users = train_frame.user.iloc[:8].tolist()
    items = train_frame.item.iloc[:8].tolist()
    preds_before = np.asarray(model.predict(user=users, item=items))
    recs_before = model.recommend_user(user=users[0], n_rec=5)[users[0]]
    path = str(tmp_path / "model_save")
    model.save(path, model.model_name)
    loaded = cls.load(path, model.model_name)
    preds_after = np.asarray(loaded.predict(user=users, item=items))
    recs_after = loaded.recommend_user(user=users[0], n_rec=5)[users[0]]
    np.testing.assert_allclose(preds_before, preds_after, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(recs_before), np.asarray(recs_after))

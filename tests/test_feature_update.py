"""Retrain feature-layout invariants (reference analog: tests/
test_feature.py + retrain offset/OOV checks): after merge_trainset the
flat sparse index space stays consistent — offsets cover grown vocabs,
OOV slots sit at each column's end, and old values keep resolving to
rows that the grafting logic maps from the old layout."""
import numpy as np
import pandas as pd
import pytest

from librecommender_tpu.data import DatasetFeat


def _frame(n, seed, users=None, genres=("a", "b", "c")):
    rng = np.random.default_rng(seed)
    users = users if users is not None else rng.integers(0, 30, n)
    frame = pd.DataFrame({
        "user": users,
        "item": rng.integers(0, 40, n),
        "label": rng.integers(1, 6, n).astype(float),
    }).drop_duplicates(subset=["user", "item"])
    frame["sex"] = np.asarray(["m", "f"])[frame.user % 2]
    frame["genre"] = np.asarray(genres)[frame.item % len(genres)]
    frame["age"] = (frame.user % 50).astype(float)
    return frame


def _build(frame):
    return DatasetFeat.build_trainset(
        frame, user_col=["sex", "age"], item_col=["genre"],
        sparse_col=["sex", "genre"], dense_col=["age"],
    )


def test_flat_sparse_layout_invariants():
    train, di = _build(_frame(600, 0))
    offsets = np.asarray(di.sparse_offset)
    oovs = np.asarray(di.sparse_oov)
    # per-column blocks: [offset, oov] with oov at the block end
    assert offsets[0] == 0
    for f in range(len(offsets)):
        next_off = offsets[f + 1] if f + 1 < len(offsets) else oovs[-1] + 1
        assert oovs[f] == next_off - 1
    # unique tables index inside the flat space, never past the last OOV
    assert np.asarray(di.user_sparse_unique).max() <= oovs[-1]
    assert np.asarray(di.item_sparse_unique).max() <= oovs[-1]


def test_merge_extends_vocab_and_offsets():
    train, di = _build(_frame(600, 0))
    old_offsets = list(di.sparse_offset)
    old_size = int(np.asarray(di.sparse_oov)[-1]) + 1

    # new data introduces new users and a brand-new genre value "z"
    new = _frame(300, 9, users=np.random.default_rng(9).integers(25, 45, 300),
                 genres=("a", "b", "z"))
    merged, new_di = DatasetFeat.merge_trainset(new, di)
    new_offsets = list(new_di.sparse_offset)
    new_size = int(np.asarray(new_di.sparse_oov)[-1]) + 1
    assert new_size > old_size                 # vocab grew ("z" + new ages)
    assert new_di.n_users > di.n_users
    # old_info snapshot preserves the old layout for grafting
    oi = new_di.old_info
    assert oi is not None and oi.n_users == di.n_users
    assert list(oi.sparse_oov)  # recorded per-column old OOV positions

    # all columns still tile the flat space
    oovs = np.asarray(new_di.sparse_oov)
    for f in range(len(new_offsets)):
        nxt = new_offsets[f + 1] if f + 1 < len(new_offsets) else oovs[-1] + 1
        assert oovs[f] == nxt - 1


def test_merge_preserves_feature_resolution():
    """A user present in both datasets keeps resolving to the same raw
    feature values through the new layout."""
    base = _frame(600, 0)
    train, di = _build(base)
    new = _frame(300, 9)
    merged, new_di = DatasetFeat.merge_trainset(new, di)

    u_raw = base.user.iloc[0]
    old_uid = di.user2id[u_raw]
    new_uid = new_di.user2id[u_raw]
    # decode sex through each layout: index - column offset into unique vals
    def decode_sex(dinfo, uid):
        row = np.asarray(dinfo.user_sparse_unique)[uid]
        j = list(dinfo.user_sparse_col.name).index("sex")
        col_pos = dinfo.user_sparse_col.index[j]
        idx = row[j] - dinfo.sparse_offset[col_pos]
        vals = sorted(dinfo.sparse_unique_vals["sex"])
        return vals[int(idx)] if 0 <= idx < len(vals) else None

    assert decode_sex(di, old_uid) == decode_sex(new_di, new_uid)


def test_merge_eval_unknowns_map_to_oov():
    train, di = _build(_frame(600, 0))
    evals = DatasetFeat.build_evalset(
        _frame(100, 77, users=np.full(100, 10_000))  # unknown users
    )
    assert np.all(np.asarray(evals.user_indices) == di.n_users)


def test_assign_features_refresh_serving_tables():
    """assign_user/item_features must reach the HBM-resident tables and
    the jitted programs that baked them as constants (reference
    changing_feature_example.py flow)."""
    from librecommender_tpu.models import DeepFM

    frame = _frame(800, 3)
    train, di = _build(frame)
    model = DeepFM("ranking", di, embed_size=8, n_epochs=2, batch_size=256)
    model.fit(train, neg_sampling=True, verbose=0)
    u_raw = frame.user.iloc[0]
    i_raw = frame.item.iloc[0]
    before = float(model.predict(u_raw, i_raw))
    uid = di.user2id[u_raw]
    old_row = np.asarray(model.feats.user_sparse)[uid].copy()

    flip = "f" if frame[frame.user == u_raw].sex.iloc[0] == "m" else "m"
    di.assign_user_features(pd.DataFrame(
        {"user": [u_raw], "sex": [flip], "age": [49.0]}
    ))
    after = float(model.predict(u_raw, i_raw))
    new_row = np.asarray(model.feats.user_sparse)[uid]
    assert not np.array_equal(old_row, new_row)  # device copy refreshed
    assert before != after                        # program re-baked

    # dense side too, through the batch-recommend path
    di.assign_user_features(pd.DataFrame(
        {"user": [u_raw], "sex": [flip], "age": [0.0]}
    ))
    recs = model.recommend_user(user=u_raw, n_rec=5)
    assert len(recs[u_raw]) == 5
    assert float(np.asarray(model.feats.user_dense)[uid][0]) == 0.0

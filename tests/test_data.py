"""Data-pipeline unit tests (reference: tests/test_data.py, test_feature.py,
test_split_data.py, test_consumed.py, test_multi_sparse_processing.py)."""
import numpy as np
import pandas as pd
import pytest

from librecommender_tpu.data import (
    DatasetFeat,
    DatasetPure,
    process_data,
    random_split,
    split_by_num,
    split_by_ratio,
    split_by_ratio_chrono,
    split_multi_value,
)

from tests.conftest import make_feat_interactions, make_interactions


def test_build_trainset_id_mapping():
    frame = make_interactions(n_rows=500)
    train_data, data_info = DatasetPure.build_trainset(frame)
    assert data_info.n_users == frame.user.nunique()
    assert data_info.n_items == frame.item.nunique()
    # inner ids are ordinal positions in sorted unique values
    u_sorted = np.sort(frame.user.unique())
    assert data_info.user2id[u_sorted[0]] == 0
    assert data_info.id2user[0] == u_sorted[0]
    assert len(train_data) == len(frame)
    assert train_data.user_indices.max() == data_info.n_users - 1


def test_evalset_oov_mapping():
    frame = make_interactions(n_rows=500)
    train = frame.iloc[:400]
    DatasetPure.build_trainset(train)
    evals = frame.iloc[400:].copy()
    evals.iloc[0, 0] = -42  # unknown user
    eval_data = DatasetPure.build_evalset(evals)
    n_users = train.user.nunique()
    assert eval_data.user_indices[0] == n_users  # OOV id


def test_evalset_requires_trainset_first():
    DatasetPure.train_called = False
    with pytest.raises(RuntimeError):
        DatasetPure.build_evalset(make_interactions(n_rows=50))


def test_feat_layout_offsets_and_oov():
    frame = make_feat_interactions()
    train_data, data_info = DatasetFeat.build_trainset(
        frame,
        user_col=["sex", "age"],
        item_col=["genre"],
        sparse_col=["sex", "genre"],
        dense_col=["age"],
    )
    # flat layout: sex gets [0, n_sex], genre after with its own OOV
    n_sex = frame.sex.nunique()
    n_genre = frame.genre.nunique()
    np.testing.assert_array_equal(data_info.sparse_offset, [0, n_sex + 1])
    np.testing.assert_array_equal(
        data_info.sparse_oov, [n_sex, n_sex + 1 + n_genre]
    )
    # unique feature tables: one row per id + trailing OOV row
    assert data_info.user_sparse_unique.shape[0] == data_info.n_users + 1
    assert data_info.item_sparse_unique.shape[0] == data_info.n_items + 1
    # OOV row holds the per-column OOV indices
    np.testing.assert_array_equal(
        data_info.user_sparse_unique[-1], [n_sex]
    )
    # sample matrix indexes directly into the flat space
    assert train_data.sparse_indices.max() <= data_info.sparse_oov[-1]


def test_multi_sparse_layout():
    frame = make_feat_interactions()
    frame = frame.copy()
    frame["genre2"] = frame["genre"]
    frame["genre3"] = "missing"
    train_data, data_info = DatasetFeat.build_trainset(
        frame,
        user_col=["sex"],
        item_col=["genre", "genre2", "genre3"],
        sparse_col=["sex"],
        dense_col=None,
        multi_sparse_col=[["genre", "genre2", "genre3"]],
    )
    info = data_info.multi_sparse_combine_info
    assert list(info.field_offset) == [1]      # after the plain 'sex' field
    assert list(info.field_len) == [3]
    # all three sub-columns share one vocab + OOV
    n_genre = frame.genre.nunique()
    assert info.feat_oov[0] == data_info.sparse_oov[1]
    assert data_info.sparse_oov[1] == data_info.sparse_offset[1] + n_genre
    # pad value maps to the field OOV
    col3 = train_data.sparse_indices[:, 3]
    assert np.all(col3 == info.feat_oov[0])


def test_random_split_ratios():
    frame = make_interactions(n_rows=1000)
    train, evals, test = random_split(frame, multi_ratios=[0.8, 0.1, 0.1],
                                      filter_unknown=False)
    total = len(train) + len(evals) + len(test)
    assert total == len(frame)
    assert abs(len(train) / total - 0.8) < 0.02


def test_split_filter_unknown():
    frame = make_interactions(n_rows=1000)
    train, test = random_split(frame, test_size=0.2, seed=0)
    assert set(test.user) <= set(train.user)
    assert set(test.item) <= set(train.item)


def test_split_by_ratio_chrono_per_user():
    frame = make_interactions(n_rows=800)
    frame["time"] = np.arange(len(frame))
    train, test = split_by_ratio_chrono(frame, test_size=0.25)
    # every test row of a user comes after their train rows (chrono)
    merged_train = train.groupby("user")["time"].max()
    merged_test = test.groupby("user")["time"].min()
    both = merged_train.index.intersection(merged_test.index)
    assert (merged_test[both].values > merged_train[both].values).all()


def test_split_by_num():
    frame = make_interactions(n_rows=800)
    train, test = split_by_num(frame, test_size=2)
    counts = test.groupby("user").size()
    assert counts.max() <= 2


def test_process_data_normalizer():
    frame = make_feat_interactions()
    frame["age"] = np.abs(frame["age"] * 25 + 35)
    (out,), cols = process_data([frame.copy()], dense_col=["age"],
                                normalizer="min_max", transformer=None)
    assert out["age"].min() >= 0.0 and out["age"].max() <= 1.0
    with pytest.raises(ValueError):
        process_data(frame, dense_col="age")


def test_split_multi_value():
    frame = pd.DataFrame({
        "user": [1, 2, 3],
        "item": [10, 20, 30],
        "label": [1.0, 1.0, 1.0],
        "genres": ["a|b", "b", "a|b|c"],
    })
    out, multi_cols, user_cols, item_cols = split_multi_value(
        frame, ["genres"], sep="|", item_col=["genres"]
    )
    assert multi_cols == [["genres_1", "genres_2", "genres_3"]]
    assert out.loc[0, "genres_1"] == "a" and out.loc[0, "genres_3"] == "missing"
    assert item_cols == ["genres_1", "genres_2", "genres_3"]


def test_consumed_order_preserved():
    frame = pd.DataFrame({
        "user": [5, 5, 5, 7],
        "item": [30, 10, 20, 10],
        "label": [1.0, 1.0, 1.0, 1.0],
    })
    _, data_info = DatasetPure.build_trainset(frame)
    u = data_info.user2id[5]
    consumed_items = [data_info.id2item[i] for i in data_info.user_consumed[u]]
    assert consumed_items == [30, 10, 20]


def test_interaction_consumed_reference_battery():
    """Port of reference tests/test_consumed.py::test_remove_consecutive_
    duplicates — only CONSECUTIVE duplicates drop; revisits stay."""
    from librecommender_tpu.data.consumed import interaction_consumed

    user_indices = [1, 1, 1, 2, 2, 1, 2, 3, 2, 3]
    item_indices = [11, 11, 999, 0, 11, 11, 999, 11, 999, 0]
    user_consumed, item_consumed = interaction_consumed(
        user_indices, item_indices
    )
    assert isinstance(user_consumed, dict)
    assert isinstance(user_consumed[1], list)
    assert user_consumed[1] == [11, 999, 11]
    assert user_consumed[2] == [0, 11, 999]
    assert user_consumed[3] == [11, 0]
    assert item_consumed[11] == [1, 2, 1, 3]
    assert item_consumed[999] == [1, 2]
    assert item_consumed[0] == [2, 3]


def test_consumed_merge_reference_battery():
    """Port of reference tests/test_consumed.py::test_merge_remove_
    duplicates + test_no_merge — retrain merge concatenates old + new;
    no-merge keeps new rows and fills the rest from old."""
    from librecommender_tpu.data.consumed import _fill_empty, _merge_dedup

    old = {0: [1, 2, 3], 1: [4, 5]}
    new = {0: [2, 1], 2: [7, 8]}
    merged = _merge_dedup(new, 3, old)
    assert merged[0] == [1, 2, 3, 2, 1]
    assert merged[1] == [4, 5]
    assert merged[2] == [7, 8]

    old = {0: [1, 2, 3], 1: [4, 5], 2: [0], 3: [99]}
    filled = _fill_empty(new, 4, old)
    assert filled[0] == [2, 1]
    assert filled[1] == [4, 5]
    assert filled[2] == [7, 8]
    assert filled[3] == [99]


def test_split_multi_value_reference_battery():
    """Port of reference tests/test_multi_sparse_processing.py: max_len
    type check raises; a wrong separator leaves every row one value wide
    (all pads beyond genre_1); column layout matches exactly."""
    def genre_frame():
        return pd.DataFrame({
            "user": [1, 2, 3], "item": [10, 20, 30],
            "label": [1.0, 1.0, 1.0], "time": [3, 2, 1],
            "sex": ["m", "f", "m"], "age": [22, 31, 18],
            "occupation": [0, 1, 2],
            "genre": ["a|b", "b", "a|b|c"],
        })

    with pytest.raises(AssertionError):
        split_multi_value(genre_frame(), ["genre"], sep="|", max_len=3)

    out, *_ = split_multi_value(
        genre_frame(), ["genre"], sep=",", max_len=[3], pad_val="missing",
        user_col=["sex", "age", "occupation"], item_col=["genre"],
    )
    assert all(out["genre_2"].str.contains("missing"))
    assert all(out["genre_3"].str.contains("missing"))

    out, multi_cols, user_cols, item_cols = split_multi_value(
        genre_frame(), ["genre"], sep="|", max_len=[3], pad_val="missing",
        user_col=["sex", "age", "occupation"], item_col=["genre"],
    )
    assert multi_cols == [["genre_1", "genre_2", "genre_3"]]
    assert user_cols == []
    assert item_cols == ["genre_1", "genre_2", "genre_3"]
    cols = out.columns.tolist()
    assert "genre" not in cols
    assert cols == ["user", "item", "label", "time", "sex", "age",
                    "occupation", "genre_1", "genre_2", "genre_3"]


def test_merge_trainset_consumed_merge():
    frame = make_interactions(n_rows=400)
    _, data_info = DatasetPure.build_trainset(frame)
    u_raw = frame.user.iloc[0]
    old_count = len(data_info.user_consumed[data_info.user2id[u_raw]])
    new_frame = pd.DataFrame({
        "user": [u_raw], "item": [frame.item.iloc[-1]], "label": [1.0],
    })
    _, new_info = DatasetPure.merge_trainset(new_frame, data_info)
    new_count = len(new_info.user_consumed[new_info.user2id[u_raw]])
    assert new_count >= old_count  # behavior merged, not replaced


def test_negative_samplers():
    from librecommender_tpu.sampling import (
        negatives_from_popular,
        negatives_from_random,
        negatives_from_unconsumed,
    )

    rng = np.random.default_rng(0)
    pos = np.array([1, 2, 3, 4] * 25)
    negs = negatives_from_random(rng, 100, pos, num_neg=2)
    assert negs.shape == (200,)
    assert not np.any(negs == np.repeat(pos, 2))
    probs = np.ones(100) / 100
    negs_p = negatives_from_popular(rng, 100, pos, num_neg=1, probs=probs)
    assert negs_p.shape == (100,)
    consumed = {0: {1, 2, 3}}
    negs_u = negatives_from_unconsumed(
        consumed, np.zeros(50, int), np.ones(50, int), 10, 1
    )
    assert not np.any(np.isin(negs_u, [1, 2, 3]))

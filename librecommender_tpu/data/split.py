"""Data splitting utilities.

Reference parity: libreco/data/split.py:8,120,211,298,344. Per-user splits are
implemented with vectorized grouping.
"""
import math

import numpy as np


def random_split(
    data,
    shuffle=True,
    test_size=None,
    multi_ratios=None,
    filter_unknown=True,
    pad_unknown=False,
    pad_val=None,
    seed=42,
):
    """Split rows randomly into 2+ parts.

    Examples
    --------
    >>> train, test = random_split(data, test_size=0.2)
    >>> train, evals, test = random_split(data, multi_ratios=[0.8, 0.1, 0.1])
    """
    ratios, n_splits = _check_and_convert_ratio(test_size, multi_ratios)
    ratios = list(ratios)

    n = len(data)
    rng = np.random.default_rng(seed)
    order = rng.permutation(n) if shuffle else np.arange(n)
    boundaries = np.round(np.cumsum(ratios)[:-1] * n).astype(int)
    parts = np.split(order, boundaries)
    split_data_all = [data.iloc[np.sort(p) if not shuffle else p] for p in parts]

    return _handle_unknown(split_data_all, filter_unknown, pad_unknown, pad_val)


def split_by_ratio(
    data,
    order=True,
    shuffle=False,
    test_size=None,
    multi_ratios=None,
    filter_unknown=True,
    pad_unknown=False,
    pad_val=None,
    seed=42,
):
    """Assign a ratio of every user's items to each split (rare users with
    <= 3 interactions stay fully in train)."""
    assert "user" in data.columns, "data must contain user column"
    ratios, n_splits = _check_and_convert_ratio(test_size, multi_ratios)

    user_split_indices = _groupby_user(data["user"].to_numpy(), order)
    cum_ratios = np.cumsum(ratios).tolist()[:-1]
    split_indices_all = [[] for _ in range(n_splits)]
    for u_data in user_split_indices:
        u_len = len(u_data)
        if u_len <= 3:
            split_indices_all[0].extend(u_data)
        else:
            boundaries = [round(cum * u_len) for cum in cum_ratios]
            for i, part in enumerate(np.split(u_data, boundaries)):
                split_indices_all[i].extend(part.tolist())

    if shuffle:
        np_rng = np.random.default_rng(seed)
        split_data_all = [data.iloc[np_rng.permutation(idx)] for idx in split_indices_all]
    else:
        split_data_all = [data.iloc[idx] for idx in split_indices_all]
    return _handle_unknown(split_data_all, filter_unknown, pad_unknown, pad_val)


def split_by_num(
    data,
    order=True,
    shuffle=False,
    test_size=1,
    filter_unknown=True,
    pad_unknown=False,
    pad_val=None,
    seed=42,
):
    """Assign each user's last ``test_size`` items to the test split."""
    assert "user" in data.columns, "data must contain user column"
    assert isinstance(test_size, int), "test_size must be int value"
    assert 0 < test_size < len(data), "test_size must be in (0, len(data))"

    user_split_indices = _groupby_user(data["user"].to_numpy(), order)
    train_indices, test_indices = [], []
    for u_data in user_split_indices:
        u_len = len(u_data)
        if u_len <= 3:
            train_indices.extend(u_data)
        elif u_len <= test_size:
            train_indices.extend(u_data[:-1])
            test_indices.extend(u_data[-1:])
        else:
            train_indices.extend(u_data[:-test_size])
            test_indices.extend(u_data[-test_size:])

    if shuffle:
        np_rng = np.random.default_rng(seed)
        train_indices = np_rng.permutation(train_indices)
        test_indices = np_rng.permutation(test_indices)
    split_data_all = [data.iloc[train_indices], data.iloc[test_indices]]
    return _handle_unknown(split_data_all, filter_unknown, pad_unknown, pad_val)


def split_by_ratio_chrono(
    data, order=True, shuffle=False, test_size=None, multi_ratios=None, seed=42
):
    """Like :func:`split_by_ratio`, with rows sorted by a ``time`` column first."""
    assert "user" in data.columns and "time" in data.columns, (
        "data must contain user and time column"
    )
    data = data.sort_values(by=["time"]).reset_index(drop=True)
    return split_by_ratio(data, order, shuffle, test_size, multi_ratios, seed=seed)


def split_by_num_chrono(data, order=True, shuffle=False, test_size=1, seed=42):
    """Like :func:`split_by_num`, with rows sorted by a ``time`` column first."""
    assert "user" in data.columns and "time" in data.columns, (
        "data must contain user and time column"
    )
    data = data.sort_values(by=["time"]).reset_index(drop=True)
    return split_by_num(data, order, shuffle, test_size, seed=seed)


def _handle_unknown(split_data_all, filter_unknown, pad_unknown, pad_val):
    if filter_unknown:
        return _filter_unknown_user_item(split_data_all)
    if pad_unknown and pad_val is not None:
        return _pad_unknown_user_item(split_data_all, pad_val)
    return split_data_all


def _filter_unknown_user_item(data_list):
    """Drop eval/test rows whose user or item never appears in train."""
    train_data = data_list[0]
    unique_users = set(train_data["user"].tolist())
    unique_items = set(train_data["item"].tolist())
    result = [train_data]
    for test_data in data_list[1:]:
        known = test_data["user"].isin(unique_users) & test_data["item"].isin(unique_items)
        result.append(test_data[known])
    return result


def _pad_unknown_user_item(data_list, pad_val):
    if isinstance(pad_val, (list, tuple)):
        user_pad_val, item_pad_val = pad_val
    else:
        user_pad_val = item_pad_val = pad_val
    train_data = data_list[0]
    unique_users = set(train_data["user"].tolist())
    unique_items = set(train_data["item"].tolist())
    result = [train_data]
    for test_data in data_list[1:]:
        test_data = test_data.copy()
        test_data.loc[~test_data["user"].isin(unique_users), "user"] = user_pad_val
        test_data.loc[~test_data["item"].isin(unique_items), "item"] = item_pad_val
        result.append(test_data)
    return result


def _groupby_user(user_indices, order):
    """Row positions grouped per user; stable within a user if order=True."""
    sort_kind = "mergesort" if order else "quicksort"
    _, user_position, user_counts = np.unique(
        user_indices, return_inverse=True, return_counts=True
    )
    return np.split(
        np.argsort(user_position, kind=sort_kind), np.cumsum(user_counts)[:-1]
    )


def _check_and_convert_ratio(test_size, multi_ratios):
    if not test_size and not multi_ratios:
        raise ValueError("must provide either 'test_size' or 'multi_ratios'")
    if test_size is not None:
        assert isinstance(test_size, float), "test_size must be float value"
        assert 0.0 < test_size < 1.0, "test_size must be in (0.0, 1.0)"
        return [1 - test_size, test_size], 2
    if isinstance(multi_ratios, (list, tuple)):
        assert len(multi_ratios) > 1, "multi_ratios must at least have two elements"
        assert all(r > 0.0 for r in multi_ratios), "ratios should be positive values"
        total = math.fsum(multi_ratios)
        ratios = [r / total for r in multi_ratios] if total != 1.0 else list(multi_ratios)
        return ratios, len(ratios)
    raise ValueError("multi_ratios should be list or tuple")

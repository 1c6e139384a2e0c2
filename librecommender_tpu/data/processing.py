"""Raw-data preprocessing: dense normalization and multi-value splitting.

Reference parity: libreco/data/processing.py:10 (process_data),
:79 (split_multi_value).
"""
import numpy as np
from sklearn.preprocessing import (
    MinMaxScaler,
    PowerTransformer,
    RobustScaler,
    StandardScaler,
)

_SCALERS = {
    "min_max": MinMaxScaler,
    "standard": StandardScaler,
    "robust": RobustScaler,
    "power": PowerTransformer,
}


def process_data(
    data, dense_col=None, normalizer="min_max", transformer=("log", "sqrt", "square")
):
    """Normalize dense columns and optionally append transformed variants.

    ``data`` may be one DataFrame or a (train, *rest) sequence; the scaler is
    fit on the first frame only.
    """
    if not isinstance(dense_col, list):
        raise ValueError("dense_col must be a list...")
    if normalizer.lower() not in _SCALERS:
        raise ValueError("unknown normalize type...")
    scaler = _SCALERS[normalizer.lower()]()

    frames = data if isinstance(data, (list, tuple)) else [data]
    dense_col_transformed = dense_col.copy()
    for i, frame in enumerate(frames):
        if i == 0:
            frame[dense_col] = scaler.fit_transform(frame[dense_col]).astype(np.float32)
        else:
            frame[dense_col] = scaler.transform(frame[dense_col]).astype(np.float32)
        for col in dense_col:
            if frame[col].min() < 0.0:
                print("can't transform negative values...")
                continue
            for name, fn in (("log", np.log1p), ("sqrt", np.sqrt), ("square", np.square)):
                if transformer is not None and name in transformer:
                    new_col = f"{col}_{name}"
                    frame[new_col] = fn(frame[col])
                    if i == 0:
                        dense_col_transformed.append(new_col)
    return data, dense_col_transformed


def split_multi_value(
    data,
    multi_value_col,
    sep,
    max_len=None,
    pad_val="missing",
    user_col=None,
    item_col=None,
):
    """Expand delimiter-separated multi-value columns into padded sub-columns.

    Returns (data, nested multi_sparse column names, user sub-columns, item
    sub-columns).
    """
    if max_len is not None:
        assert isinstance(max_len, (list, tuple)), "`max_len` must be list or tuple"
        assert len(max_len) == len(multi_value_col), (
            "`max_len` must have same length as `multi_value_col`"
        )
    if not isinstance(pad_val, (list, tuple)):
        pad_val = [pad_val] * len(multi_value_col)
    assert len(multi_value_col) == len(pad_val), (
        "length of `multi_sparse_col` and `pad_val` doesn't match"
    )

    user_sparse_col, item_sparse_col, multi_sparse_col = [], [], []
    for j, col in enumerate(multi_value_col):
        data[col] = (
            data[col].str.strip(sep + " ").str.replace("\\s+", "", regex=True).str.lower()
        )
        data.loc[data[col] == "", col] = pad_val[j]
        split_col = data[col].str.split(sep)
        col_len = int(split_col.str.len().max()) if max_len is None else max_len[j]
        sub_cols = []
        for i in range(col_len):
            name = f"{col}_{i + 1}"
            sub_cols.append(name)
            data[name] = split_col.str.get(i).fillna(pad_val[j])
        multi_sparse_col.append(sub_cols)
        if user_col is not None and col in user_col:
            user_sparse_col.extend(sub_cols)
        elif item_col is not None and col in item_col:
            item_sparse_col.extend(sub_cols)

    data = data.fillna(pad_val[0]).drop(multi_value_col, axis=1)
    return data, multi_sparse_col, user_sparse_col, item_sparse_col

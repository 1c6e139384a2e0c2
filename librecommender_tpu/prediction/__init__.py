"""Batched DataFrame prediction with explicit features.

Reference parity: libreco/prediction/predict.py:95
(``predict_data_with_feats``) — score whole DataFrames of (user, item)
pairs where every sparse/dense feature column comes from the frame itself
rather than the stored unique tables. Sequences still come from each
user's cached recent history (predict.py:112 ``get_cached_seqs``), and SIM
scores through its inference output (the second stage) because
``_forward(train=False)`` is exactly that head.
"""
import numpy as np
import pandas as pd

from ..ops.features import rows_from_dataframe

__all__ = ["predict_data_with_feats"]


def predict_data_with_feats(
    model, data, batch_size=None, cold_start="average", inner_id=False
):
    """Score every (user, item) row of ``data`` with the frame's features.

    Parameters mirror the reference: ``data`` must be a DataFrame whose
    first columns are user and item plus ALL sparse/dense feature columns
    of the model; missing feature columns raise. Unknown users/items score
    through the OOV rows ('average') or raise if ``cold_start`` is invalid.
    """
    assert isinstance(data, pd.DataFrame), "Data must be pandas DataFrame"
    if cold_start not in ("average", "popular"):
        raise ValueError(f"Unknown cold start strategy: {cold_start}")
    import jax.numpy as jnp

    users, items = model.convert_ids(data.user, data.item, inner_id)
    sparse_rows, dense_rows = rows_from_dataframe(model.data_info, data)
    n = len(data)
    if not batch_size:
        batch_size = n
    preds = np.zeros(n, dtype=np.float32)
    for start in range(0, n, batch_size):
        sl = slice(start, start + batch_size)
        inputs = {
            "user": jnp.asarray(users[sl], jnp.int32),
            "item": jnp.asarray(items[sl], jnp.int32),
        }
        if sparse_rows is not None:
            inputs["sparse_row_full"] = jnp.asarray(sparse_rows[sl])
        if dense_rows is not None:
            inputs["dense_row_full"] = jnp.asarray(dense_rows[sl])
        preds[sl] = np.asarray(
            model._forward(model.params, inputs, train=False, rng=None)
        )
    if model.task == "rating":
        preds = np.clip(preds, model.lower_bound, model.upper_bound)
    else:
        preds = 1.0 / (1.0 + np.exp(-preds))
    return preds

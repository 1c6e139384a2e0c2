"""Retrain-time parameter grafting: old weights into enlarged-vocab models.

Reference parity: libreco/tfops/rebuild.py:12 + tfops/variables.py:18,74 and
torchops/rebuild.py:13,119 — after ``merge_trainset`` produces a DataInfo
with a bigger vocabulary (and ``old_info`` snapshot), a newly-built model's
embedding rows are overwritten with the old trained rows:

- user/item tables: rows [0, old_n) copy over (appended ids keep fresh
  init); the old OOV row moves to the new OOV position.
- flat sparse tables: each field's block moves from its old offset to its
  new offset (vocab values are appended in order, so within-field positions
  are stable); old per-field OOV rows move to the new OOV positions.
- everything with an identical shape (dense layers, etc.) copies verbatim.

Optimizer continuity: the same grafting maps Adam's mu/nu accumulators
(reference `match_adam`), so retraining resumes with warm optimizer state.
"""
import numpy as np

import jax
import jax.numpy as jnp

USER_ROW_KEYS = ("user_embed", "user_bias", "linear_user")
ITEM_ROW_KEYS = ("item_embed", "item_embed_in", "item_bias", "linear_item",
                 "context_embed")
SPARSE_ROW_KEYS = ("sparse_embed", "linear_sparse")


def _old_sparse_layout(old_info):
    """[(col_idx, old_offset, old_len, old_oov)] per real field."""
    layout = []
    offset = 0
    oov_iter = iter(old_info.sparse_oov)
    for col_idx, length in enumerate(old_info.sparse_len):
        if length == -1:
            continue  # redundant multi-sparse sub-column
        layout.append((col_idx, offset, length, next(oov_iter)))
        offset += length + 1
    return layout


def _graft_rows(old, new, old_n, new_n):
    out = np.array(new)
    old = np.asarray(old)
    take = min(old_n, old.shape[0], out.shape[0])
    out[:take] = old[:take]
    # old OOV row -> new OOV position
    if old.shape[0] > old_n and out.shape[0] > new_n:
        out[new_n] = old[old_n]
    return out


def _graft_sparse_rows(old, new, old_info, data_info):
    out = np.array(new)
    old = np.asarray(old)
    new_offset = data_info.sparse_offset
    new_oov = data_info.sparse_oov
    for col_idx, old_off, old_len, old_oov in _old_sparse_layout(old_info):
        n_off = int(new_offset[col_idx])
        take = min(old_len, old.shape[0] - old_off)
        if take > 0:
            out[n_off : n_off + take] = old[old_off : old_off + take]
        if old_oov < old.shape[0] and int(new_oov[col_idx]) < out.shape[0]:
            out[int(new_oov[col_idx])] = old[old_oov]
    return out


def graft_leaf(name, old, new, data_info):
    old_info = data_info.old_info
    old_arr, new_arr = np.asarray(old), np.asarray(new)
    if name in USER_ROW_KEYS:
        return _graft_rows(old_arr, new_arr, old_info.n_users, data_info.n_users)
    if name in ITEM_ROW_KEYS:
        return _graft_rows(old_arr, new_arr, old_info.n_items, data_info.n_items)
    if name in SPARSE_ROW_KEYS:
        return _graft_sparse_rows(old_arr, new_arr, old_info, data_info)
    if old_arr.shape == new_arr.shape:
        return old_arr
    return new_arr  # shape changed and no rule: keep fresh init


def graft_params(old_params, new_params, data_info):
    """Graft a params pytree (nested dicts/lists with named leaves)."""

    def rec(name, old, new):
        if isinstance(new, dict):
            return {
                k: rec(k, old.get(k), new[k]) if isinstance(old, dict) else new[k]
                for k in new
            }
        if isinstance(new, (list, tuple)):
            if not isinstance(old, (list, tuple)) or len(old) != len(new):
                return new
            out = [rec(name, o, n) for o, n in zip(old, new)]
            return type(new)(out) if isinstance(new, tuple) else out
        if old is None:
            return new
        return jnp.asarray(graft_leaf(name, old, new, data_info))

    return rec("", old_params, new_params)


def graft_opt_state(old_state, new_state, params, data_info):
    """Graft optimizer state: any subtree structurally matching the params
    pytree (Adam mu/nu) is grafted like params; scalars copy over."""
    params_treedef = jax.tree_util.tree_structure(params)

    def is_params_like(x):
        try:
            return jax.tree_util.tree_structure(x) == params_treedef
        except Exception:
            return False

    def rec(old, new, name=""):
        if is_params_like(new) and is_params_like(old):
            return graft_params(old, new, data_info)
        if isinstance(new, (list, tuple)) and isinstance(old, (list, tuple)) \
                and len(new) == len(old):
            out = [rec(o, n, name) for o, n in zip(old, new)]
            return type(new)(*out) if hasattr(new, "_fields") else (
                type(new)(out) if isinstance(new, tuple) else out
            )
        if isinstance(new, dict) and isinstance(old, dict) and set(new) == set(old):
            # carry key names down so table-keyed moment dicts (the sparse
            # LazyAdam state {"mu": {"user_embed": ...}}) row-graft like
            # their params instead of resetting on vocab growth
            return {k: rec(old[k], new[k], k) for k in new}
        old_arr = np.asarray(old) if not isinstance(old, (dict, list, tuple)) else None
        new_arr = np.asarray(new) if not isinstance(new, (dict, list, tuple)) else None
        if old_arr is not None and new_arr is not None:
            if old_arr.shape == new_arr.shape:
                return jnp.asarray(old_arr)
            return jnp.asarray(graft_leaf(name, old_arr, new_arr, data_info))
        return new

    return rec(old_state, new_state)

"""Device-resident unique feature tables + per-sample assembly.

This is the TPU-first replacement for the reference's host-side collator
feature assembly (libreco/batch/collators.py:468, tfops/features.py:239-307):
the per-user / per-item unique feature rows (DataInfo's
``user_sparse_unique`` etc., incl. trailing OOV row) are pushed to HBM once
at model-build time; every train/predict/recommend step gathers them on
device from the (user, item) id arrays. The hot loop moves only int32 ids
over PCIe.
"""
import jax.numpy as jnp
import numpy as np

from ..utils.validate import sparse_feat_size


class FeatureTables:
    """Static feature layout + device arrays for one DataInfo."""

    def __init__(self, data_info):
        self.data_info = data_info
        # snapshot of DataInfo.feature_version: assign_user/item_features
        # bumps it, signalling models to re-upload these tables (and re-bake
        # the jitted programs that captured them as constants)
        self.version = getattr(data_info, "feature_version", 0)
        self.n_sparse_fields = len(data_info.sparse_col.name)
        self.n_dense_fields = len(data_info.dense_col.name)
        self.sparse_vocab = sparse_feat_size(data_info)
        self.multi_sparse_info = data_info.multi_sparse_combine_info

        # static column layout: position lists into the full field order
        self.user_sparse_pos = list(data_info.user_sparse_col.index)
        self.item_sparse_pos = list(data_info.item_sparse_col.index)
        self.user_dense_pos = list(data_info.user_dense_col.index)
        self.item_dense_pos = list(data_info.item_dense_col.index)

        def _dev(arr, dtype):
            return None if arr is None else jnp.asarray(np.asarray(arr, dtype))

        self.user_sparse = _dev(data_info.user_sparse_unique, np.int32)
        self.item_sparse = _dev(data_info.item_sparse_unique, np.int32)
        self.user_dense = _dev(data_info.user_dense_unique, np.float32)
        self.item_dense = _dev(data_info.item_dense_unique, np.float32)

    @property
    def has_sparse(self):
        return self.n_sparse_fields > 0

    @property
    def has_dense(self):
        return self.n_dense_fields > 0

    def sparse_for(self, users, items, user_rows=None, item_rows=None):
        """(B,) user ids + (B,) item ids -> (B, F) sparse indices in full
        field order, or None. ``user_rows``/``item_rows`` override the
        table gather with explicit (B, F_u)/(B, F_i) rows (request-time
        temporary features, reference recommendation/preprocess.py
        `set_temp_feats`)."""
        if not self.has_sparse:
            return None
        cols = [None] * self.n_sparse_fields
        if self.user_sparse is not None or user_rows is not None:
            rows = user_rows if user_rows is not None else self.user_sparse[users]
            for j, pos in enumerate(self.user_sparse_pos):
                cols[pos] = rows[:, j]
        if self.item_sparse is not None or item_rows is not None:
            rows = item_rows if item_rows is not None else self.item_sparse[items]
            for j, pos in enumerate(self.item_sparse_pos):
                cols[pos] = rows[:, j]
        return jnp.stack(cols, axis=1)

    def dense_for(self, users, items, user_rows=None, item_rows=None):
        if not self.has_dense:
            return None
        cols = [None] * self.n_dense_fields
        if self.user_dense is not None or user_rows is not None:
            rows = user_rows if user_rows is not None else self.user_dense[users]
            for j, pos in enumerate(self.user_dense_pos):
                cols[pos] = rows[:, j]
        if self.item_dense is not None or item_rows is not None:
            rows = item_rows if item_rows is not None else self.item_dense[items]
            for j, pos in enumerate(self.item_dense_pos):
                cols[pos] = rows[:, j]
        return jnp.stack(cols, axis=1)

    def build_user_sparse_row(self, uid, user_feats):
        """Host-side: the stored user sparse row with named overrides
        applied; values map through sparse_idx_mapping + offsets, unknown
        values fall to the column OOV."""
        import numpy as np

        data_info = self.data_info
        row = np.array(np.asarray(data_info.user_sparse_unique)[uid])
        name_to_j = {
            name: j for j, name in enumerate(data_info.user_sparse_col.name)
        }
        for name, value in (user_feats or {}).items():
            if name not in name_to_j:
                continue
            j = name_to_j[name]
            col_pos = data_info.user_sparse_col.index[j]
            mapping = (data_info.sparse_idx_mapping or {}).get(name, {})
            if value in mapping:
                row[j] = data_info.sparse_offset[col_pos] + mapping[value]
            else:
                row[j] = data_info.sparse_oov[col_pos]
        return row

    def build_user_dense_row(self, uid, user_feats):
        import numpy as np

        data_info = self.data_info
        row = np.array(np.asarray(data_info.user_dense_unique)[uid])
        name_to_j = {
            name: j for j, name in enumerate(data_info.user_dense_col.name)
        }
        for name, value in (user_feats or {}).items():
            if name in name_to_j:
                row[name_to_j[name]] = float(value)
        return row


def rows_from_dataframe(data_info, data):
    """Batched feature assembly from a DataFrame (vectorized).

    Reference parity: libreco/prediction/preprocess.py:134
    ``features_from_batch`` — every sparse/dense column must be present in
    ``data``; sparse values map through ``sparse_idx_mapping`` + offset with
    unknowns falling to the column OOV. Returns
    ``(sparse_rows (B, F_sp) int32 | None, dense_rows (B, F_d) f32 | None)``
    in full field order.
    """
    sparse_rows, dense_rows = None, None
    mapping_all = data_info.col_name_mapping or {}
    sparse_cols = list(data_info.sparse_col.name)
    if sparse_cols:
        sparse_rows = np.zeros((len(data), len(sparse_cols)), np.int32)
        multi_map = mapping_all.get("multi_sparse", {})
        for field_idx, col in enumerate(sparse_cols):
            if col not in data.columns:
                raise ValueError(f"Column `{col}` doesn't exist in data")
            main_col = multi_map.get(col, col)
            idx_mapping = (data_info.sparse_idx_mapping or {}).get(main_col, {})
            mapped = data[col].map(idx_mapping)
            offset = data_info.sparse_offset[field_idx]
            oov = data_info.sparse_oov[field_idx]
            vals = mapped.to_numpy(dtype=np.float64, na_value=np.nan)
            sparse_rows[:, field_idx] = np.where(
                np.isnan(vals), oov, vals + offset
            ).astype(np.int32)
    dense_cols = list(data_info.dense_col.name)
    if dense_cols:
        for col in dense_cols:
            if col not in data.columns:
                raise ValueError(f"Column `{col}` doesn't exist in data")
        dense_rows = data[dense_cols].to_numpy(dtype=np.float32)
    return sparse_rows, dense_rows

"""DataInfo: the central registry of id maps, feature tables and consumption.

Reference parity: libreco/data/data_info.py:54 (DataInfo), :26
(MultiSparseInfo), :542 (OldInfo), :551 (store_old_info).

Everything here is host-side numpy; models push the unique feature tables to
device once at build time.
"""
import inspect
import json
import pickle
from collections import namedtuple
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Iterable, List

import numpy as np
import pandas as pd

from ..feature.update import (
    get_row_id_masks,
    update_new_dense_feats,
    update_new_sparse_feats,
)

Feature = namedtuple("Feature", ["name", "index"])

EmptyFeature = Feature(name=[], index=[])


@dataclass
class MultiSparseInfo:
    """Info of multi-sparse fields: offsets into the expanded sparse columns,
    field sizes, per-field OOV index, and padding values."""

    __slots__ = ("field_offset", "field_len", "feat_oov", "pad_val")

    field_offset: Iterable[int]
    field_len: Iterable[int]
    feat_oov: np.ndarray
    pad_val: Dict[str, Any]


class DataInfo:
    """Stores and updates id mappings, unique feature tables and consumption.

    See the reference's class for the full parameter docs; the layout contract
    is identical: ``user_sparse_unique``/``item_sparse_unique`` carry one row
    per inner id plus a trailing OOV row (appended in :meth:`add_oovs`).
    """

    def __init__(
        self,
        col_name_mapping=None,
        interaction_data=None,
        user_sparse_unique=None,
        user_dense_unique=None,
        item_sparse_unique=None,
        item_dense_unique=None,
        user_consumed=None,
        item_consumed=None,
        user_unique_vals=None,
        item_unique_vals=None,
        sparse_unique_vals=None,
        sparse_offset=None,
        sparse_oov=None,
        multi_sparse_unique_vals=None,
        multi_sparse_combine_info=None,
        seed=42,
    ):
        self.all_args = {
            k: v for k, v in locals().items() if k not in ("self", "__class__")
        }
        self.col_name_mapping = col_name_mapping
        self.interaction_data = interaction_data
        self.user_sparse_unique = user_sparse_unique
        self.user_dense_unique = user_dense_unique
        self.item_sparse_unique = item_sparse_unique
        self.item_dense_unique = item_dense_unique
        self.user_consumed = user_consumed
        self.item_consumed = item_consumed
        self.user_unique_vals = user_unique_vals
        self.item_unique_vals = item_unique_vals
        self.sparse_unique_vals = sparse_unique_vals
        self.sparse_offset = sparse_offset
        self.sparse_oov = sparse_oov
        self.multi_sparse_unique_vals = multi_sparse_unique_vals
        self.multi_sparse_combine_info = multi_sparse_combine_info
        self.seed = seed
        self.sparse_idx_mapping = DataInfo.map_sparse_vals(
            sparse_unique_vals, multi_sparse_unique_vals
        )
        self.np_rng = np.random.default_rng(seed)
        self._user2id = None
        self._item2id = None
        self._id2user = None
        self._id2item = None
        self._popular_items = None
        self.old_info = None  # set on merge_trainset for model rebuilding
        self.add_oovs()

    @staticmethod
    def map_sparse_vals(sparse_unique_vals, multi_sparse_unique_vals):
        if sparse_unique_vals is None and multi_sparse_unique_vals is None:
            return None
        mapping = {}
        for uniques in (sparse_unique_vals, multi_sparse_unique_vals):
            if uniques is not None:
                for col, vals in uniques.items():
                    mapping[col] = {v: i for i, v in enumerate(vals)}
        assert mapping
        return mapping

    # ------------------------------------------------------------------ stats
    @property
    def global_mean(self):
        return self.interaction_data.label.mean()

    @property
    def min_max_rating(self):
        return self.interaction_data.label.min(), self.interaction_data.label.max()

    @property
    def n_users(self):
        return len(self.user_unique_vals)

    @property
    def n_items(self):
        return len(self.item_unique_vals)

    @property
    def data_size(self):
        return len(self.interaction_data)

    def __repr__(self):
        density = 100 * self.data_size / (self.n_users * self.n_items)
        return (
            f"n_users: {self.n_users}, n_items: {self.n_items}, "
            f"data density: {density:.4f} %"
        )

    # ------------------------------------------------------------- column info
    def _feature(self, family):
        if not self.col_name_mapping or family not in self.col_name_mapping:
            return EmptyFeature
        return Feature(
            name=list(self.col_name_mapping[family].keys()),
            index=list(self.col_name_mapping[family].values()),
        )

    @property
    def sparse_col(self):
        return self._feature("sparse_col")

    @property
    def dense_col(self):
        return self._feature("dense_col")

    @property
    def user_sparse_col(self):
        return self._feature("user_sparse_col")

    @property
    def user_dense_col(self):
        return self._feature("user_dense_col")

    @property
    def item_sparse_col(self):
        return self._feature("item_sparse_col")

    @property
    def item_dense_col(self):
        return self._feature("item_dense_col")

    @property
    def user_col(self):
        return self.user_sparse_col.name + self.user_dense_col.name

    @property
    def item_col(self):
        return self.item_sparse_col.name + self.item_dense_col.name

    # ---------------------------------------------------------------- id maps
    @property
    def user2id(self):
        if self._user2id is None:
            self._user2id = {u: i for i, u in enumerate(self.user_unique_vals)}
        return self._user2id

    @property
    def item2id(self):
        if self._item2id is None:
            self._item2id = {v: i for i, v in enumerate(self.item_unique_vals)}
        return self._item2id

    @property
    def id2user(self):
        if self._id2user is None:
            self._id2user = {i: u for u, i in self.user2id.items()}
        return self._id2user

    @property
    def id2item(self):
        if self._id2item is None:
            self._id2item = {i: v for v, i in self.item2id.items()}
        return self._id2item

    # ------------------------------------------------------- online feature io
    # bumped on every assign so models can refresh their HBM-resident copies
    # of the unique feature tables (ops/features.FeatureTables.version)
    feature_version = 0

    def assign_user_features(self, user_data):
        """Update stored user feature rows from a DataFrame with a `user` col."""
        assert "user" in user_data.columns, "Data must contain `user` column."
        self.feature_version += 1
        user_data = user_data.drop_duplicates(subset=["user"], keep="last")
        row_idx, id_mask = get_row_id_masks(user_data["user"], self.user_unique_vals)
        self.user_sparse_unique = update_new_sparse_feats(
            user_data,
            row_idx,
            id_mask,
            self.user_sparse_unique,
            self.sparse_unique_vals,
            self.multi_sparse_unique_vals,
            self.user_sparse_col,
            self.col_name_mapping,
            self.sparse_offset,
        )
        self.user_dense_unique = update_new_dense_feats(
            user_data, row_idx, id_mask, self.user_dense_unique, self.user_dense_col
        )

    def assign_item_features(self, item_data):
        """Update stored item feature rows from a DataFrame with an `item` col."""
        assert "item" in item_data.columns, "Data must contain `item` column."
        self.feature_version += 1
        item_data = item_data.drop_duplicates(subset=["item"], keep="last")
        row_idx, id_mask = get_row_id_masks(item_data["item"], self.item_unique_vals)
        self.item_sparse_unique = update_new_sparse_feats(
            item_data,
            row_idx,
            id_mask,
            self.item_sparse_unique,
            self.sparse_unique_vals,
            self.multi_sparse_unique_vals,
            self.item_sparse_col,
            self.col_name_mapping,
            self.sparse_offset,
        )
        self.item_dense_unique = update_new_dense_feats(
            item_data, row_idx, id_mask, self.item_dense_unique, self.item_dense_col
        )

    def add_oovs(self):
        """Append one OOV row to every unique feature table.

        Sparse OOV rows hold each column's OOV index; dense OOV rows hold the
        column mean (used for cold users/items at inference).
        """

        def _concat_oov(uniques, cols=None):
            if uniques is None:
                return None
            oov = self.sparse_oov[cols] if cols else np.mean(uniques, axis=0)
            return np.vstack([uniques, oov])

        self.user_sparse_unique = _concat_oov(
            self.user_sparse_unique, self.user_sparse_col.index
        )
        self.item_sparse_unique = _concat_oov(
            self.item_sparse_unique, self.item_sparse_col.index
        )
        self.user_dense_unique = _concat_oov(self.user_dense_unique)
        self.item_dense_unique = _concat_oov(self.item_dense_unique)

    # ------------------------------------------------------------ cold start
    @property
    def popular_items(self):
        if self._popular_items is None:
            self._popular_items = self._get_popular_items(100)
        return self._popular_items

    def _get_popular_items(self, num):
        counts = (
            self.interaction_data.drop_duplicates(subset=["user", "item"])
            .groupby("item")["user"]
            .count()
        )
        selected = counts.sort_values(ascending=False).index.tolist()[:num]
        if len(selected) < num and self.old_info is not None:
            selected.extend(self.old_info.popular_items[: num - len(selected)])
        return selected

    # ------------------------------------------------------------- persistence
    def save(self, path, model_name):
        path = Path(path)
        if not path.is_dir():
            print(f"file folder {path} doesn't exist, creating a new one...")
            path.mkdir(parents=True)
        if self.col_name_mapping is not None:
            with open(path / f"{model_name}_data_info_name_mapping.json", "w") as f:
                json.dump(self.col_name_mapping, f, separators=(",", ":"), indent=4)
        # consumed dicts {inner_id: [inner ids]} persist as CSR npz rather
        # than pickle so load never executes code (advisor finding, round 1)
        for attr in ("user_consumed", "item_consumed"):
            consumed = getattr(self, attr)
            if consumed is not None:
                keys = np.fromiter(consumed.keys(), np.int64, len(consumed))
                indptr = np.zeros(len(consumed) + 1, np.int64)
                chunks = []
                for i, k in enumerate(keys):
                    vals = np.asarray(consumed[k], np.int64)
                    chunks.append(vals)
                    indptr[i + 1] = indptr[i] + len(vals)
                indices = (
                    np.concatenate(chunks) if chunks else np.empty(0, np.int64)
                )
                np.savez(
                    path / f"{model_name}_{attr}.npz",
                    keys=keys, indptr=indptr, indices=indices,
                )

        arrays = {}
        arg_names = inspect.signature(self.__init__).parameters.keys()
        for arg in arg_names:
            val = self.all_args.get(arg)
            if arg in ("col_name_mapping", "user_consumed", "item_consumed") or val is None:
                continue
            if arg == "interaction_data":
                arrays[arg] = val.to_numpy()
            elif arg == "sparse_unique_vals":
                for col, vals in val.items():
                    arrays["unique_" + str(col)] = np.asarray(vals)
            elif arg == "multi_sparse_unique_vals":
                for col, vals in val.items():
                    arrays["munique_" + str(col)] = np.asarray(vals)
            else:
                arrays[arg] = val
        np.savez_compressed(path / f"{model_name}_data_info", **arrays)

    @classmethod
    def load(cls, path, model_name):
        path = Path(path)
        if not path.exists():
            raise OSError(f"file folder {path} doesn't exist...")
        kwargs = {}
        name_mapping_path = path / f"{model_name}_data_info_name_mapping.json"
        if name_mapping_path.exists():
            with open(name_mapping_path) as f:
                kwargs["col_name_mapping"] = json.load(f)
        for attr in ("user_consumed", "item_consumed"):
            p = path / f"{model_name}_{attr}.npz"
            legacy = path / f"{model_name}_{attr}.pkl"
            if p.exists():
                with np.load(p) as csr:
                    keys, indptr, idx = csr["keys"], csr["indptr"], csr["indices"]
                kwargs[attr] = {
                    int(k): idx[indptr[i]:indptr[i + 1]].tolist()
                    for i, k in enumerate(keys)
                }
            elif legacy.exists():  # legacy rounds saved pickle
                with open(legacy, "rb") as f:
                    kwargs[attr] = pickle.load(f)

        info = dict(np.load(path / f"{model_name}_data_info.npz", allow_pickle=True))
        for arg, val in info.items():
            if arg == "interaction_data":
                kwargs[arg] = pd.DataFrame(val, columns=["user", "item", "label"])
            elif arg in ("multi_sparse_combine_info", "seed"):
                kwargs[arg] = val.item()
            elif arg.startswith("unique_"):
                kwargs.setdefault("sparse_unique_vals", {})[arg[7:]] = val
            elif arg.startswith("munique_"):
                kwargs.setdefault("multi_sparse_unique_vals", {})[arg[8:]] = val
            else:
                kwargs[arg] = val
        return cls(**kwargs)


@dataclass
class OldInfo:
    """Snapshot of the previous DataInfo, used by ``rebuild_model`` to graft
    old embedding rows into a re-built model with enlarged vocab."""

    n_users: int
    n_items: int
    sparse_len: List[int]
    sparse_oov: List[int]
    popular_items: List[Any]


def store_old_info(data_info):
    sparse_len, sparse_oov = [], []
    sparse_unique = data_info.sparse_unique_vals
    multi_sparse_unique = data_info.multi_sparse_unique_vals
    for i, col in enumerate(data_info.sparse_col.name):
        if sparse_unique is not None and col in sparse_unique:
            sparse_len.append(len(sparse_unique[col]))
            sparse_oov.append(data_info.sparse_oov[i])
        elif multi_sparse_unique is not None and col in multi_sparse_unique:
            sparse_len.append(len(multi_sparse_unique[col]))
            sparse_oov.append(data_info.sparse_oov[i])
        elif (
            multi_sparse_unique is not None
            and "multi_sparse" in data_info.col_name_mapping
            and col in data_info.col_name_mapping["multi_sparse"]
        ):
            # sub-columns after the first in a multi-sparse field are redundant
            sparse_len.append(-1)
    return OldInfo(
        data_info.n_users,
        data_info.n_items,
        sparse_len,
        sparse_oov,
        data_info.popular_items,
    )

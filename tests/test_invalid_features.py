"""Ported reference feature-validation battery (reference
tests/test_feature.py::test_invalid_features): inconsistent
user/item-vs-sparse/dense column sets and length mismatches raise the
reference's exact errors."""
import pandas as pd
import pytest

from librecommender_tpu.data import DatasetFeat

DATA = "/root/reference/tests/sample_data/sample_movielens_merged.csv"


def _fresh(**cols):
    DatasetFeat.train_called = False
    return DatasetFeat.build_trainset(pd.read_csv(DATA), **cols)


def test_inconsistent_columns_raise():
    with pytest.raises(
        ValueError, match=r"Got inconsistent columns: \['occupation' 'sex'\]"
    ):
        _fresh(user_col=["age", "sex"], item_col=["genre1"],
               sparse_col=["genre1", "occupation"], dense_col=["age"])


def test_length_mismatch_raises():
    with pytest.raises(ValueError, match="length of columns match"):
        _fresh(user_col=["age", "occupation"], item_col=["genre1"],
               sparse_col=["genre1", "occupation", "age"], dense_col=["age"])


def test_multi_sparse_length_mismatch_raises():
    with pytest.raises(ValueError, match="length of columns match"):
        _fresh(user_col=[], item_col=["genre1", "genre2", "genre3"],
               sparse_col=[], dense_col=["age"],
               multi_sparse_col=[["genre1", "genre2", "genre3"]])

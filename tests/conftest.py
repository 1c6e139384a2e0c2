"""Test fixtures: tiny synthetic datasets mirroring the reference's test
strategy (tests/conftest.py in the reference builds small MovieLens frames;
we use deterministic synthetic frames to keep the repo self-contained).

JAX is forced onto a virtual 8-device CPU mesh so multi-device sharding
tests run without TPU hardware.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force the virtual CPU mesh even when the ambient env points at TPU.
# The image's sitecustomize imports jax at interpreter start, so env vars
# are too late — use jax.config. Opt back into TPU tests with
# LIBREC_TPU_TESTS=1.
if not os.environ.get("LIBREC_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd
import pytest


def make_interactions(n_rows=2400, n_users=60, n_items=100, seed=0, explicit=True):
    rng = np.random.default_rng(seed)
    users = rng.integers(0, n_users, n_rows) + 1000  # raw ids offset from inner
    items = rng.integers(0, n_items, n_rows) + 5000
    if explicit:
        labels = rng.integers(1, 6, n_rows).astype(np.float64)
    else:
        labels = np.ones(n_rows)
    frame = pd.DataFrame({"user": users, "item": items, "label": labels})
    return frame.drop_duplicates(subset=["user", "item"]).reset_index(drop=True)


def make_feat_interactions(n_rows=2400, n_users=60, n_items=100, seed=0):
    frame = make_interactions(n_rows, n_users, n_items, seed)
    rng = np.random.default_rng(seed + 1)
    # user features: sex (sparse), age (dense); item features: genre (sparse)
    user_sex = {u: rng.choice(["m", "f"]) for u in frame.user.unique()}
    user_age = {u: int(rng.integers(10, 60)) for u in frame.user.unique()}
    item_genre = {i: rng.choice(["a", "b", "c", "d"]) for i in frame.item.unique()}
    frame["sex"] = frame.user.map(user_sex)
    # normalized like the reference's process_data expects users to do
    frame["age"] = (frame.user.map(user_age).astype(np.float64) - 35.0) / 25.0
    frame["genre"] = frame.item.map(item_genre)
    return frame


@pytest.fixture(scope="session")
def pure_frames():
    data = make_interactions()
    from librecommender_tpu.data import random_split

    return random_split(data, multi_ratios=[0.8, 0.1, 0.1], seed=42)


@pytest.fixture()
def pure_builds(pure_frames):
    from librecommender_tpu.data import DatasetPure

    train, evals, test = pure_frames
    train_data, data_info = DatasetPure.build_trainset(train)
    eval_data = DatasetPure.build_evalset(evals)
    test_data = DatasetPure.build_testset(test)
    return train_data, eval_data, test_data, data_info


@pytest.fixture(scope="session")
def feat_frames():
    data = make_feat_interactions()
    from librecommender_tpu.data import random_split

    return random_split(data, multi_ratios=[0.8, 0.1, 0.1], seed=42)


@pytest.fixture()
def feat_builds(feat_frames):
    from librecommender_tpu.data import DatasetFeat

    train, evals, test = feat_frames
    train_data, data_info = DatasetFeat.build_trainset(
        train,
        user_col=["sex", "age"],
        item_col=["genre"],
        sparse_col=["sex", "genre"],
        dense_col=["age"],
    )
    eval_data = DatasetFeat.build_evalset(evals)
    test_data = DatasetFeat.build_testset(test)
    return train_data, eval_data, test_data, data_info

"""Reference-style parametrized grids: (task x loss_type x sampler x
neg_sampling) including invalid-combo raises, sampler variants, and
seed determinism of the jitted epoch.

Mirrors /root/reference/tests/models/test_din.py:21-40 and the per-model
grid pattern used across the reference's 30 model test files (one
representative model per family here — the families share one trainer, so
the combinatorics are family-invariant).
"""
import numpy as np
import pytest

from librecommender_tpu.models import BPR, DIN, SVD, DeepFM

ALL_COMBOS = [
    ("rating", "focal", "random", None),
    ("rating", "focal", None, True),
    ("rating", "focal", "random", True),
    ("ranking", "cross_entropy", "random", False),
    ("ranking", "focal", "unconsumed", False),
    ("ranking", "cross_entropy", "random", True),
    ("ranking", "cross_entropy", "unconsumed", True),
    ("ranking", "focal", "popular", True),
    ("ranking", "unknown", "popular", True),
    ("ranking", "cross_entropy", "typo-sampler", True),
]


def _binarize(train_data):
    labels = np.asarray(train_data.labels, np.float64)
    median = np.median(labels)
    train_data.labels[:] = (labels > median).astype(labels.dtype)


def _run_combo(cls, builds, task, loss_type, sampler, neg_sampling, extra):
    train_data, eval_data, *_ , data_info = builds
    if task == "ranking" and neg_sampling is False:
        _binarize(train_data)

    def build():
        return cls(task, data_info, loss_type=loss_type, sampler=sampler,
                   embed_size=8, n_epochs=1, batch_size=256, **extra)

    if loss_type == "unknown":
        with pytest.raises((AssertionError, ValueError)):
            build().fit(train_data, neg_sampling)
        return
    if neg_sampling is None:
        with pytest.raises(AssertionError):
            build().fit(train_data, neg_sampling)
        return
    if task == "rating" and neg_sampling:
        with pytest.raises(ValueError):
            build().fit(train_data, neg_sampling)
        return
    if loss_type == "focal" and task == "ranking" and (
        neg_sampling is False or sampler is None
    ):
        with pytest.raises(ValueError):
            build().fit(train_data, neg_sampling)
        return
    if neg_sampling and sampler not in ("random", "popular", "unconsumed"):
        with pytest.raises(ValueError):
            build().fit(train_data, neg_sampling)
        return

    model = build()
    model.fit(train_data, neg_sampling, verbose=0)
    u = list(data_info.user2id)[0]
    i = list(data_info.item2id)[0]
    pred = np.asarray(model.predict(user=u, item=i))
    assert np.all(np.isfinite(pred))
    if task == "rating":
        assert model.lower_bound <= float(pred) <= model.upper_bound
    else:
        assert 0.0 <= float(pred) <= 1.0
    recs = model.recommend_user(user=u, n_rec=5)
    assert len(recs[u]) == 5


@pytest.mark.parametrize("task, loss_type, sampler, neg_sampling", ALL_COMBOS)
def test_svd_grid(pure_builds, task, loss_type, sampler, neg_sampling):
    _run_combo(SVD, pure_builds, task, loss_type, sampler, neg_sampling, {})


@pytest.mark.parametrize("task, loss_type, sampler, neg_sampling", ALL_COMBOS)
def test_deepfm_grid(feat_builds, task, loss_type, sampler, neg_sampling):
    _run_combo(
        DeepFM, feat_builds, task, loss_type, sampler, neg_sampling,
        {"hidden_units": (16,)},
    )


@pytest.mark.parametrize("task, loss_type, sampler, neg_sampling", ALL_COMBOS)
def test_din_grid(feat_builds, task, loss_type, sampler, neg_sampling):
    _run_combo(
        DIN, feat_builds, task, loss_type, sampler, neg_sampling,
        {"hidden_units": (16,), "recent_num": 5},
    )


@pytest.mark.parametrize(
    "lr_decay, reg, num_neg, use_bn, dropout_rate, hidden_units",
    [
        (False, None, 1, False, None, (32, 16)),
        (True, 0.001, 3, True, 0.5, (16,)),
    ],
)
def test_din_hparam_grid(feat_builds, lr_decay, reg, num_neg, use_bn,
                         dropout_rate, hidden_units):
    train_data, eval_data, *_ , data_info = feat_builds
    model = DIN(
        "ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
        lr_decay=lr_decay, reg=reg, num_neg=num_neg, use_bn=use_bn,
        dropout_rate=dropout_rate, hidden_units=hidden_units, recent_num=5,
    )
    model.fit(train_data, neg_sampling=True, verbose=1, eval_data=eval_data,
              metrics=["roc_auc", "precision"], eval_user_num=20)
    u = list(data_info.user2id)[0]
    assert len(model.recommend_user(user=u, n_rec=3)[u]) == 3


def test_pairwise_requires_sampling(pure_builds):
    """bpr/max_margin without negative sampling must raise (reference
    torch_trainer contract)."""
    from librecommender_tpu.models import LightGCN

    train_data, *_, data_info = pure_builds
    for cls, loss in ((BPR, "bpr"), (LightGCN, "bpr"),
                      (LightGCN, "max_margin")):
        m = cls("ranking", data_info, loss_type=loss, embed_size=8,
                n_epochs=1, batch_size=256)
        with pytest.raises(ValueError):
            m.fit(train_data, neg_sampling=False)


def test_listwise_rejects_neg_sampling(feat_builds):
    """In-batch softmax samples negatives internally; neg_sampling=True is
    an invalid combo (reference check_neg_sampling on YouTubeRetrieval /
    TwoTower-softmax)."""
    from librecommender_tpu.models import TwoTower, YouTubeRetrieval

    train_data, *_, data_info = feat_builds
    for cls, kw in ((TwoTower, {"loss_type": "softmax"}),
                    (YouTubeRetrieval, {"loss_type": "sampled_softmax"})):
        m = cls("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=256, **kw)
        with pytest.raises(ValueError):
            m.fit(train_data, neg_sampling=True)


@pytest.mark.parametrize("sampler", ["random", "popular", "unconsumed"])
@pytest.mark.parametrize("cls", [BPR, DeepFM])
def test_sampler_grid(pure_builds, feat_builds, cls, sampler):
    builds = pure_builds if cls is BPR else feat_builds
    train_data, *_, data_info = builds
    extra = {} if cls is BPR else {"hidden_units": (16,)}
    model = cls("ranking", data_info, sampler=sampler, embed_size=8,
                n_epochs=1, batch_size=256, num_neg=2, **extra)
    model.fit(train_data, neg_sampling=True, verbose=0)
    u = list(data_info.user2id)[0]
    assert len(model.recommend_user(user=u, n_rec=5)[u]) == 5


@pytest.mark.parametrize("cls,extra", [
    (BPR, {}),
    (DeepFM, {"hidden_units": (16,)}),
])
def test_seed_determinism(pure_builds, feat_builds, cls, extra):
    """Two fits with the same seed produce bit-identical params; a
    different seed diverges (threefry determinism of the jitted epoch —
    reference analog: tests/test_multiprocessing_seeds.py)."""
    builds = pure_builds if cls is BPR else feat_builds
    train_data, *_, data_info = builds

    def fit(seed):
        m = cls("ranking", data_info, embed_size=8, n_epochs=2,
                batch_size=256, seed=seed, **extra)
        m.fit(train_data, neg_sampling=True, verbose=0)
        return m

    m1, m2, m3 = fit(11), fit(11), fit(12)
    leaves1 = [np.asarray(x) for x in
               __import__("jax").tree_util.tree_leaves(m1.params)]
    leaves2 = [np.asarray(x) for x in
               __import__("jax").tree_util.tree_leaves(m2.params)]
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(a, b)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            __import__("jax").tree_util.tree_leaves(m1.params),
            __import__("jax").tree_util.tree_leaves(m3.params),
        )
    )

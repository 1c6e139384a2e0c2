"""Reference batch-size semantics: ``batch_size`` counts TOTAL examples
per step, negatives included (libreco/batch/batch_data.py:93
``adjust_batch_size``, applied in libreco/training/trainer.py:28).
"""
import pandas as pd
import pytest

from librecommender_tpu.batch import adjust_batch_size
from librecommender_tpu.data import DatasetPure
from librecommender_tpu.models import BPR, SVD, LightGCN, YouTubeRetrieval


class _Stub:
    def __init__(self, paradigm="pointwise", loss_type="cross_entropy",
                 sampler="random", num_neg=1):
        self.paradigm = paradigm
        self.loss_type = loss_type
        self.sampler = sampler
        self.num_neg = num_neg


@pytest.mark.parametrize(
    "kwargs, bs, expected",
    [
        # pointwise cross_entropy: 1 positive + num_neg negatives per row
        (dict(loss_type="cross_entropy", num_neg=1), 2048, 1024),
        (dict(loss_type="focal", num_neg=4), 2048, 409),
        # pairwise: num_neg pairs per positive
        (dict(paradigm="pairwise", loss_type="bpr", num_neg=1), 2048, 2048),
        (dict(paradigm="pairwise", loss_type="bpr", num_neg=4), 2048, 512),
        # listwise (in-batch softmax): positives only, no division
        (dict(paradigm="listwise", loss_type="softmax"), 2048, 2048),
        # no sampler (e.g. rating data with real labels): unchanged
        (dict(sampler=None), 2048, 2048),
    ],
)
def test_adjust_batch_size(kwargs, bs, expected):
    assert adjust_batch_size(_Stub(**kwargs), bs) == expected


def test_trainer_uses_adjusted_batch(pure_small):
    train_data, data_info = pure_small
    model = SVD("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=64, num_neg=1)
    model.fit(train_data, neg_sampling=True, verbose=0)
    # pointwise CE: 64 total examples/step -> 32 positives per step
    assert model.trainer.batch_size == 32

    model = BPR("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=64, num_neg=1)
    model.fit(train_data, neg_sampling=True, verbose=0)
    assert model.trainer.batch_size == 64  # pairwise / num_neg=1


def test_torch_family_epsilon_defaults(pure_small):
    """Graph models default to torch Adam's eps=1e-8
    (reference libreco/algorithms/lightgcn.py:82); TF family keeps 1e-5."""
    _, data_info = pure_small
    assert LightGCN("ranking", data_info).epsilon == 1e-8
    assert SVD("ranking", data_info).epsilon == 1e-5


@pytest.fixture
def pure_small():
    rows = []
    for u in range(30):
        for i in range(u % 7, 40, 7):
            rows.append((u, i, 1.0, u * 40 + i))
    frame = pd.DataFrame(rows, columns=["user", "item", "label", "time"])
    return DatasetPure.build_trainset(frame)


def test_ytr_listwise_unadjusted(pure_small):
    train_data, data_info = pure_small
    model = YouTubeRetrieval(
        "ranking", data_info, embed_size=8, n_epochs=1, batch_size=64,
        loss_type="sampled_softmax",
    )
    assert adjust_batch_size(model, 64) == 64


def test_early_stopping(pure_builds):
    """fit(early_stopping=N) stops when the monitored metric stalls and
    restores the best epoch's parameters (beyond-reference; motivated by
    the tiny-data overfit study in PARITY.md)."""
    import numpy as np

    from librecommender_tpu.evaluation import evaluate
    from librecommender_tpu.models import BPR

    train_data, eval_data, *_ , data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=16, n_epochs=40, lr=0.05,
                batch_size=512, seed=0)
    model.fit(train_data, neg_sampling=True, verbose=0, eval_data=eval_data,
              metrics=["roc_auc"], early_stopping=3)
    ran = len(model.trainer.epoch_times)
    assert ran < 40, "should stop before the full epoch budget at lr=0.05"
    # restored params score the best-seen metric (re-evaluating the final
    # model must not be worse than what any later epoch reached)
    auc_final = evaluate(model, eval_data, neg_sampling=True,
                         metrics=["roc_auc"])["roc_auc"]
    m2 = BPR("ranking", data_info, embed_size=16, n_epochs=ran, lr=0.05,
             batch_size=512, seed=0)
    m2.fit(train_data, neg_sampling=True, verbose=0)
    auc_last = evaluate(m2, eval_data, neg_sampling=True,
                        metrics=["roc_auc"])["roc_auc"]
    assert auc_final >= auc_last - 1e-9


def test_early_stopping_lower_is_better(pure_builds):
    """rmse/mae/log_loss are lower-is-better: early stopping must keep the
    LOWEST-metric epoch, not the highest (ADVICE r3 medium finding)."""
    from librecommender_tpu.evaluation import evaluate
    from librecommender_tpu.models import SVD

    train_data, eval_data, *_, data_info = pure_builds
    model = SVD("rating", data_info, embed_size=16, n_epochs=30, lr=0.05,
                batch_size=512, seed=0)
    model.fit(train_data, neg_sampling=False, verbose=0, eval_data=eval_data,
              metrics=["rmse"], early_stopping=3)
    ran = len(model.trainer.epoch_times)
    assert ran < 30, "high-lr rating fit should overfit and stop early"
    rmse_final = evaluate(model, eval_data, neg_sampling=False,
                          metrics=["rmse"])["rmse"]
    # the restored params must beat (or match) the last epoch's params —
    # under the old always-higher-is-better rule they'd be the WORST epoch
    m2 = SVD("rating", data_info, embed_size=16, n_epochs=ran, lr=0.05,
             batch_size=512, seed=0)
    m2.fit(train_data, neg_sampling=False, verbose=0)
    rmse_last = evaluate(m2, eval_data, neg_sampling=False,
                         metrics=["rmse"])["rmse"]
    assert rmse_final <= rmse_last + 1e-9


def test_early_stopping_requires_eval_data(pure_builds):
    from librecommender_tpu.models import BPR

    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=8, n_epochs=2)
    with pytest.raises(ValueError, match="eval_data"):
        model.fit(train_data, neg_sampling=True, verbose=0, early_stopping=2)

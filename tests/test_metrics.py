"""Metric unit tests against hand-computed values (reference:
tests/test_rank_reco.py style)."""
import numpy as np
import pytest

from librecommender_tpu.evaluation import metrics as m


def test_listwise_metrics_hand_computed():
    y_true = [1, 2, 3, 4]
    y_reco = [2, 9, 1, 8, 7]
    # precision@5: 2 hits / 5
    assert m.precision_at_k(y_true, y_reco, 5) == pytest.approx(0.4)
    # recall@5: 2 hits / 4 relevant
    assert m.recall_at_k(y_true, y_reco, 5) == pytest.approx(0.5)
    # AP@5: hits at ranks 1 and 3 -> (1/1 + 2/3) / min(4,5)
    assert m.average_precision_at_k(y_true, y_reco, 5) == pytest.approx(
        (1.0 + 2.0 / 3.0) / 4.0
    )
    # NDCG@5 (reference contract, libreco/evaluation/metrics.py:97-108):
    # DCG = 1/log2(2) + 1/log2(4); IDCG over the 2 HITS found
    dcg = 1.0 / np.log2(2) + 1.0 / np.log2(4)
    idcg = sum(1.0 / np.log2(r + 2) for r in range(2))
    assert m.ndcg_at_k(y_true, y_reco, 5) == pytest.approx(dcg / idcg)


def test_listwise_edge_cases():
    assert m.recall_at_k([], [1, 2], 2) == 0.0
    assert m.ndcg_at_k([5], [1, 2], 2) == 0.0
    assert m.average_precision_at_k([5], [1, 2], 2) == 0.0


def test_coverage():
    recos = {0: [1, 2], 1: [2, 3]}
    assert m.coverage(np.arange(10), recos, [0, 1]) == pytest.approx(0.3)


def test_roc_gauc_weighted_by_user():
    users = np.array([0, 0, 0, 1, 1, 1, 1])
    labels = np.array([1, 0, 0, 1, 1, 0, 0])
    # user 0: perfect ordering; user 1: perfect ordering
    probs = np.array([0.9, 0.2, 0.1, 0.8, 0.7, 0.3, 0.2])
    assert m.roc_gauc(labels, probs, users) == pytest.approx(1.0)
    # single-class users are skipped
    users2 = np.array([0, 0, 1])
    labels2 = np.array([1, 0, 1])
    probs2 = np.array([0.2, 0.9, 0.5])
    assert m.roc_gauc(labels2, probs2, users2) == pytest.approx(0.0)


def test_rank_recommendations_random_rec_valid():
    from librecommender_tpu.recommendation.ranking import rank_recommendations

    rng = np.random.default_rng(0)
    scores = rng.normal(size=(2, 20))
    consumed = {0: [0, 1, 2], 1: [5]}
    ids = rank_recommendations(
        "ranking", [0, 1], scores, 5, 20, consumed,
        filter_consumed=True, random_rec=True, np_rng=rng,
    )
    assert ids.shape == (2, 5)
    assert not (set(ids[0]) & {0, 1, 2})
    assert 5 not in set(ids[1])
    assert len(set(ids[0])) == 5  # no duplicates


def test_evaluate_sample_user_num(pure_builds):
    """Listwise eval with user sampling evaluates the requested subset."""
    from librecommender_tpu.evaluation import evaluate
    from librecommender_tpu.models import SVD

    train_data, eval_data, *_ , data_info = pure_builds
    model = SVD("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    full = evaluate(model, eval_data, neg_sampling=True,
                    metrics=["recall"], k=5, seed=1)
    sampled = evaluate(model, eval_data, neg_sampling=True,
                       metrics=["recall"], k=5, sample_user_num=10, seed=1)
    assert np.isfinite(full["recall"]) and np.isfinite(sampled["recall"])


def test_models_star_import():
    import librecommender_tpu.models as zoo

    assert len(zoo.__all__) == 31  # 27 implementations + 4 reference aliases
    for name in zoo.__all__:
        assert hasattr(zoo, name), name

"""Evaluation metrics: rating / pointwise-ranking / listwise-ranking.

Reference parity: libreco/evaluation/metrics.py:24-116. Rating and pointwise
metrics delegate to sklearn (as the reference does); listwise metrics are
vectorized numpy over per-user recommendation lists.
"""
import numpy as np
from sklearn.metrics import (
    balanced_accuracy_score,
    log_loss,
    mean_absolute_error,
    mean_squared_error,
    precision_recall_curve,
    r2_score,
    roc_auc_score,
    auc,
)

RATING_METRICS = {"loss", "rmse", "mae", "r2"}
POINTWISE_METRICS = {"loss", "log_loss", "balanced_accuracy", "roc_auc", "pr_auc", "roc_gauc"}
LISTWISE_METRICS = {"precision", "recall", "map", "ndcg", "coverage"}
RANKING_METRICS = POINTWISE_METRICS | LISTWISE_METRICS


def rmse(labels, preds):
    return float(np.sqrt(mean_squared_error(labels, preds)))


def mae(labels, preds):
    return float(mean_absolute_error(labels, preds))


def r2(labels, preds):
    return float(r2_score(labels, preds))


def binary_log_loss(labels, probs):
    return float(log_loss(labels, probs, labels=[0.0, 1.0]))


def balanced_accuracy(labels, probs):
    return float(balanced_accuracy_score(labels, np.round(probs)))


def roc_auc(labels, probs):
    return float(roc_auc_score(labels, probs))


def pr_auc(labels, probs):
    precision, recall, _ = precision_recall_curve(labels, probs)
    return float(auc(recall, precision))


def roc_gauc(labels, probs, users):
    """Per-user ROC AUC averaged with per-user sample weights
    (reference `roc_gauc_score`, libreco/evaluation/metrics.py:44)."""
    labels = np.asarray(labels)
    probs = np.asarray(probs)
    users = np.asarray(users)
    order = np.argsort(users, kind="stable")
    labels, probs, users = labels[order], probs[order], users[order]
    bounds = np.nonzero(np.diff(users))[0] + 1
    total_auc, total_weight = 0.0, 0
    for seg_l, seg_p in zip(np.split(labels, bounds), np.split(probs, bounds)):
        if seg_l.min() == seg_l.max():
            continue  # single-class user contributes nothing
        total_auc += len(seg_l) * roc_auc_score(seg_l, seg_p)
        total_weight += len(seg_l)
    return float(total_auc / total_weight) if total_weight else 0.0


# ----------------------------------------------------------------- listwise
def listwise_scores(fn, y_true_lists, y_reco_lists, users, k):
    scores = [
        fn(y_true_lists[u], y_reco_lists[u], k)
        for u in users
        if u in y_reco_lists and len(y_reco_lists[u]) > 0
    ]
    return float(np.mean(scores)) if scores else 0.0


def precision_at_k(y_true, y_reco, k):
    return len(set(y_true) & set(y_reco[:k])) / k


def recall_at_k(y_true, y_reco, k):
    if len(y_true) == 0:
        return 0.0
    return len(set(y_true) & set(y_reco[:k])) / len(y_true)


def average_precision_at_k(y_true, y_reco, k):
    true_set = set(y_true)
    hits, precision_sum = 0, 0.0
    for i, item in enumerate(y_reco[:k], start=1):
        if item in true_set:
            hits += 1
            precision_sum += hits / i
    denom = min(len(true_set), k)
    return precision_sum / denom if denom else 0.0


def ndcg_at_k(y_true, y_reco, k):
    """Reference-contract NDCG (libreco/evaluation/metrics.py:97-108):
    IDCG normalizes by the number of HITS in the reco list, not by
    min(|truth|, k) — i.e. it measures how early the found items rank."""
    true_set = set(y_true)
    rels = np.asarray([1.0 if item in true_set else 0.0 for item in y_reco[:k]])
    if not np.any(rels):
        return 0.0
    discounts = 1.0 / np.log2(np.arange(2, len(rels) + 2))
    dcg = float(np.sum(rels * discounts))
    n_hits = int(np.sum(rels))
    idcg = float(np.sum(discounts[:n_hits]))
    return dcg / idcg if idcg else 0.0


def coverage(all_item_ids, y_reco_lists, users):
    recommended = set()
    for u in users:
        recommended.update(y_reco_lists.get(u, ()))
    return len(recommended) / len(all_item_ids)

"""Listwise-loss numerics: the logaddexp-restructured losses must equal
their naive matrix formulations (the restructure removes (B, B)/(B, S+1)
materializations — see docs/tpu_performance.md; these tests pin the math).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from librecommender_tpu.ops.losses import (
    sampled_softmax_loss,
    softmax_cross_entropy_loss,
)


def _naive_inbatch(u, v, weight, item_ids, cp, T, hits):
    n = u.shape[0]
    logits = (u @ v.T) / T
    if cp is not None:
        logits = logits - jnp.log(jnp.clip(cp, 1e-8, 1.0))[None, :]
    if weight is not None:
        col_pad = (weight <= 0.0)[None, :] & ~jnp.eye(n, dtype=bool)
        logits = jnp.where(col_pad, -1e9, logits)
    if hits and item_ids is not None:
        hit = item_ids[None, :] == item_ids[:, None]
        logits = jnp.where(hit & ~jnp.eye(n, dtype=bool), -1e9, logits)
    per = -jnp.diagonal(jax.nn.log_softmax(logits, axis=1))
    m = weight if weight is not None else jnp.ones(n)
    return jnp.sum(per * (m > 0)) / jnp.maximum(jnp.sum(m > 0), 1)


@pytest.mark.parametrize("use_weight", [False, True])
@pytest.mark.parametrize("hits", [False, True])
@pytest.mark.parametrize("use_corr", [False, True])
def test_inbatch_softmax_matches_naive(use_weight, hits, use_corr):
    rng = np.random.default_rng(0)
    B, D = 48, 16
    u = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 30, B), jnp.int32)  # with duplicates
    cp = jnp.asarray(rng.random(B).astype(np.float32)) if use_corr else None
    w = (
        jnp.asarray((rng.random(B) > 0.25).astype(np.float32))
        if use_weight else None
    )
    got = float(softmax_cross_entropy_loss(
        u, v, weight=w, item_ids=ids, correction_probs=cp,
        temperature=0.5, remove_accidental_hits=hits,
    ))
    want = float(_naive_inbatch(u, v, w, ids, cp, 0.5, hits))
    assert abs(got - want) < 1e-3 * max(1.0, abs(want))


@pytest.mark.parametrize("use_weight", [False, True])
@pytest.mark.parametrize("hits", [False, True])
def test_sampled_softmax_matches_naive(use_weight, hits):
    rng = np.random.default_rng(1)
    B, S, N, D = 40, 24, 80, 16
    u = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(N), jnp.float32)
    pos = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    neg = jnp.asarray(rng.integers(0, N, S), jnp.int32)
    w = (
        jnp.asarray((rng.random(B) > 0.25).astype(np.float32))
        if use_weight else None
    )
    got = float(sampled_softmax_loss(
        u, W, b, pos, neg, weight=w, remove_accidental_hits=hits,
    ))
    pl = jnp.sum(u * W[pos], 1) + b[pos]
    nl = u @ W[neg].T + b[neg][None, :]
    if hits:
        nl = jnp.where(neg[None, :] == pos[:, None], -1e9, nl)
    logits = jnp.concatenate([pl[:, None], nl], axis=1)
    per = -jax.nn.log_softmax(logits, axis=1)[:, 0]
    m = w if w is not None else jnp.ones(B)
    want = float(jnp.sum(per * (m > 0)) / jnp.maximum(jnp.sum(m > 0), 1))
    assert abs(got - want) < 1e-3 * max(1.0, abs(want))


# ---------------------------------------------------------- pointwise/pairwise
def test_bce_matches_naive_and_torch_semantics():
    from librecommender_tpu.ops.losses import bce_loss

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=64) * 4)
    labels = jnp.asarray((rng.random(64) > 0.5).astype(np.float64))
    p = jax.nn.sigmoid(logits)
    naive = -jnp.mean(labels * jnp.log(p) + (1 - labels) * jnp.log1p(-p))
    np.testing.assert_allclose(bce_loss(logits, labels), naive, rtol=1e-5)
    # stability: huge logits must not produce nan/inf
    big = jnp.asarray([1e4, -1e4])
    lb = jnp.asarray([0.0, 1.0])
    assert np.isfinite(float(bce_loss(big, lb)))


def test_focal_reduces_to_weighted_ce_at_gamma0():
    from librecommender_tpu.ops.losses import bce_loss, focal_loss

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=32))
    labels = jnp.asarray((rng.random(32) > 0.5).astype(np.float64))
    # gamma=0, alpha=0.5 -> 0.5 * plain BCE
    got = focal_loss(logits, labels, alpha=0.5, gamma=0.0)
    np.testing.assert_allclose(got, 0.5 * bce_loss(logits, labels), rtol=1e-5)
    # easy examples contribute less than hard ones at gamma=2
    easy = focal_loss(jnp.asarray([8.0]), jnp.asarray([1.0]))
    hard = focal_loss(jnp.asarray([-8.0]), jnp.asarray([1.0]))
    assert float(easy) < float(hard)


def test_pairwise_losses_hand_computed():
    from librecommender_tpu.ops.losses import bpr_loss, max_margin_loss

    pos = jnp.asarray([2.0, 0.5])
    neg = jnp.asarray([1.0, 1.5])
    expect_bpr = -np.mean(np.log(1 / (1 + np.exp(-np.array([1.0, -1.0])))))
    np.testing.assert_allclose(bpr_loss(pos, neg), expect_bpr, rtol=1e-6)
    # margins: first pair satisfied by 1.0 (hinge 0), second violated by 2.0
    np.testing.assert_allclose(
        max_margin_loss(pos, neg, margin=1.0), np.mean([0.0, 2.0]), rtol=1e-6
    )
    # weight mask drops the masked element entirely
    w = jnp.asarray([1.0, 0.0])
    np.testing.assert_allclose(
        max_margin_loss(pos, neg, weight=w, margin=1.0), 0.0, atol=1e-7
    )


def test_nce_matches_naive_binary_logistic():
    from librecommender_tpu.ops.losses import nce_loss

    rng = np.random.default_rng(2)
    B, S, D, V = 16, 8, 12, 40
    u = jnp.asarray(rng.normal(size=(B, D)))
    w = jnp.asarray(rng.normal(size=(V, D)))
    b = jnp.asarray(rng.normal(size=V))
    pos = jnp.asarray(rng.integers(0, V, B))
    neg = jnp.asarray(rng.integers(0, V, S))
    got = nce_loss(u, w, b, pos, neg)
    per = []
    for i in range(B):
        pl_ = float(u[i] @ w[pos[i]] + b[pos[i]])
        total = -np.log(1 / (1 + np.exp(-pl_)))
        for s in range(S):
            nl = float(u[i] @ w[neg[s]] + b[neg[s]])
            total += -np.log(1 - 1 / (1 + np.exp(-nl)))
        per.append(total)
    np.testing.assert_allclose(got, np.mean(per), rtol=1e-5)


def test_ssl_loss_prefers_aligned_views():
    from librecommender_tpu.ops.losses import ssl_loss

    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=(32, 8)))
    aligned = float(ssl_loss(v, v))
    shuffled = float(ssl_loss(v, v[::-1]))
    assert aligned < shuffled

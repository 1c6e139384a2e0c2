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

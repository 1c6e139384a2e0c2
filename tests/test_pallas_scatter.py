"""Pallas VMEM-accumulator scatter (ops/pallas_scatter.py): interpreter-
mode exactness vs numpy, the custom-vjp gather backward, and the opt-in
wiring through seq models (default stays XLA's scatter — see
docs/tpu_performance.md "Mosaic A/B")."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import librecommender_tpu.ops.pallas_scatter as ps


def test_scatter_add_rows_matches_numpy():
    rng = np.random.default_rng(0)
    n, r, d = 5000, 371, 64
    ids = rng.integers(0, r, n).astype(np.int32)
    rows = rng.normal(size=(n, d)).astype(np.float32)
    want = np.zeros((r, d), np.float32)
    np.add.at(want, ids, rows)
    got = np.asarray(ps.scatter_add_rows(
        jnp.asarray(ids), jnp.asarray(rows), r, chunk=512, interpret=True
    ))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_scatter_handles_non_chunk_multiple_and_empty_rows():
    rng = np.random.default_rng(1)
    n, r, d = 777, 40, 8  # exercises the pad path + never-touched rows
    ids = rng.integers(0, 7, n).astype(np.int32)  # rows 7..39 untouched
    rows = rng.normal(size=(n, d)).astype(np.float32)
    want = np.zeros((r, d), np.float32)
    np.add.at(want, ids, rows)
    got = np.asarray(ps.scatter_add_rows(
        jnp.asarray(ids), jnp.asarray(rows), r, chunk=256, interpret=True
    ))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert np.all(got[7:] == 0)


def test_gather_rows_grad_matches_autodiff(monkeypatch):
    monkeypatch.setattr(ps, "_INTERPRET", True)
    rng = np.random.default_rng(2)
    r, d = 96, 16
    table = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, r, (37, 5)).astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(37, 5, d)).astype(np.float32))

    def loss_custom(t):
        return jnp.sum(ps.gather_rows(t, ids) * cot)

    def loss_plain(t):
        return jnp.sum(t[ids] * cot)

    g_c = np.asarray(jax.grad(loss_custom)(table))
    g_p = np.asarray(jax.grad(loss_plain)(table))
    np.testing.assert_allclose(g_c, g_p, rtol=1e-5, atol=1e-6)


def test_seq_model_opt_in_flag_cpu_equivalence(feat_builds, monkeypatch):
    """SIM fit with pallas_grad_scatter=True (interpreted) must match the
    default XLA-scatter fit exactly on CPU."""
    monkeypatch.setattr(ps, "_INTERPRET", True)
    from librecommender_tpu.models import SIM

    train_data, *_, data_info = feat_builds

    def fit(flag):
        m = SIM("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=128, recent_num=5, long_max_len=10,
                search_topk=3, seed=3)
        m.pallas_grad_scatter = flag
        m.fit(train_data, neg_sampling=True, verbose=0)
        return np.asarray(jax.device_get(m.params["item_embed"]))

    np.testing.assert_allclose(fit(True), fit(False), rtol=1e-5, atol=1e-6)

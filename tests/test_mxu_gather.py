"""MXU one-hot gather/segment-sum kernels + dense masked LazyAdam.

On CPU the Pallas kernels run under the interpreter (same code path the
TPU compiles), so correctness here covers the kernel logic exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from librecommender_tpu.ops.mxu_gather import (
    mxu_gather,
    segment_sum_mxu,
    table_lookup,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_mxu_gather_exact(rng):
    R, D, B = 384, 65, 256
    table = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 300, B).astype(np.int32))
    out = np.asarray(mxu_gather(table, ids))
    np.testing.assert_array_equal(out, np.asarray(table)[np.asarray(ids)])


def test_segment_sum_matches_scatter_add(rng):
    R, D, B = 384, 65, 512
    ids = jnp.asarray(rng.integers(0, 300, B).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    got = np.asarray(segment_sum_mxu(ids, vals, R))
    ref = np.zeros((R, D), np.float32)
    np.add.at(ref, np.asarray(ids), np.asarray(vals))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_mxu_gather_vjp(rng):
    R, D, B = 384, 33, 256
    table = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 300, B).astype(np.int32))
    g = jax.grad(lambda t: jnp.sum(mxu_gather(t, ids) ** 2))(table)
    gref = jax.grad(lambda t: jnp.sum(t[ids] ** 2))(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref),
                               rtol=1e-5, atol=1e-5)


def test_table_lookup_shapes_and_fallback(rng):
    R, D = 384, 16
    table = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    ids2d = jnp.asarray(rng.integers(0, R, (64, 3)).astype(np.int32))
    out = table_lookup(table, ids2d, use_mxu=True)
    assert out.shape == (64, 3, D)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(table)[np.asarray(ids2d)]
    )
    # unaligned table rows fall back to plain indexing
    odd = jnp.asarray(rng.normal(size=(131, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 131, 64).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(table_lookup(odd, ids, use_mxu=True)),
        np.asarray(odd)[np.asarray(ids)],
    )


def test_bpr_mxu_matches_plain(pure_builds):
    """BPR trained with the MXU lookup kernels matches the plain gather
    path (interpret mode is exact f32; duplicate-row gradient sums may
    associate differently, hence the tolerance)."""
    from librecommender_tpu.models import BPR

    train_data, *_, data_info = pure_builds

    def fit(mxu):
        m = BPR("ranking", data_info, embed_size=8, n_epochs=2,
                batch_size=256, seed=3, mxu_gather=mxu)
        m.fit(train_data, neg_sampling=True, verbose=0)
        return m

    m_plain, m_mxu = fit(False), fit(True)
    la, lb = (jax.tree_util.tree_leaves(m.params) for m in (m_plain, m_mxu))
    for a, b in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_dense_masked_adam_matches_row_path(pure_builds):
    """The dense masked LazyAdam equals the row gather/scatter LazyAdam
    up to the documented saturated-pair case (a touched row whose grad is
    exactly zero decays momentum on the row path, freezes here) — loose
    tolerance absorbs those rare rows."""
    from librecommender_tpu.models import BPR

    train_data, *_, data_info = pure_builds

    def fit(mode):
        m = BPR("ranking", data_info, embed_size=8, n_epochs=2,
                batch_size=256, seed=3, mxu_gather=False)
        m.sparse_update_mode = mode
        m.fit(train_data, neg_sampling=True, verbose=0)
        return m

    m_rows, m_dense = fit("rows"), fit("dense")
    for k in m_rows.params:
        np.testing.assert_allclose(
            np.asarray(m_rows.params[k]), np.asarray(m_dense.params[k]),
            rtol=1e-3, atol=1e-3, err_msg=k,
        )


def test_feat_mxu_sparse_lookup_matches(feat_builds):
    """Training with MXU sparse-table lookups (forced on; interpret mode
    on CPU) matches the plain-gather fit."""
    from librecommender_tpu.models import DeepFM

    train_data, *_, data_info = feat_builds

    def fit(force):
        m = DeepFM("ranking", data_info, embed_size=8, n_epochs=1,
                   batch_size=256, seed=5, hidden_units=(16,))
        if force:
            # the trainer only enables this on TPU; force the kernel path
            m._mxu_lookup_force = True
        m.fit(train_data, neg_sampling=True, verbose=0)
        return m

    m_plain, m_mxu = fit(False), fit(True)
    la = jax.tree_util.tree_leaves(m_plain.params)
    lb = jax.tree_util.tree_leaves(m_mxu.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )

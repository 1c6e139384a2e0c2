"""Pallas streaming top-k kernel: interpret-mode exactness on CPU (on real
TPU the MXU's bf16 matmul changes scores within ~1e-2 relative; same-
precision agreement with lax.top_k is checked in the TPU benchmark)."""
import numpy as np
import pytest


@pytest.mark.parametrize("shape", [(13, 1000, 32, 10), (8, 512, 64, 16),
                                   (3, 100, 16, 5)])
def test_pallas_topk_matches_dense(shape):
    from librecommender_tpu.ops.pallas_topk import pallas_topk_padded

    U, N, D, k = shape
    rng = np.random.default_rng(0)
    users = rng.normal(size=(U, D)).astype(np.float32)
    items = rng.normal(size=(N, D)).astype(np.float32)
    ids, scores = pallas_topk_padded(users, items, k, interpret=True, tile_n=256)
    dense = users @ items.T
    expect = np.argsort(-dense, axis=1)[:, :k]
    np.testing.assert_array_equal(ids, expect)
    np.testing.assert_allclose(
        scores, np.take_along_axis(dense, expect, 1), rtol=1e-5
    )


def test_pallas_topk_masks_padded_catalog():
    from librecommender_tpu.ops.pallas_topk import pallas_topk_padded

    rng = np.random.default_rng(1)
    users = rng.normal(size=(4, 16)).astype(np.float32)
    items = rng.normal(size=(300, 16)).astype(np.float32)
    # claim only 200 real items: ids must never exceed 199
    ids, _ = pallas_topk_padded(users, items, 8, n_items=200,
                                interpret=True, tile_n=256)
    assert ids.max() < 200


def test_streaming_topk_consumed_filtering():
    """The size-gated pallas branch of topk_from_embeddings: over-fetch +
    host consumed filtering must equal the materializing path."""
    from librecommender_tpu.ops.topk import (
        _streaming_topk,
        _topk_scores,
        pad_consumed,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    U, N, D, k = 6, 500, 16, 7
    users = rng.normal(size=(U, D)).astype(np.float32)
    items = rng.normal(size=(N, D)).astype(np.float32)
    consumed_dict = {
        i: rng.integers(0, N, rng.integers(0, 20)).tolist() for i in range(U)
    }
    cons = pad_consumed(consumed_dict, np.arange(U))
    ids_s, sc_s = _streaming_topk(users, items, k, cons, interpret=True)
    ids_m, sc_m = _topk_scores(jnp.asarray(users), jnp.asarray(items), cons, k)
    np.testing.assert_array_equal(ids_s, np.asarray(ids_m))
    np.testing.assert_allclose(sc_s, np.asarray(sc_m), rtol=1e-5)
    for i in range(U):
        assert not set(ids_s[i]) & set(consumed_dict[i])


def test_topk_lastdim_small_matches_lax_topk():
    """Rank-matrix top-k (SIM's GSU path) must match lax.top_k exactly,
    including the lowest-index tie-break and -inf masked entries."""
    import jax
    import jax.numpy as jnp
    from librecommender_tpu.ops.topk import (
        topk_lastdim_small,
        topk_lastdim_small_onehot,
    )

    rng = np.random.default_rng(7)
    x = rng.normal(size=(3, 17, 23)).astype(np.float32)
    # inject ties and -inf masked tails
    x[0, 0, 3] = x[0, 0, 11] = x[0, 0, 19]
    x[:, :, 20:] = -np.inf
    x[1, 2, :] = -np.inf  # fully-masked row
    xj = jnp.asarray(x)
    for k in (1, 5, 10):
        ref_v, ref_i = jax.lax.top_k(xj, k)
        got_v, got_i = topk_lastdim_small(xj, k)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
        np.testing.assert_allclose(
            np.asarray(got_v), np.asarray(ref_v), rtol=1e-6
        )
        # one-hot variant: selection einsum == gather
        _, _, oh = topk_lastdim_small_onehot(xj, k)
        table = jnp.asarray(rng.normal(size=(3, 23, 8)).astype(np.float32))
        sel = jnp.einsum("bkl,bld->bkd", oh[:, 0].astype(table.dtype), table)
        gathered = table[jnp.arange(3)[:, None], ref_i[:, 0]]
        np.testing.assert_allclose(
            np.asarray(sel), np.asarray(gathered), rtol=1e-5, atol=1e-5
        )

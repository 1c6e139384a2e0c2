"""Ranking edge cases + batch-generator invariants (reference analogs:
tests/test_rank_reco.py, tests/test_collators.py)."""
import numpy as np
import pytest

from librecommender_tpu.recommendation.ranking import rank_recommendations


def test_rank_filters_consumed():
    scores = np.asarray([[5.0, 4.0, 3.0, 2.0, 1.0]])
    consumed = {0: [0, 1]}
    ids = rank_recommendations(
        "ranking", [0], scores, 2, 5, consumed, filter_consumed=True
    )
    assert set(np.asarray(ids).ravel()) == {2, 3}


def test_rank_without_filter_keeps_best():
    scores = np.asarray([[5.0, 4.0, 3.0, 2.0, 1.0]])
    ids = rank_recommendations(
        "ranking", [0], scores, 2, 5, {0: [0, 1]}, filter_consumed=False
    )
    assert list(np.asarray(ids).ravel()) == [0, 1]


def test_rank_consumed_exhausts_catalog():
    """When the unconsumed remainder can't fill n_rec, the reference
    returns the UNFILTERED top-k (consumed included) — ranking.py:38."""
    scores = np.asarray([[5.0, 4.0, 3.0, 2.0, 1.0]])
    consumed = {0: [0, 1, 2, 3]}
    ids = np.asarray(rank_recommendations(
        "ranking", [0], scores, 3, 5, consumed, filter_consumed=True
    )).ravel()
    assert list(ids) == [0, 1, 2]


def test_rank_reco_reference_battery():
    """Port of reference tests/test_rank_reco.py::test_rank_reco — exact
    expected lists for filtered, can't-filter, scores, and 2-D input."""
    user_ids = [1, 2]
    preds = np.array([-0.1, -0.01, 0, 0.1, 0.01, 1, -2, 4, 5, 6])
    n_rec, n_items = 2, 5
    consumed = {1: [3, 4], 2: [4]}

    with pytest.raises(ValueError):
        rank_recommendations("ranking", user_ids, preds, n_rec + 10,
                             n_items, consumed, filter_consumed=True)

    rec = rank_recommendations("ranking", user_ids, preds, n_rec, n_items,
                               consumed, filter_consumed=True)
    assert rec.shape == (2, 2)
    np.testing.assert_array_equal(rec[0], [2, 1])
    np.testing.assert_array_equal(rec[1], [3, 2])

    # can't-filter: n_rec + |consumed| > n_items -> unfiltered top-k
    rec = rank_recommendations("ranking", user_ids, preds, n_rec + 2,
                               n_items, consumed, filter_consumed=True)
    assert rec.shape == (2, 4)
    np.testing.assert_array_equal(rec[0], [3, 4, 2, 1])
    np.testing.assert_array_equal(rec[1], [3, 2, 0, 1])

    _, scores = rank_recommendations("ranking", user_ids, preds, n_rec,
                                     n_items, consumed,
                                     filter_consumed=True,
                                     return_scores=True)
    assert scores.shape == (2, 2)
    for row in scores.tolist():
        assert all(row[i - 1] >= row[i] for i in range(1, len(row)))

    # 2-D input accepted
    rec = rank_recommendations("ranking", user_ids, preds.reshape(2, 5),
                               n_rec, n_items, consumed,
                               filter_consumed=True)
    np.testing.assert_array_equal(rec[0], [2, 1])
    np.testing.assert_array_equal(rec[1], [3, 2])


def test_rank_random_reference_battery():
    """Port of reference tests/test_rank_reco.py::test_rank_random —
    softmax(raw)**0.75 sampling: +/-1e8 logits make membership
    deterministic."""
    rng = np.random.default_rng(0)
    user_ids = [1, 2]
    preds = np.array([-0.1, -1e8, 0, 0.1, 0.01, 1e8, -0.01, 1e7, 0.1, 0.01])
    n_rec, n_items = 2, 5
    consumed = {1: [3, 4], 2: [4]}

    rec = rank_recommendations("ranking", user_ids, preds, n_rec, n_items,
                               consumed, filter_consumed=True,
                               random_rec=True, np_rng=rng)
    assert rec.shape == (2, 2)
    assert 0 in rec[0] and 2 in rec[0]   # only finite-prob survivors
    assert 0 in rec[1]                   # 1e8 logit always sampled

    rec = rank_recommendations("ranking", user_ids, preds, n_rec + 2,
                               n_items, consumed, filter_consumed=True,
                               random_rec=True, np_rng=rng)
    assert rec.shape == (2, 4)
    assert 1 not in rec[0]  # -1e8 logit: prob ~1e-8 of being drawn
    assert 1 in rec[1]      # unfiltered row includes everything at k=4

    _, scores = rank_recommendations("ranking", user_ids, preds, n_rec,
                                     n_items, consumed,
                                     filter_consumed=True, random_rec=True,
                                     return_scores=True, np_rng=rng)
    assert scores.shape == (2, 2)
    for row in scores.tolist():
        assert all(row[i - 1] >= row[i] for i in range(1, len(row)))


def test_rank_random_rec_samples_by_score():
    rng = np.random.default_rng(0)
    scores = np.tile(np.asarray([[10.0, 5.0, 0.0, -5.0, -10.0]]), (1, 1))
    seen = set()
    for _ in range(20):
        ids = np.asarray(rank_recommendations(
            "ranking", [0], scores, 2, 5, {}, filter_consumed=False,
            random_rec=True, np_rng=rng,
        )).ravel()
        seen.update(int(i) for i in ids)
    # stochastic but score-weighted: the top item always present overall
    assert 0 in seen and len(seen) >= 2


def test_batch_generator_padding_and_weights(pure_builds):
    from librecommender_tpu.batch import BatchGenerator

    train_data, *_, data_info = pure_builds
    bs = 256
    gen = BatchGenerator(
        train_data, data_info, bs, neg_sampling=True, sampler="random",
        num_neg=1, paradigm="pointwise", seed=0,
    )
    arrays = gen.epoch_arrays()
    n = gen.n_batches() * bs
    for key, arr in arrays.items():
        assert len(arr) == n, key
    w = np.asarray(arrays["weight"])
    n_real = len(train_data)
    assert w[:n_real].min() == 1.0
    if n > n_real:  # padded tail masked out
        assert np.all(w[n_real:] == 0.0)


def test_batch_generator_host_samplers(pure_builds):
    from librecommender_tpu.batch import BatchGenerator

    train_data, *_, data_info = pure_builds
    for sampler in ("popular", "unconsumed"):
        gen = BatchGenerator(
            train_data, data_info, 128, neg_sampling=True, sampler=sampler,
            num_neg=2, paradigm="pointwise", seed=0,
        )
        negs = gen.epoch_negatives()
        assert negs is not None
        negs = np.asarray(negs)
        assert negs.shape[1] == 2
        assert negs.min() >= 0 and negs.max() < data_info.n_items
        if sampler == "unconsumed":
            consumed = data_info.user_consumed
            users = np.asarray(gen.epoch_arrays()["user"])[: len(train_data)]
            bad = sum(
                int(n in set(consumed.get(int(u), ())))
                for u, row in zip(users[:500], negs[:500])
                for n in row
            )
            assert bad == 0


def test_sequence_modes_differ(pure_builds):
    from librecommender_tpu.batch.sequence import build_train_seqs

    train_data, *_, _ = pure_builds
    users = np.asarray(train_data.user_indices)
    items = np.asarray(train_data.item_indices)
    recent, _ = build_train_seqs(users, items, 1000, 5, mode="recent", seed=0)
    rand1, _ = build_train_seqs(users, items, 1000, 5, mode="random", seed=0)
    rand2, _ = build_train_seqs(users, items, 1000, 5, mode="random", seed=0)
    rand3, _ = build_train_seqs(users, items, 1000, 5, mode="random", seed=1)
    assert not np.array_equal(recent, rand1)
    np.testing.assert_array_equal(rand1, rand2)  # seed-stable
    assert not np.array_equal(rand1, rand3)


def test_pack_epoch_arrays_roundtrip():
    """Packed epoch matrices + layout reconstruct every batch key exactly
    (incl. 2-D seq arrays and dtype normalization)."""
    import numpy as np

    from librecommender_tpu.training.trainer import Trainer

    N = 50
    rng = np.random.default_rng(0)
    host = {
        "user": rng.integers(0, 9, N).astype(np.int64),
        "item": rng.integers(0, 7, N).astype(np.int32),
        "label": rng.random(N).astype(np.float64),
        "weight": np.ones(N, np.float32),
        "seq": rng.integers(0, 7, (N, 4)).astype(np.int64),
    }
    packed, layout = Trainer._pack_epoch_arrays(host)
    assert packed["ints"].dtype == np.int32
    assert packed["flts"].dtype == np.float32
    assert packed["ints"].shape == (N, 1 + 1 + 4)
    assert packed["flts"].shape == (N, 2)
    for k, (mat, start, ncols, tail) in layout.items():
        cols = packed[mat][:, start:start + ncols]
        got = cols.reshape((N,) + tail) if tail else cols[:, 0]
        np.testing.assert_array_equal(got, host[k].astype(got.dtype))


def test_recommend_chunk_padding_consistency(feat_builds):
    """Batch recommends equal single-user recommends (tail chunks pad to
    the next power of two, not the full users_per_call shape)."""
    from librecommender_tpu.models import DeepFM

    train_data, *_, data_info = feat_builds
    model = DeepFM("ranking", data_info, embed_size=8, n_epochs=1,
                   batch_size=256, hidden_units=(16,))
    model.fit(train_data, neg_sampling=True, verbose=0)
    users = list(range(5))  # 5 -> chunks of 5 (pads to 8) vs singles (pad 1)
    batch = model.recommend_user(user=users, n_rec=7, inner_id=True)
    for u in users:
        single = model.recommend_user(user=u, n_rec=7, inner_id=True)
        assert list(batch[u]) == list(single[u])


def test_recommend_oom_backoff(feat_builds):
    """HBM exhaustion during a chunked recommend halves users_per_call,
    remembers the cap on the instance, and still returns every user's
    recommendations (the catalog scorers materialize O(users x n_items)
    activations, so the fitting chunk is model/catalog dependent)."""
    from librecommender_tpu.models import DeepFM

    train_data, *_, data_info = feat_builds
    model = DeepFM("ranking", data_info, embed_size=8, n_epochs=1,
                   batch_size=256, hidden_units=(16,))
    model.fit(train_data, neg_sampling=True, verbose=0)
    users = list(range(11))
    expected = model.recommend_user(user=users, n_rec=5, inner_id=True)

    model._recommend_fn = None
    model._ensure_inference_fns()
    real_fn, calls = model._recommend_fn, []

    def fake_oom(params, uids, u_call):
        calls.append(u_call)
        if u_call > 4:
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory in HBM")
        return real_fn(params, uids, u_call)

    model._recommend_fn = fake_oom
    got = model.recommend_user(user=users, n_rec=5, inner_id=True,
                               users_per_call=16)
    for u in users:
        assert list(got[u]) == list(expected[u])
    assert model._users_per_call_cap == 4
    # 11 users @ cap 16: OOM at 16, OOM at 8, then chunks 4+4+3 (pad 4)
    assert calls == [16, 8, 4, 4, 4]
    # the learned cap sticks for the next call (no users_per_call given)
    calls.clear()
    model.recommend_user(user=users, n_rec=5, inner_id=True)
    assert all(c <= 4 for c in calls)

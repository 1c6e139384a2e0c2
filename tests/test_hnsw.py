"""Native HNSW index: recall vs exact search, persistence, model wiring.

Reference analog: tests/test_knn_embed.py (exact vs nmslib HNSW search).
"""
import numpy as np
import pytest

from librecommender_tpu.retrieval.hnsw import HNSWIndex


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(5000, 32)).astype(np.float32)
    queries = rng.normal(size=(200, 32)).astype(np.float32)
    exact = np.argsort(-(queries @ vecs.T), axis=1)[:, :10]
    return vecs, queries, exact


def _recall(ids, exact):
    k = exact.shape[1]
    return np.mean([
        len(set(ids[i]) & set(exact[i])) / k for i in range(len(exact))
    ])


def test_hnsw_recall(corpus):
    """Random gaussian vectors are the adversarial case for graph ANN;
    recall@10 >= 0.9 at the default config still holds (structured
    embedding spaces measure higher — docs/serving_guide.md)."""
    vecs, queries, exact = corpus
    idx = HNSWIndex.build(vecs, M=16, ef_construction=200, seed=1)
    ids, scores = idx.search(queries, 10, ef_search=200)
    assert _recall(ids, exact) >= 0.9
    # scores are true inner products of the returned ids
    np.testing.assert_allclose(
        scores[0], queries[0] @ vecs[ids[0]].T, rtol=1e-5, atol=1e-5
    )


def test_hnsw_ef_search_tradeoff(corpus):
    """Larger ef_search monotonically improves recall (the reference's
    nmslib knob semantics)."""
    vecs, queries, exact = corpus
    idx = HNSWIndex.build(vecs, M=16, ef_construction=100, seed=1)
    r_small = _recall(idx.search(queries, 10, ef_search=20)[0], exact)
    r_large = _recall(idx.search(queries, 10, ef_search=400)[0], exact)
    assert r_large >= r_small
    assert r_large >= 0.95


def test_hnsw_query_dim_mismatch_raises(corpus):
    """A query whose width differs from the indexed vectors must fail
    fast (ValueError), not read out of bounds in native code (ADVICE r3)."""
    vecs, _, _ = corpus
    idx = HNSWIndex.build(vecs[:500], M=8, ef_construction=64, seed=3)
    bad = np.zeros((4, vecs.shape[1] + 3), np.float32)
    with pytest.raises(ValueError, match="dim"):
        idx.search(bad, 5)


def test_hnsw_save_load_roundtrip(corpus, tmp_path):
    vecs, queries, _ = corpus
    idx = HNSWIndex.build(vecs[:1000], M=8, ef_construction=64, seed=3)
    ids, _ = idx.search(queries, 5, ef_search=64)
    idx.save(tmp_path)
    idx2 = HNSWIndex.load(tmp_path)
    ids2, _ = idx2.search(queries, 5, ef_search=64)
    np.testing.assert_array_equal(ids, ids2)


def test_hnsw_fallback_exact(corpus, monkeypatch):
    """LIBREC_TPU_NO_NATIVE degrades to brute-force (recall 1.0)."""
    vecs, queries, exact = corpus
    import librecommender_tpu.retrieval.hnsw as hn

    monkeypatch.setattr(hn, "get_hnsw_lib", lambda: None)
    idx = HNSWIndex.build(vecs, M=16)
    assert idx._handle is None
    ids, _ = idx.search(queries, 10)
    assert _recall(ids, exact) == 1.0


def test_model_init_knn_hnsw(pure_builds, pure_frames):
    """init_knn(approximate=True) builds HNSW indexes; similar-item
    search overlaps the exact search heavily on a trained model."""
    from librecommender_tpu.models import BPR

    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=16, n_epochs=2,
                batch_size=512)
    model.fit(train_data, neg_sampling=True, verbose=0)
    item = pure_frames[0].item.iloc[0]
    exact = model.init_knn(approximate=False,
                           sim_type="cosine").search_knn_items(item, 10)
    approx = model.init_knn(approximate=True, sim_type="cosine",
                            ef_search=400).search_knn_items(item, 10)
    assert len(set(exact) & set(approx)) >= 7


def test_model_init_ann_hnsw(pure_builds, pure_frames):
    """init_ann(index='hnsw') routes recommend_user through the graph
    index; results overlap the exact top-k."""
    from librecommender_tpu.models import BPR

    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=16, n_epochs=2,
                batch_size=512)
    model.fit(train_data, neg_sampling=True, verbose=0)
    user = pure_frames[0].user.iloc[0]
    exact = model.recommend_user(user=user, n_rec=10)[user]
    model.init_ann(index="hnsw", ef_search=400)
    approx = model.recommend_user(user=user, n_rec=10)[user]
    assert len(set(map(int, exact)) & set(map(int, approx))) >= 7

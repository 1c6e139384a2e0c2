"""IVF approximate-nearest-neighbor index tests (reference:
tests/test_knn_embed.py exact-vs-ANN and tests/serving/test_faiss_index.py)."""
import numpy as np
import pytest

from librecommender_tpu.retrieval import IVFIndex


def _clustered_vectors(n=2000, d=32, n_clusters=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 4
    assign = rng.integers(0, n_clusters, n)
    return (centers[assign] + rng.normal(size=(n, d))).astype(np.float32)


def test_ivf_recall_vs_exact():
    items = _clustered_vectors()
    queries = _clustered_vectors(n=32, seed=7)
    index = IVFIndex.build(items, n_clusters=16, seed=0)
    ids, scores = index.search(queries, k=10, n_probe=6)
    exact = np.argsort(-(queries @ items.T), axis=1)[:, :10]
    recall = np.mean([
        len(set(ids[r]) & set(exact[r])) / 10 for r in range(len(queries))
    ])
    assert recall >= 0.9, recall
    # scores are true inner products for the returned ids
    np.testing.assert_allclose(
        scores[0][ids[0] >= 0],
        (queries[0][None] @ items[ids[0][ids[0] >= 0]].T)[0],
        rtol=1e-4,
    )


def test_ivf_save_load(tmp_path):
    items = _clustered_vectors(n=300)
    index = IVFIndex.build(items, n_clusters=8)
    index.save(tmp_path)
    loaded = IVFIndex.load(tmp_path)
    q = items[:4]
    np.testing.assert_array_equal(
        index.search(q, 5, 4)[0], loaded.search(q, 5, 4)[0]
    )


def test_embed_base_ann_recommend(pure_builds, pure_frames):
    """init_ann switches recommend_user to the IVF path; results overlap
    heavily with exact retrieval and still respect consumed filtering."""
    from librecommender_tpu.models import BPR

    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=16, n_epochs=3, lr=0.02,
                batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    user = pure_frames[0].user.iloc[0]
    exact = model.recommend_user(user=user, n_rec=10)[user]
    model.init_ann(n_clusters=8, n_probe=8)  # probe all -> near-exact
    approx = model.recommend_user(user=user, n_rec=10)[user]
    overlap = len(set(map(int, exact)) & set(map(int, approx)))
    assert overlap >= 8
    uid = data_info.user2id[user]
    consumed = set(data_info.user_consumed[uid])
    assert not ({data_info.item2id[i] for i in approx} & consumed)


def test_save_ivf_index(pure_builds, tmp_path):
    from librecommender_tpu.models import BPR
    from librecommender_tpu.serving import save_ivf_index

    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    index = save_ivf_index(tmp_path / "ivf", model, n_clusters=8)
    loaded = IVFIndex.load(tmp_path / "ivf")
    assert loaded.n_items == model.n_items

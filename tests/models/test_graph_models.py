"""Graph model family tests: LightGCN / NGCF / GraphSage / PinSage."""
import numpy as np
import pytest

from librecommender_tpu.evaluation import evaluate
from librecommender_tpu.models import NGCF, GraphSage, LightGCN, PinSage

from tests.utils_models import ptest_preds, ptest_recommends, ptest_save_load

MODELS = {
    "LightGCN": (LightGCN, {"n_layers": 2, "dropout_rate": 0.1}),
    "NGCF": (NGCF, {"hidden_units": (16, 16), "node_dropout": 0.1,
                    "message_dropout": 0.1}),
    "GraphSage": (GraphSage, {"num_layers": 2, "num_neighbors": 5}),
    "PinSage": (PinSage, {"num_layers": 2, "num_neighbors": 5, "num_walks": 4}),
}


@pytest.mark.parametrize("name", list(MODELS))
@pytest.mark.parametrize("loss_type", ["bpr", "cross_entropy"])
def test_graph_model_end_to_end(pure_builds, pure_frames, name, loss_type, tmp_path):
    train_data, eval_data, test_data, data_info = pure_builds
    cls, extra = MODELS[name]
    model = cls("ranking", data_info, loss_type=loss_type, embed_size=8,
                n_epochs=1, batch_size=256, **extra)
    model.fit(train_data, neg_sampling=True, verbose=1, eval_data=eval_data)
    ptest_preds(model, "ranking", pure_frames)
    ptest_recommends(model, data_info, pure_frames)
    ptest_save_load(model, cls, data_info, pure_frames, tmp_path)
    result = evaluate(model, test_data, neg_sampling=True, metrics=["roc_auc", "ndcg"])
    assert np.isfinite(result["roc_auc"])


@pytest.mark.parametrize("name", ["GraphSage", "PinSage"])
@pytest.mark.parametrize(
    "loss_type, sampler, start_node, focus_start",
    [
        ("bpr", "random", "random", False),
        ("cross_entropy", "popular", "unpopular", True),
        ("max_margin", "random", "random", False),
        ("focal", "random", "random", True),
        ("bpr", "out-batch", "random", False),
    ],
)
def test_sage_i2i_end_to_end(
    pure_builds, pure_frames, name, loss_type, sampler, start_node,
    focus_start, tmp_path
):
    """i2i paradigm: device-side walk pairs, in-kernel negatives, user =
    mean of consumed item embeddings at inference (reference
    sage_base.py:170, collators.py:348)."""
    train_data, eval_data, test_data, data_info = pure_builds
    cls, extra = MODELS[name]
    extra = {k: v for k, v in extra.items() if k != "num_walks"}
    model = cls(
        "ranking", data_info, loss_type=loss_type, embed_size=8,
        n_epochs=1, batch_size=256, paradigm="i2i", sampler=sampler,
        num_walks=3, sample_walk_len=2, start_node=start_node,
        focus_start=focus_start, **extra,
    )
    model.fit(train_data, neg_sampling=True, verbose=1, eval_data=eval_data)
    # batch expansion factor: num_neg * num_walks * walk_len
    assert model.trainer.batch_size == 256 // (1 * 3 * 2)
    ptest_preds(model, "ranking", pure_frames)
    ptest_recommends(model, data_info, pure_frames)
    ptest_save_load(model, cls, data_info, pure_frames, tmp_path)
    result = evaluate(model, test_data, neg_sampling=True, metrics=["roc_auc"])
    assert np.isfinite(result["roc_auc"])
    # i2i user embedding contract: mean of consumed item embeddings
    u = 0
    consumed = data_info.user_consumed[u]
    expect = model.item_embeds_np[consumed].mean(axis=0)
    np.testing.assert_allclose(model.user_embeds_np[u], expect, rtol=1e-5)


def test_sage_i2i_invalid_combos(pure_builds):
    *_, data_info = pure_builds
    with pytest.raises(ValueError):
        GraphSage("ranking", data_info, paradigm="wrong")
    with pytest.raises(ValueError):
        GraphSage("ranking", data_info, paradigm="i2i", start_node="popular")
    with pytest.raises(ValueError):
        GraphSage("ranking", data_info, paradigm="i2i", sampler="unconsumed")


def test_walk_pairs_properties(pure_builds):
    """Walk positives are genuine co-consumption neighbors; anchors stay
    at the start node under focus_start."""
    import jax

    from librecommender_tpu.graph.walks import i2i_negatives, walk_pairs

    *_, data_info = pure_builds
    model = GraphSage("ranking", data_info, paradigm="i2i", num_walks=4,
                      sample_walk_len=3, focus_start=True)
    model.build_model()
    start = np.arange(8, dtype=np.int32)
    anchors, pos, valid = jax.jit(
        lambda r, s: walk_pairs(
            r, s, model.item_nbr, model.item_deg, model.user_nbr,
            model.user_deg, 4, 3, True,
        )
    )(jax.random.PRNGKey(0), start)
    anchors, pos, valid = map(np.asarray, (anchors, pos, valid))
    assert anchors.shape == (8 * 4 * 3,)
    # focus_start anchors every pair at its start node
    np.testing.assert_array_equal(
        anchors, np.repeat(start, 12)
    )
    assert ((pos >= 0) & (pos < data_info.n_items)).all()
    # no valid pair walks back into its anchor
    assert (pos[valid > 0] != anchors[valid > 0]).all()
    neg = np.asarray(
        i2i_negatives(jax.random.PRNGKey(1), data_info.n_items,
                      anchors, pos, 2)
    )
    assert neg.shape == (anchors.shape[0], 2)
    assert ((neg >= 0) & (neg < data_info.n_items)).all()
    # one-hop walks: every valid positive must share >=1 consumer with
    # its anchor (true bipartite co-occurrence, not arbitrary ids)
    a1, p1, v1 = map(np.asarray, walk_pairs(
        jax.random.PRNGKey(2), start, model.item_nbr, model.item_deg,
        model.user_nbr, model.user_deg, 8, 1, True,
    ))
    item_users = {
        i: set(us) for i, us in data_info.item_consumed.items()
    }
    for a, p in zip(a1[v1 > 0], p1[v1 > 0]):
        assert item_users[int(a)] & item_users[int(p)], (a, p)


def test_lightgcn_learns(pure_builds):
    train_data, *_, data_info = pure_builds
    model = LightGCN("ranking", data_info, loss_type="bpr", embed_size=16,
                     n_epochs=10, lr=0.05, batch_size=512, n_layers=2)
    model.fit(train_data, neg_sampling=True, verbose=0)
    result = evaluate(model, train_data, neg_sampling=True, metrics=["roc_auc"])
    assert result["roc_auc"] > 0.65


def test_lightgcn_propagation_matches_dense():
    """segment_sum propagation == dense normalized-adjacency matmul."""
    import jax.numpy as jnp
    import pandas as pd

    from librecommender_tpu.data import DatasetPure

    rng = np.random.default_rng(0)
    frame = pd.DataFrame({
        "user": rng.integers(0, 12, 150),
        "item": rng.integers(0, 20, 150),
        "label": np.ones(150),
    }).drop_duplicates(subset=["user", "item"])
    train_data, data_info = DatasetPure.build_trainset(frame)
    model = LightGCN("ranking", data_info, embed_size=4, n_layers=1,
                 adj_dtype="f32")
    model.build_model()
    user_out, item_out = model._propagate(
        model.params, __import__("jax").random.PRNGKey(0), False
    )
    # dense reference
    n_u, n_i = data_info.n_users, data_info.n_items
    A = np.zeros((n_u, n_i))
    for u, items in data_info.user_consumed.items():
        for i in set(items):
            A[u, i] = 1.0
    du, di = A.sum(1), A.sum(0)
    norm = A / np.sqrt(np.outer(np.maximum(du, 1), np.maximum(di, 1)))
    ue = np.asarray(model.params["user_embed"])[:n_u]
    ie = np.asarray(model.params["item_embed"])[:n_i]
    expect_u = (ue + norm @ ie) / 2
    np.testing.assert_allclose(
        np.asarray(user_out)[:n_u], expect_u, rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("cls", [LightGCN, NGCF])
def test_dense_adjacency_matches_edge_list(pure_builds, cls):
    """The MXU dense-adjacency propagation equals the segment_sum path."""
    import jax

    train_data, *_, data_info = pure_builds
    kw = (
        {"n_layers": 2, "adj_dtype": "f32"}
        if cls is LightGCN
        else {"hidden_units": (8, 8)}
    )
    dense_m = cls("ranking", data_info, embed_size=8, **kw)
    dense_m.build_model()
    assert dense_m.adj is not None
    sparse_m = cls("ranking", data_info, embed_size=8, dense_adj_limit=0, **kw)
    sparse_m.build_model()
    assert sparse_m.adj is None
    sparse_m.params = dense_m.params
    u1, i1 = dense_m._propagate(dense_m.params, jax.random.PRNGKey(0), False)
    u2, i2 = sparse_m._propagate(sparse_m.params, jax.random.PRNGKey(0), False)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), rtol=2e-4, atol=2e-5)


def test_lightgcn_bf16_adjacency_close_to_f32():
    """The default bf16 adjacency (HBM-halving MXU path) stays within bf16
    tolerance of exact f32 propagation."""
    import jax
    import pandas as pd

    from librecommender_tpu.data import DatasetPure

    rng = np.random.default_rng(1)
    frame = pd.DataFrame({
        "user": rng.integers(0, 30, 400),
        "item": rng.integers(0, 40, 400),
        "label": np.ones(400),
    }).drop_duplicates(subset=["user", "item"])
    train_data, data_info = DatasetPure.build_trainset(frame)
    m16 = LightGCN("ranking", data_info, embed_size=8, n_layers=2)
    m16.build_model()
    m32 = LightGCN("ranking", data_info, embed_size=8, n_layers=2,
                   adj_dtype="f32")
    m32.build_model()
    m32.params = m16.params
    u16, i16 = m16._propagate(m16.params, jax.random.PRNGKey(0), False)
    u32, i32 = m32._propagate(m32.params, jax.random.PRNGKey(0), False)
    # bf16 has an 8-bit mantissa: ~0.4% relative per product, amplified
    # by 2 layers of accumulation
    np.testing.assert_allclose(np.asarray(u16), np.asarray(u32),
                               rtol=0.05, atol=2e-3)
    np.testing.assert_allclose(np.asarray(i16), np.asarray(i32),
                               rtol=0.05, atol=2e-3)


def test_graph_torch_family_options(pure_builds, pure_frames):
    """Reference torch-family kwargs: margin (max_margin loss), amsgrad
    (torch Adam option), dropout_rate, remove_edges (warned no-op under
    full-graph propagation), neighbor_walk_len (PinSage walk length)."""
    train_data, *_, data_info = pure_builds
    m = GraphSage(
        "ranking", data_info, loss_type="max_margin", embed_size=8,
        n_epochs=1, batch_size=256, margin=0.5, amsgrad=True,
        dropout_rate=0.3,
    )
    m.fit(train_data, neg_sampling=True, verbose=0)
    ptest_preds(m, "ranking", pure_frames)

    with pytest.warns(UserWarning, match="remove_edges"):
        GraphSage("ranking", data_info, remove_edges=True)

    p = PinSage(
        "ranking", data_info, loss_type="max_margin", embed_size=8,
        n_epochs=1, batch_size=256, neighbor_walk_len=3, margin=2.0,
    )
    p.fit(train_data, neg_sampling=True, verbose=0)
    ptest_preds(p, "ranking", pure_frames)

    g = LightGCN(
        "ranking", data_info, loss_type="max_margin", embed_size=8,
        n_epochs=1, batch_size=256, margin=0.2, amsgrad=True,
    )
    g.fit(train_data, neg_sampling=True, verbose=0)
    ptest_preds(g, "ranking", pure_frames)


def test_graph_margin_changes_loss(pure_builds):
    """margin must actually reach the max_margin loss."""
    train_data, *_, data_info = pure_builds
    import jax

    losses = []
    for margin in (0.1, 5.0):
        m = GraphSage(
            "ranking", data_info, loss_type="max_margin", embed_size=8,
            margin=margin, seed=7,
        )
        m.build_model()
        batch = {
            "user": np.arange(32) % data_info.n_users,
            "item": np.arange(32) % data_info.n_items,
            "item_neg": (np.arange(32)[:, None] + 7) % data_info.n_items,
            "label": np.ones(32, np.float32),
            "weight": np.ones(32, np.float32),
        }
        losses.append(float(m.loss_fn(m.params, batch, jax.random.PRNGKey(0))))
    assert losses[1] > losses[0]  # larger margin -> larger hinge loss at init

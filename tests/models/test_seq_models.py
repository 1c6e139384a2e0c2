"""Sequence-model family tests (DIN / YouTubeRanking / Transformer / SIM /
RNN4Rec / Caser / WaveNet)."""
import numpy as np
import pytest

from librecommender_tpu.evaluation import evaluate
from librecommender_tpu.models import (
    DIN,
    SIM,
    Caser,
    RNN4Rec,
    Transformer,
    WaveNet,
    YouTubeRanking,
)

from tests.utils_models import ptest_preds, ptest_recommends, ptest_save_load

FEAT_SEQ_MODELS = {
    "DIN": (DIN, {"hidden_units": (32, 16)}),
    "YouTubeRanking": (YouTubeRanking, {"hidden_units": (32, 16)}),
    "Transformer": (Transformer, {"hidden_units": (32, 16), "num_heads": 2}),
    "SIM": (SIM, {"hidden_units": (32, 16), "long_max_len": 20, "search_topk": 5}),
}

DYN_MODELS = {
    "RNN4Rec": (RNN4Rec, {}),
    "Caser": (Caser, {"recent_num": 6}),
    "WaveNet": (WaveNet, {}),
}


@pytest.mark.parametrize("name", list(FEAT_SEQ_MODELS))
def test_feat_seq_model_end_to_end(feat_builds, feat_frames, name, tmp_path):
    train_data, eval_data, test_data, data_info = feat_builds
    cls, extra = FEAT_SEQ_MODELS[name]
    model = cls("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=256, recent_num=5, **extra)
    model.fit(train_data, neg_sampling=True, verbose=1, eval_data=eval_data)
    ptest_preds(model, "ranking", feat_frames)
    ptest_recommends(model, data_info, feat_frames)
    ptest_save_load(model, cls, data_info, feat_frames, tmp_path)
    result = evaluate(model, test_data, neg_sampling=True, metrics=["roc_auc", "ndcg"])
    assert np.isfinite(result["roc_auc"])


@pytest.mark.parametrize("name", list(DYN_MODELS))
@pytest.mark.parametrize("loss_type", ["cross_entropy", "bpr"])
def test_dyn_model_end_to_end(pure_builds, pure_frames, name, loss_type, tmp_path):
    train_data, eval_data, test_data, data_info = pure_builds
    cls, extra = DYN_MODELS[name]
    model = cls("ranking", data_info, loss_type=loss_type, embed_size=8,
                n_epochs=1, batch_size=256, **extra)
    model.fit(train_data, neg_sampling=True, verbose=1, eval_data=eval_data)
    ptest_preds(model, "ranking", pure_frames)
    ptest_recommends(model, data_info, pure_frames)
    ptest_save_load(model, cls, data_info, pure_frames, tmp_path)


def test_dyn_seq_recommend(pure_builds, pure_frames):
    """Request-time sequences produce different, valid recommendations."""
    train_data, *_, data_info = pure_builds
    train_frame = pure_frames[0]
    model = RNN4Rec("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    user = train_frame.user.iloc[0]
    items = train_frame.item.iloc[:6].tolist()
    recs_with_seq = model.recommend_user(user=user, n_rec=5, seq=items)
    assert len(recs_with_seq[user]) == 5
    # a dynamic user embedding for an unknown user with a seq also works
    recs_cold = model.recommend_user(user=-777, n_rec=5, seq=items)
    assert len(recs_cold[-777]) == 5


def test_seq_model_learns_next_item():
    """On data with sequential structure (item walks with step +1/+2), a
    recurrent model must rank the true next item far above chance."""
    import pandas as pd

    from librecommender_tpu.data import DatasetPure

    rng = np.random.default_rng(3)
    n_items, rows, next_item = 50, [], {}
    for u in range(40):
        pos = int(rng.integers(0, n_items))
        walk = []
        for _ in range(31):
            pos = (pos + int(rng.integers(1, 3))) % n_items
            walk.append(pos)
        for p in walk[:-1]:
            rows.append((u, p, 1.0))
        next_item[u] = walk[-1]  # held-out continuation
    frame = pd.DataFrame(rows, columns=["user", "item", "label"]).drop_duplicates(
        subset=["user", "item"]
    )
    train_data, data_info = DatasetPure.build_trainset(frame)
    model = RNN4Rec("ranking", data_info, loss_type="bpr", embed_size=16,
                    n_epochs=10, lr=0.05, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    hits = 0
    evaluated = 0
    for u, nxt in next_item.items():
        if u not in data_info.user2id or nxt not in data_info.item2id:
            continue
        recs = model.recommend_user(user=u, n_rec=10)[u]
        evaluated += 1
        hits += int(nxt in set(int(i) for i in recs))
    # chance would be ~10/50 = 0.2 (slightly higher after consumed filtering)
    assert evaluated > 20
    assert hits / evaluated > 0.4


def test_train_seq_construction():
    """Training sequences contain only items consumed before the target."""
    from librecommender_tpu.batch.sequence import build_train_seqs

    users = np.array([0, 0, 0, 1, 1])
    items = np.array([10, 11, 12, 20, 21])
    seqs, lens = build_train_seqs(users, items, n_items=100, max_len=3)
    np.testing.assert_array_equal(seqs[0], [100, 100, 100])  # no history
    np.testing.assert_array_equal(seqs[1], [100, 100, 10])
    np.testing.assert_array_equal(seqs[2], [100, 10, 11])
    np.testing.assert_array_equal(seqs[3], [100, 100, 100])
    np.testing.assert_array_equal(seqs[4], [100, 100, 20])
    np.testing.assert_array_equal(lens, [0, 1, 2, 0, 1])


def test_feat_dynamic_recommend(feat_builds, feat_frames):
    """Request-time user_feats and seq overrides change scores and work for
    unknown users (reference online path)."""
    train_data, *_, data_info = feat_builds
    frame = feat_frames[0]
    model = DIN("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=256, recent_num=5)
    model.fit(train_data, neg_sampling=True, verbose=0)
    user = frame.user.iloc[0]
    items = [i for i in frame.item.iloc[:6]]
    recs_seq = model.recommend_user(user=user, n_rec=5, seq=items)
    assert len(recs_seq[user]) == 5
    recs_feats = model.recommend_user(
        user=user, n_rec=5, user_feats={"sex": "m", "age": 0.5}
    )
    assert len(recs_feats[user]) == 5
    # unknown user with dynamic state still gets recommendations
    recs_cold = model.recommend_user(user=-3210, n_rec=5, seq=items)
    assert len(recs_cold[-3210]) == 5


def test_sim_dual_stage_output(feat_builds):
    """SIM trains on alpha*first + beta*second but serves the second stage
    alone (reference libreco/algorithms/sim.py:193-209 inference_output)."""
    import jax

    train_data, _, _, data_info = feat_builds
    model = SIM("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
                hidden_units=(16,), long_max_len=20, search_topk=5,
                alpha=0.4, beta=0.6, recent_num=5)
    model.fit(train_data, neg_sampling=True, verbose=0)
    # two separate stage heads exist
    assert "first_mlp" in model.params and "first_head" in model.params
    assert "mlp" in model.params and "head" in model.params

    users = np.asarray(train_data.user_indices[:16])
    items = np.asarray(train_data.item_indices[:16])
    import jax.numpy as jnp

    inputs = {"user": jnp.asarray(users), "item": jnp.asarray(items)}
    second = model._forward(model.params, inputs, train=False, rng=None)
    combined = model._forward(
        model.params, inputs, train=True, rng=jax.random.PRNGKey(0)
    )
    # inference output is the second stage only; the training output mixes in
    # the first stage and must differ from a pure rescale of the second
    assert not np.allclose(np.asarray(combined), 0.6 * np.asarray(second))

    # alpha=0, beta=1 with no dropout collapses training output onto the
    # second stage exactly
    model.alpha, model.beta = 0.0, 1.0
    combined0 = model._forward(
        model.params, inputs, train=True, rng=jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(
        np.asarray(combined0), np.asarray(second), rtol=2e-4, atol=2e-5
    )


def test_multi_user_dynamic_recommend(feat_builds, feat_frames):
    """Dynamic overrides for SEVERAL users in one call (the reference limits
    user_feats/seq to a single user, recommend.py:39; lifted here)."""
    train_data, *_, data_info = feat_builds
    frame = feat_frames[0]
    model = DIN("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=256, recent_num=5)
    model.fit(train_data, neg_sampling=True, verbose=0)
    users = list(frame.user.iloc[:3])
    items = [i for i in frame.item.iloc[:6]]
    # shared feats dict for all users
    recs = model.recommend_user(user=users, n_rec=4,
                                user_feats={"sex": "f", "age": -0.5})
    assert set(recs) == set(users) and all(len(v) == 4 for v in recs.values())
    # per-user feats list + per-user seq lists
    recs2 = model.recommend_user(
        user=users, n_rec=4,
        user_feats=[{"sex": "m"}, {"sex": "f"}, {"age": 1.0}],
        seq=[items[:2], items[2:4], items[4:]],
    )
    assert set(recs2) == set(users) and all(len(v) == 4 for v in recs2.values())
    # mismatched per-user list raises
    import pytest as _pytest
    with _pytest.raises(ValueError):
        model.recommend_user(user=users, n_rec=4, user_feats=[{"sex": "m"}])


def test_din_sparse_optimizer(feat_builds):
    """Row-sparse LazyAdam on the feat/seq family: embedding tables
    (incl. seq-touched item rows and flat sparse rows) train through
    touched-rows updates and reach quality comparable to dense Adam."""
    import numpy as np

    from librecommender_tpu.evaluation import evaluate
    from librecommender_tpu.models import DIN

    train_data, eval_data, *_ , data_info = feat_builds
    dense = DIN("ranking", data_info, embed_size=8, n_epochs=3,
                batch_size=256, recent_num=5, lr=0.01)
    dense.fit(train_data, neg_sampling=True, verbose=0)
    auc_dense = evaluate(dense, eval_data, neg_sampling=True,
                         metrics=["roc_auc"], seed=0)["roc_auc"]
    sparse = DIN("ranking", data_info, embed_size=8, n_epochs=3,
                 batch_size=256, recent_num=5, lr=0.01,
                 sparse_optimizer=True)
    sparse.fit(train_data, neg_sampling=True, verbose=0)
    auc_sparse = evaluate(sparse, eval_data, neg_sampling=True,
                          metrics=["roc_auc"], seed=0)["roc_auc"]
    assert np.isfinite(auc_sparse)
    # lazy vs dense Adam differ in momentum semantics, not learnability
    assert auc_sparse > auc_dense - 0.1


@pytest.mark.parametrize(
    "opts",
    [
        {"positional_embedding": "sinusoidal"},
        {"use_causal_mask": True},
        {"feat_agg_mode": "elementwise"},
        {"feat_agg_mode": None},  # extension: bare item tokens (lean path)
    ],
)
def test_transformer_options(feat_builds, feat_frames, opts):
    """BST option grid (reference transformer.py:88-93): positional mode,
    causal masking, feature-aggregation mode."""
    train_data, *_, data_info = feat_builds
    model = Transformer(
        "ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
        recent_num=5, hidden_units=(16,), **opts,
    )
    model.fit(train_data, neg_sampling=True, verbose=0)
    ptest_preds(model, "ranking", feat_frames)


def test_transformer_invalid_options(feat_builds):
    *_, data_info = feat_builds
    with pytest.raises(ValueError):
        Transformer("ranking", data_info, positional_embedding="learned")
    with pytest.raises(ValueError):
        Transformer("ranking", data_info, feat_agg_mode="sum")


def test_transformer_token_dim_concat(feat_builds):
    """concat mode folds each item sparse/dense field into the token."""
    *_, data_info = feat_builds
    m1 = Transformer("ranking", data_info, embed_size=8, feat_agg_mode="concat")
    m2 = Transformer("ranking", data_info, embed_size=8, feat_agg_mode=None)
    m1.build_model_shell() if hasattr(m1, "build_model_shell") else None
    # token width must grow by embed_size per item feature field
    f_i = len(data_info.item_sparse_col.index) + len(data_info.item_dense_col.index)
    assert m2.token_dim == 8
    if f_i:
        assert m1.token_dim == 8 * (1 + f_i)


@pytest.mark.parametrize("mode", ["concat", "elementwise"])
def test_token_pack_equivalence(feat_builds, mode):
    """The packed all-items token table must reproduce the per-id token
    assembly exactly (same gathers, one hop removed) — train forward,
    predict, and grads route through it when n_items is under the cap."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    train_data, *_, data_info = feat_builds
    m = Transformer("ranking", data_info, embed_size=8, n_epochs=1,
                    batch_size=256, recent_num=5, hidden_units=(16,),
                    feat_agg_mode=mode)
    m.fit(train_data, neg_sampling=True, verbose=0)
    assert m._token_pack_ok()
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, m.n_items + 1, (64, 5))
    )
    packed = m._token_embeds(m.params, ids)
    raw = m._token_embeds_raw(m.params, ids)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(raw))
    # grads agree between the packed and raw routes
    def loss_packed(p):
        return jnp.sum(m._token_embeds(p, ids) ** 2)

    def loss_raw(p):
        return jnp.sum(m._token_embeds_raw(p, ids) ** 2)

    g1 = jax.grad(loss_packed)(m.params)
    g2 = jax.grad(loss_raw)(m.params)
    # the packed route accumulates field grads in per-catalog-row order,
    # the raw route in per-position order — equal up to f32 reassociation
    for k in ("item_embed", "sparse_embed"):
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-4, atol=1e-5
        )


def test_sim_short_max_len_alias(feat_builds):
    """short_max_len (reference sim.py:131) sets the short window."""
    *_, data_info = feat_builds
    m = SIM("ranking", data_info, short_max_len=4, long_max_len=20,
            search_topk=5)
    assert m.max_seq_len == 4


def test_sim_long_history_grad_off(feat_builds, feat_frames, tmp_path):
    """long_history_grad=False (SIM-paper two-stage practice: the GSU/long
    branch reads a frozen token-table view) trains, predicts identically
    at inference structure, and roundtrips through save/load."""
    train_data, *_, data_info = feat_builds
    m = SIM("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
            recent_num=5, long_max_len=10, search_topk=3,
            hidden_units=(16,), long_history_grad=False)
    m.fit(train_data, neg_sampling=True, verbose=0)
    ptest_preds(m, "ranking", feat_frames)
    m.save(str(tmp_path), "sim_nograd")
    loaded = SIM.load(str(tmp_path), "sim_nograd", data_info)
    assert loaded.long_history_grad is False
    np.testing.assert_allclose(
        np.asarray(loaded.predict(user=1, item=2)),
        np.asarray(m.predict(user=1, item=2)), rtol=1e-5,
    )


@pytest.mark.parametrize("mode", ["concat", "elementwise"])
def test_din_feat_agg_tokens(feat_builds, feat_frames, mode):
    """DIN with the reference's feature-augmented attention tokens
    (reference din.py:207 combine_seq_features)."""
    train_data, *_, data_info = feat_builds
    m = DIN("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
            recent_num=5, hidden_units=(16,), feat_agg_mode=mode)
    m.fit(train_data, neg_sampling=True, verbose=0)
    f_i = len(data_info.item_sparse_col.index) + len(data_info.item_dense_col.index)
    if mode == "concat" and f_i:
        assert m.token_dim == 8 * (1 + f_i)
    else:
        assert m.token_dim == 8
    ptest_preds(m, "ranking", feat_frames)


def test_din_feat_agg_sparse_optimizer(feat_builds):
    """feat_agg tokens + touched-rows LazyAdam: seq items' feature rows are
    gradient targets and must be in the touched set."""
    train_data, *_, data_info = feat_builds
    m = DIN("ranking", data_info, embed_size=8, n_epochs=2, batch_size=256,
            recent_num=5, hidden_units=(16,), feat_agg_mode="concat",
            sparse_optimizer=True)
    m.fit(train_data, neg_sampling=True, verbose=0)
    assert np.isfinite(
        np.asarray(m.predict(user=1, item=2, cold_start="average"))
    ).all()


@pytest.mark.parametrize("mode", ["concat", "elementwise"])
def test_sim_feat_agg_tokens(feat_builds, feat_frames, mode):
    """SIM with feature-augmented GSU/ESU/short tokens (reference
    sim.py:198 combine_seq_features)."""
    train_data, *_, data_info = feat_builds
    m = SIM("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
            hidden_units=(16,), long_max_len=20, search_topk=5,
            feat_agg_mode=mode)
    m.fit(train_data, neg_sampling=True, verbose=0)
    ptest_preds(m, "ranking", feat_frames)


def test_transformer_multilayer_paths(feat_builds, feat_frames):
    """2-layer stacks: causal uses the shared-seq fast path, non-causal
    falls back to the broadcast encoder; both train and predict."""
    train_data, *_, data_info = feat_builds
    for opts in ({"use_causal_mask": True}, {"use_causal_mask": False}):
        model = Transformer(
            "ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
            recent_num=5, hidden_units=(16,), num_tfm_layers=2, **opts,
        )
        model.fit(train_data, neg_sampling=True, verbose=0)
        ptest_preds(model, "ranking", feat_frames)


def test_transformer_fast_path_matches_broadcast(feat_builds, monkeypatch):
    """Model-level: scoring through the shared-seq fast encoder equals the
    full broadcast encoder on the same trained params (f32)."""
    train_data, *_, data_info = feat_builds
    model = Transformer(
        "ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
        recent_num=5, hidden_units=(16,), compute_dtype="f32",
    )
    model.fit(train_data, neg_sampling=True, verbose=0)
    users = np.array([0, 1, 2, 3], dtype=np.int32)
    items = np.array([0, 1, 2, 3], dtype=np.int32)
    p_fast = np.asarray(model.predict(users, items, inner_id=True))
    monkeypatch.setattr(
        Transformer, "_encode_fast", Transformer._encode_broadcast
    )
    model._predict_fn = None
    p_slow = np.asarray(model.predict(users, items, inner_id=True))
    np.testing.assert_allclose(p_fast, p_slow, rtol=1e-4, atol=1e-5)


def test_transformer_catalog_scorer_matches_generic(feat_builds, monkeypatch):
    """Full-catalog scoring through _score_catalog (shared seq K/V across
    items) equals the generic per-pair loop."""
    import jax.numpy as jnp

    train_data, *_, data_info = feat_builds
    model = Transformer(
        "ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
        recent_num=5, hidden_units=(16,), compute_dtype="f32",
    )
    model.fit(train_data, neg_sampling=True, verbose=0)
    model._ensure_inference_fns()
    users = jnp.asarray([0, 1, 2], dtype=jnp.int32)
    fast = np.asarray(model._recommend_fn(model.params, users, 3))
    monkeypatch.delattr(Transformer, "_score_catalog")
    model._recommend_fn = None
    model._ensure_inference_fns()
    slow = np.asarray(model._recommend_fn(model.params, users, 3))
    assert fast.shape == slow.shape == (3, model.n_items)
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)


def test_din_catalog_scorer_matches_generic(feat_builds, monkeypatch):
    import jax.numpy as jnp

    train_data, *_, data_info = feat_builds
    model = DIN(
        "ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
        recent_num=5, hidden_units=(16,),
    )
    model.fit(train_data, neg_sampling=True, verbose=0)
    model._ensure_inference_fns()
    users = jnp.asarray([0, 1, 2], dtype=jnp.int32)
    fast = np.asarray(model._recommend_fn(model.params, users, 3))
    monkeypatch.delattr(DIN, "_score_catalog")
    model._recommend_fn = None
    model._ensure_inference_fns()
    slow = np.asarray(model._recommend_fn(model.params, users, 3))
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)


def test_ytb_ranking_catalog_scorer_matches_generic(feat_builds, monkeypatch):
    import jax.numpy as jnp

    train_data, *_, data_info = feat_builds
    model = YouTubeRanking(
        "ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
        recent_num=5, hidden_units=(16,),
    )
    model.fit(train_data, neg_sampling=True, verbose=0)
    model._ensure_inference_fns()
    users = jnp.asarray([0, 1, 2], dtype=jnp.int32)
    fast = np.asarray(model._recommend_fn(model.params, users, 3))
    monkeypatch.delattr(YouTubeRanking, "_score_catalog")
    model._recommend_fn = None
    model._ensure_inference_fns()
    slow = np.asarray(model._recommend_fn(model.params, users, 3))
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)


def test_sim_catalog_scorer_matches_generic(feat_builds, monkeypatch):
    import jax.numpy as jnp

    train_data, *_, data_info = feat_builds
    model = SIM(
        "ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
        recent_num=4, long_max_len=12, search_topk=3, hidden_units=(16,),
    )
    model.fit(train_data, neg_sampling=True, verbose=0)
    model._ensure_inference_fns()
    users = jnp.asarray([0, 1, 2], dtype=jnp.int32)
    fast = np.asarray(model._recommend_fn(model.params, users, 3))
    monkeypatch.delattr(SIM, "_score_catalog")
    model._recommend_fn = None
    model._ensure_inference_fns()
    slow = np.asarray(model._recommend_fn(model.params, users, 3))
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)

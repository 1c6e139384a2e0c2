"""Retrain flows: save -> merge_trainset -> rebuild_model -> refit ->
prediction consistency (mirrors the reference's tests/retrain/)."""
import numpy as np
import pandas as pd
import pytest

from librecommender_tpu.data import DatasetFeat, DatasetPure
from librecommender_tpu.models import BPR, FM, SVD, LightGCN, UserCF

from tests.conftest import make_feat_interactions, make_interactions


def _new_data(frame, n_new_users=5, n_new_items=8, seed=7):
    """Second-period data: some old users/items + genuinely new ids."""
    rng = np.random.default_rng(seed)
    extra = frame.sample(frac=0.3, random_state=seed).copy()
    new_users = rng.integers(5000, 5000 + n_new_users, len(extra) // 2)
    extra.iloc[: len(new_users), extra.columns.get_loc("user")] = new_users
    new_items = rng.integers(9000, 9000 + n_new_items, len(extra) // 3)
    extra.iloc[: len(new_items), extra.columns.get_loc("item")] = new_items
    return extra.drop_duplicates(subset=["user", "item"]).reset_index(drop=True)


@pytest.mark.parametrize("cls", [SVD, BPR, LightGCN])
def test_pure_retrain_flow(cls, tmp_path):
    frame = make_interactions()
    train_data, data_info = DatasetPure.build_trainset(frame)
    model = cls("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = str(tmp_path / "retrain")
    model.save(path, cls.__name__)

    new_frame = _new_data(frame)
    new_train, new_info = DatasetPure.merge_trainset(new_frame, data_info)
    assert new_info.old_info is not None
    assert new_info.n_users > data_info.n_users
    assert new_info.n_items > data_info.n_items

    model2 = cls("ranking", new_info, embed_size=8, n_epochs=1, batch_size=256)
    model2.rebuild_model(path, cls.__name__)
    # old user rows must have been grafted
    old_u = np.asarray(model.params["user_embed"])[: data_info.n_users]
    new_u = np.asarray(model2.params["user_embed"])[: data_info.n_users]
    np.testing.assert_allclose(old_u, new_u, rtol=1e-6)
    model2.fit(new_train, neg_sampling=True, verbose=0)
    # old and new users both get recommendations
    old_user = frame.user.iloc[0]
    new_user = new_frame.user.iloc[0]
    recs = model2.recommend_user(user=[old_user, new_user], n_rec=5)
    assert len(recs[old_user]) == 5 and len(recs[new_user]) == 5


def test_feat_retrain_flow(tmp_path):
    frame = make_feat_interactions()
    train_data, data_info = DatasetFeat.build_trainset(
        frame,
        user_col=["sex", "age"],
        item_col=["genre"],
        sparse_col=["sex", "genre"],
        dense_col=["age"],
    )
    model = FM("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = str(tmp_path / "retrain_feat")
    model.save(path, "FM")

    new_frame = _new_data(frame)
    new_frame["genre"] = new_frame["genre"].astype(object)
    # introduce a brand-new sparse value -> sparse vocab grows
    new_frame.iloc[:10, new_frame.columns.get_loc("genre")] = "e"
    new_train, new_info = DatasetFeat.merge_trainset(new_frame, data_info)
    sp_old = data_info.sparse_offset
    sp_new = new_info.sparse_offset
    assert sp_new[-1] >= sp_old[-1]

    model2 = FM("ranking", new_info, embed_size=8, n_epochs=1, batch_size=256)
    model2.rebuild_model(path, "FM")
    # per-field sparse blocks moved to the new offsets
    old_sp = np.asarray(model.params["sparse_embed"])
    new_sp = np.asarray(model2.params["sparse_embed"])
    old_layout_off = 0
    for col_idx, length in enumerate(new_info.old_info.sparse_len):
        if length == -1:
            continue
        n_off = int(new_info.sparse_offset[col_idx])
        np.testing.assert_allclose(
            old_sp[old_layout_off : old_layout_off + length],
            new_sp[n_off : n_off + length],
            rtol=1e-6,
        )
        old_layout_off += length + 1
    model2.fit(new_train, neg_sampling=True, verbose=0)
    recs = model2.recommend_user(user=frame.user.iloc[0], n_rec=5)
    assert len(recs[frame.user.iloc[0]]) == 5


def test_i2i_retrain_flow(tmp_path):
    """i2i sage models rebuild with enlarged vocab: grafted rows, fresh
    walk tables for the merged graph, and a full refit."""
    from librecommender_tpu.models import GraphSage

    frame = make_interactions()
    train_data, data_info = DatasetPure.build_trainset(frame)
    model = GraphSage("ranking", data_info, embed_size=8, n_epochs=1,
                      batch_size=128, paradigm="i2i", num_walks=2,
                      sample_walk_len=2)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = str(tmp_path / "retrain_i2i")
    model.save(path, "GraphSage")

    new_frame = _new_data(frame)
    new_train, new_info = DatasetPure.merge_trainset(new_frame, data_info)
    model2 = GraphSage("ranking", new_info, embed_size=8, n_epochs=1,
                       batch_size=128, paradigm="i2i", num_walks=2,
                       sample_walk_len=2)
    model2.rebuild_model(path, "GraphSage")
    old_i = np.asarray(model.params["item_embed"])[: data_info.n_items]
    new_i = np.asarray(model2.params["item_embed"])[: data_info.n_items]
    np.testing.assert_allclose(old_i, new_i, rtol=1e-6)
    model2.fit(new_train, neg_sampling=True, verbose=0)
    # walk tables cover the merged vocab
    assert model2.item_nbr.shape[0] == new_info.n_items
    old_user = frame.user.iloc[0]
    new_user = new_frame.user.iloc[0]
    recs = model2.recommend_user(user=[old_user, new_user], n_rec=5)
    assert len(recs[old_user]) == 5 and len(recs[new_user]) == 5


def test_cf_retrain_flow(tmp_path):
    frame = make_interactions()
    train_data, data_info = DatasetPure.build_trainset(frame)
    model = UserCF("ranking", data_info, k_sim=10)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = str(tmp_path / "retrain_cf")
    model.save(path, "UserCF")

    new_frame = _new_data(frame)
    new_train, new_info = DatasetPure.merge_trainset(new_frame, data_info)
    model2 = UserCF("ranking", new_info, k_sim=10)
    model2.fit(new_train, neg_sampling=True, verbose=0)
    recs = model2.recommend_user(user=new_frame.user.iloc[0], n_rec=5)
    assert len(recs[new_frame.user.iloc[0]]) == 5


def test_optimizer_state_grafted(tmp_path):
    """Adam mu/nu for old rows survive the rebuild."""
    frame = make_interactions()
    train_data, data_info = DatasetPure.build_trainset(frame)
    model = SVD("ranking", data_info, embed_size=8, n_epochs=2, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = str(tmp_path / "opt_graft")
    model.save(path, "SVD")
    old_mu = np.asarray(
        model.trainer.opt_state[0].mu["user_embed"]
    )[: data_info.n_users]
    assert np.any(old_mu != 0)

    new_frame = _new_data(frame)
    new_train, new_info = DatasetPure.merge_trainset(new_frame, data_info)
    model2 = SVD("ranking", new_info, embed_size=8, n_epochs=1, batch_size=256)
    model2.rebuild_model(path, "SVD")
    assert model2._initial_opt_state is not None


def test_checkpoint_resume(tmp_path):
    """Mid-training checkpoints restore params + optimizer state."""
    frame = make_interactions()
    train_data, data_info = DatasetPure.build_trainset(frame)
    ckpt = str(tmp_path / "ckpt")
    model = SVD("ranking", data_info, embed_size=8, n_epochs=3, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0, checkpoint_dir=ckpt)

    model2 = SVD("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    epoch = model2.load_checkpoint(ckpt)
    assert epoch == 3
    np.testing.assert_allclose(
        np.asarray(model.params["user_embed"]),
        np.asarray(model2.params["user_embed"]),
    )
    # continues training with restored optimizer state
    model2.fit(train_data, neg_sampling=True, verbose=0)
    assert model2.user_embeds_np is not None


@pytest.mark.parametrize("cls_name", ["DIN", "TwoTower", "RNN4Rec"])
def test_seq_and_tower_retrain(cls_name, tmp_path):
    """Retrain flows for sequence/tower families (reference tests/retrain/
    test_two_tower_retrain.py etc.)."""
    from librecommender_tpu.models import DIN, RNN4Rec, TwoTower

    cls = {"DIN": DIN, "TwoTower": TwoTower, "RNN4Rec": RNN4Rec}[cls_name]
    frame = make_feat_interactions()
    train_data, data_info = DatasetFeat.build_trainset(
        frame, user_col=["sex", "age"], item_col=["genre"],
        sparse_col=["sex", "genre"], dense_col=["age"],
    )
    kwargs = dict(embed_size=8, n_epochs=1, batch_size=256)
    if cls is TwoTower:
        model = cls("ranking", data_info, loss_type="softmax",
                    hidden_units=(16,), **kwargs)
        neg = False
    elif cls is DIN:
        model = cls("ranking", data_info, recent_num=5,
                    hidden_units=(16,), **kwargs)
        neg = True
    else:
        model = cls("ranking", data_info, **kwargs)
        neg = True
    model.fit(train_data, neg_sampling=neg, verbose=0)
    path = str(tmp_path / f"retrain_{cls_name}")
    model.save(path, cls_name)

    new_frame = _new_data(frame)
    new_frame.loc[new_frame.index[:5], "genre"] = "zz"  # new sparse value
    new_train, new_info = DatasetFeat.merge_trainset(new_frame, data_info)
    model2_kwargs = dict(kwargs)
    if cls is TwoTower:
        model2 = cls("ranking", new_info, loss_type="softmax",
                     hidden_units=(16,), **model2_kwargs)
    elif cls is DIN:
        model2 = cls("ranking", new_info, recent_num=5,
                     hidden_units=(16,), **model2_kwargs)
    else:
        model2 = cls("ranking", new_info, **model2_kwargs)
    model2.rebuild_model(path, cls_name)
    old_rows = np.asarray(model.params["item_embed"])[: data_info.n_items]
    new_rows = np.asarray(model2.params["item_embed"])[: data_info.n_items]
    np.testing.assert_allclose(old_rows, new_rows, rtol=1e-6)
    model2.fit(new_train, neg_sampling=neg, verbose=0)
    u_new = new_frame.user.iloc[0]
    assert len(model2.recommend_user(user=u_new, n_rec=5)[u_new]) == 5


def test_sparse_optimizer_retrain_grafts_moment_rows(tmp_path):
    """LazyAdam table state (mu/nu) must row-graft across vocab growth on
    rebuild, not reset — graft_opt_state's name-aware dict recursion."""
    from librecommender_tpu.models import BPR
    from librecommender_tpu.training.rebuild import graft_opt_state

    frame = make_interactions()
    train_data, data_info = DatasetPure.build_trainset(frame)
    model = BPR("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=256, sparse_optimizer=True)
    model.fit(train_data, neg_sampling=True, verbose=0)
    old_state = model.trainer.opt_state
    old_mu = np.asarray(old_state[1]["mu"]["user_embed"])
    assert np.abs(old_mu).sum() > 0  # training actually built momentum

    new_frame = _new_data(frame)
    new_train, new_info = DatasetPure.merge_trainset(new_frame, data_info)
    model2 = BPR("ranking", new_info, embed_size=8, n_epochs=1,
                 batch_size=256, sparse_optimizer=True)
    model2.build_model()
    import optax

    from librecommender_tpu.training.sparse_optim import init_table_state

    tables = tuple(model2.sparse_tables)
    rest = {k: v for k, v in model2.params.items() if k not in tables}
    fresh = (optax.adam(1e-3).init(rest),
             init_table_state(model2.params, tables))
    grafted = graft_opt_state(old_state, fresh, model2.params, new_info)
    new_mu = np.asarray(grafted[1]["mu"]["user_embed"])
    # old users' momentum rows carried over into the enlarged table
    np.testing.assert_allclose(
        new_mu[: data_info.n_users], old_mu[: data_info.n_users], rtol=1e-6
    )
    # the full retrain path also runs end to end
    path = str(tmp_path / "sparse_retrain")
    model.save(path, "BPR")
    model3 = BPR("ranking", new_info, embed_size=8, n_epochs=1,
                 batch_size=256, sparse_optimizer=True)
    model3.rebuild_model(path, "BPR")
    model3.fit(new_train, neg_sampling=True, verbose=0)


def test_retrain_grafting_under_mesh(tmp_path):
    """Save -> merge_trainset (vocab growth) -> rebuild_model -> refit, all
    UNDER the device mesh: old rows (and LazyAdam moments) reshard into the
    enlarged row-sharded tables (SURVEY 'hard parts': retrain row-grafting
    with sharded tables)."""
    import numpy as np
    import pandas as pd

    from librecommender_tpu.data import DatasetPure
    from librecommender_tpu.models import BPR
    from librecommender_tpu.parallel import build_mesh

    def frame(n, seed, u_off=0, i_off=0):
        r = np.random.default_rng(seed)
        return pd.DataFrame({
            "user": r.integers(0, 60, n) + u_off,
            "item": r.integers(0, 90, n) + i_off,
            "label": np.ones(n),
        }).drop_duplicates(subset=["user", "item"])

    train, di = DatasetPure.build_trainset(frame(2000, 0))
    mesh = build_mesh(model_parallel=2)
    m = BPR("ranking", di, embed_size=16, n_epochs=2, batch_size=512, seed=1)
    m.fit(train, neg_sampling=True, verbose=0, mesh=mesh)
    m.save(str(tmp_path), "bpr")

    new = frame(1500, 9, u_off=30, i_off=50)  # overlap + new ids
    train2, di2 = DatasetPure.merge_trainset(new, di)
    m2 = BPR("ranking", di2, embed_size=16, n_epochs=2, batch_size=512, seed=1)
    m2.rebuild_model(str(tmp_path), "bpr")
    m2.fit(train2, neg_sampling=True, verbose=0, mesh=mesh)
    u = int(new.user.iloc[0])
    recs = m2.recommend_user(user=u, n_rec=5)
    assert len(recs[u]) == 5


@pytest.mark.parametrize("cls_name", ["ALS", "Item2Vec", "DeepWalk", "Swing"])
def test_embed_family_retrain_flow(cls_name, tmp_path):
    """Reference retrain coverage for the ALS / gensim families
    (tests/retrain/test_als_retrain.py, test_gensim_model_retrain.py):
    save -> merge_trainset (vocab growth) -> rebuild_model -> refit ->
    recommendations for both old and new users."""
    from librecommender_tpu.models import ALS, DeepWalk, Item2Vec, Swing

    cls = {"ALS": ALS, "Item2Vec": Item2Vec, "DeepWalk": DeepWalk,
           "Swing": Swing}[cls_name]
    kw = dict(top_k=10) if cls_name == "Swing" else dict(embed_size=8, n_epochs=1)
    frame = make_interactions()
    train_data, data_info = DatasetPure.build_trainset(frame)
    model = cls("ranking", data_info, **kw)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = str(tmp_path / "retrain_embed")
    model.save(path, cls_name)

    new_frame = _new_data(frame)
    new_train, new_info = DatasetPure.merge_trainset(new_frame, data_info)
    model2 = cls("ranking", new_info, **kw)
    model2.rebuild_model(path, cls_name)
    model2.fit(new_train, neg_sampling=True, verbose=0)
    old_user = frame.user.iloc[0]
    new_user = new_frame.user.iloc[0]
    recs = model2.recommend_user(user=[old_user, new_user], n_rec=5)
    assert len(recs[old_user]) == 5 and len(recs[new_user]) == 5

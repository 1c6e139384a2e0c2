"""Zoo-wide export + native-runtime parity matrix.

Every algorithm class in the registry (tests/models/test_all_grids.SPEC,
kept in sync with ``models.__all__`` by assertion) is driven through its
serving export path and checked for golden score parity, so no model can
silently fall out of the serving story:

- FeatBase CTR/seq family      -> save_exported/load_exported (AOT
  StableHLO) predict + score_all parity, PLUS the C++ jaxpr interpreter
  executing the serialized score_all program (native-server scoring path).
- DynEmbedBase family          -> save_exported (dyn) user-tower parity,
  PLUS the interpreter executing the user_repr program.
- EmbedBase family             -> save_embed npz artifact reproduces the
  model's own recommend_user ranking from flat arrays alone.
- Neighborhood CF family       -> save_knn artifact carries loadable,
  in-range top-k sim lists + the CSR interaction matrix (the knn server's
  entire input contract).

Reference analog: libserving/serialization tests cover one model per
family (tests/serving/test_serialization.py); here the whole zoo is the
parametrization so additions to ``models.__all__`` fail loudly until
they are classified below.
"""
import json
import subprocess

import numpy as np
import pytest

import librecommender_tpu.models as M
from librecommender_tpu.serving import (
    load_exported,
    load_exported_dyn,
    save_exported,
)
from librecommender_tpu.serving.serialization import save_embed, save_knn

from ..models.test_all_grids import SPEC, _fit_kwargs, _make

# serving path per class; every SPEC entry must be classified
AOT_FEAT = {
    "FM", "DeepFM", "WideDeep", "AutoInt", "NCF", "YouTubeRanking",
    "DIN", "Transformer", "SIM",
}
AOT_DYN = {"RNN4Rec", "Caser", "WaveNet", "YouTubeRetrieval"}
EMBED = {
    "SVD", "SVDpp", "BPR", "ALS", "LightGCN", "NGCF", "GraphSage",
    "PinSage", "GraphSageDGL", "PinSageDGL", "TwoTower", "Item2Vec",
    "DeepWalk",
}
KNN = {"UserCF", "ItemCF", "RsUserCF", "RsItemCF", "Swing"}

_classified = AOT_FEAT | AOT_DYN | EMBED | KNN
assert _classified == set(SPEC), (
    "export zoo out of sync with the model registry: "
    f"{_classified ^ set(SPEC)}"
)


def _fit(name, pure_builds, feat_builds):
    builds = pure_builds if SPEC[name][0] == "pure" else feat_builds
    train_data, *_, data_info = builds
    # f32 compute so exported/interpreted programs match the model within
    # float tolerance (the bf16 fast path reorders rounding; same knob as
    # tests/serving/test_export_model.py)
    over = {"compute_dtype": "f32"} if name == "Transformer" else {}
    model = _make(name, "ranking", data_info, **over)
    model.fit(train_data, verbose=0, **_fit_kwargs(name))
    return model, data_info


def _interp_scores(tmp_path, name, fn, *inputs):
    """Serialize `fn` to a native program, execute it with the C++
    interpreter CLI, return the f32 outputs (native-server scoring path)."""
    from librecommender_tpu.serving.native_program import save_program
    from librecommender_tpu.serving.native_server import build_interp_cli

    save_program(tmp_path, name, fn, *inputs)
    io_dir = tmp_path / f"{name}_io"
    io_dir.mkdir(exist_ok=True)
    for k, a in enumerate(inputs):
        arr = np.asarray(a)
        arr = arr.astype(np.float32 if arr.dtype.kind == "f" else np.int32)
        arr.tofile(io_dir / f"input_{k}.bin")
    cli = build_interp_cli()
    res = subprocess.run(
        [str(cli), str(tmp_path / f"{name}.program.json"),
         str(tmp_path / f"{name}.blob.bin"), str(io_dir)],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr
    meta = json.loads((io_dir / "outputs.json").read_text())
    return [
        np.fromfile(
            io_dir / f"output_{k}.bin",
            dtype=np.float32 if m["dtype"] == "f32" else np.int64,
        ).reshape(m["shape"])
        for k, m in enumerate(meta)
    ]


def _check_aot_feat(model, data_info, tmp_path):
    save_exported(tmp_path, "zoo", model)
    scorer = load_exported(tmp_path, "zoo")
    users = np.array([0, 1, 2], np.int32)
    items = np.array([3, 1, 0], np.int32)
    got = scorer.predict(users, items)
    want = model.predict(users, items, inner_id=True)
    np.testing.assert_allclose(got, np.asarray(want).reshape(-1), rtol=1e-4,
                               atol=1e-5)
    scores = scorer.score_all(users[:2])
    model._ensure_inference_fns()
    want_all = np.asarray(model._recommend_fn(model.params, users[:2], 2))
    np.testing.assert_allclose(scores, want_all, rtol=1e-4, atol=1e-5)

    # the C++ interpreter executes the same catalog scorer
    params = model.params
    if hasattr(model, "_score_catalog"):
        fn = lambda u: model._score_catalog(params, u, 1)  # noqa: E731
    else:
        fn = lambda u: model._recommend_fn.__wrapped__(params, u, 1)  # noqa: E731
    u1 = np.array([1], np.int32)
    native = _interp_scores(tmp_path, "zoo_native", fn, u1)[0]
    np.testing.assert_allclose(
        native, np.asarray(fn(u1), np.float32), rtol=2e-4, atol=2e-5
    )


def _check_aot_dyn(model, data_info, tmp_path):
    save_exported(tmp_path, "zoo", model)
    scorer = load_exported_dyn(tmp_path, "zoo")
    uid = 1
    got = scorer.user_embedding([uid])
    want = model.dyn_user_embedding(uid, inner_id=True)
    d = want.shape[0]
    np.testing.assert_allclose(got[0, :d], want, rtol=1e-4, atol=1e-5)
    scores = scorer.score_all([uid])
    assert scores.shape == (1, data_info.n_items)
    want_scores = model.user_embeds_np[uid] @ model.item_embeds_np[
        : data_info.n_items].T
    np.testing.assert_allclose(scores[0], want_scores, rtol=1e-3, atol=1e-4)

    # interpreter path over the user tower program
    model._ensure_repr_fn()
    params = model.params
    seq = np.asarray(model.recent_seq_table)[uid][None, :].astype(np.int32)
    fn = lambda u, s: model._user_repr(params, u, s, False, None)  # noqa: E731
    u1 = np.array([uid], np.int32)
    native = _interp_scores(tmp_path, "zoo_native", fn, u1, seq)[0]
    np.testing.assert_allclose(
        native, np.asarray(fn(u1, seq), np.float32), rtol=2e-4, atol=2e-5
    )


def _check_embed(model, data_info, tmp_path):
    art = save_embed(tmp_path, model)
    with np.load(art / "embeddings.npz") as z:
        ue, ie = z["user_embed"], z["item_embed"]
    raw_user = list(data_info.user2id)[0]
    uid = data_info.user2id[raw_user]
    scores = ue[uid] @ ie[: data_info.n_items].T
    recs = model.recommend_user(user=raw_user, n_rec=5,
                                filter_consumed=False)[raw_user]
    rec_inner = np.array([data_info.item2id[i] for i in recs])
    # tie-robust: the recommended items carry the top-|recs| artifact scores
    top = np.sort(scores)[-len(rec_inner):]
    np.testing.assert_allclose(
        np.sort(scores[rec_inner]), top, rtol=1e-4, atol=1e-5
    )


def _check_knn(model, data_info, tmp_path):
    art = save_knn(tmp_path, model, k_sim=10)
    with np.load(art / "knn_sims.npz") as z:
        sim_ids, sim_vals = z["sim_ids"], z["sim_vals"]
        cf_mode = str(z["cf_mode"][0])
    n_rows = data_info.n_users if cf_mode == "user" else data_info.n_items
    assert sim_ids.shape == sim_vals.shape == (n_rows, 10)
    assert sim_ids.max() < n_rows
    valid = sim_ids >= 0
    assert np.isfinite(sim_vals[valid]).all()
    with np.load(art / "interaction.npz") as z:
        indptr = z["indptr"]
        assert len(z["data"]) == len(z["indices"]) == indptr[-1]


@pytest.mark.parametrize("name", sorted(SPEC))
def test_export_zoo(name, pure_builds, feat_builds, tmp_path):
    model, data_info = _fit(name, pure_builds, feat_builds)
    if name in AOT_FEAT:
        _check_aot_feat(model, data_info, tmp_path)
    elif name in AOT_DYN:
        _check_aot_dyn(model, data_info, tmp_path)
    elif name in EMBED:
        _check_embed(model, data_info, tmp_path)
    else:
        _check_knn(model, data_info, tmp_path)

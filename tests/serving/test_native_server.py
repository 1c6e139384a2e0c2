"""Native C++ server tests: build, launch, parity with the Python tier
(mirrors the reference's actix integration tests)."""
import json
import urllib.request

import numpy as np
import pytest

from librecommender_tpu.models import BPR, ItemCF
from librecommender_tpu.serving.native_server import (
    export_native,
    start_native_server,
)


def _post(port, url, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{url}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return json.loads(resp.read())


def test_native_embed_server(pure_builds, pure_frames, tmp_path):
    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    artifact_dir = export_native(tmp_path / "native_embed", model)
    proc, port = start_native_server(artifact_dir)
    try:
        user = pure_frames[0].user.iloc[0]
        out = _post(port, "/embed/recommend", {"user": int(user), "n_rec": 5})
        recs = model.recommend_user(user=user, n_rec=5)[user]
        assert list(map(int, out["rec_list"])) == list(map(int, recs))
        # cold user falls to the OOV embedding row
        cold = _post(port, "/embed/recommend", {"user": -9999, "n_rec": 5})
        assert len(cold["rec_list"]) == 5
        # deep request: n_rec + |consumed| > n_items -> reference's
        # can't-filter passthrough (unfiltered top-k, ranking.py:38)
        deep = data_info.n_items - 3
        out_deep = _post(port, "/embed/recommend",
                         {"user": int(user), "n_rec": deep})
        recs_deep = model.recommend_user(user=user, n_rec=deep)[user]
        assert list(map(int, out_deep["rec_list"])) == list(map(int, recs_deep))
    finally:
        proc.kill()
        proc.wait()


def test_native_knn_server(pure_builds, pure_frames, tmp_path):
    train_data, *_, data_info = pure_builds
    model = ItemCF("ranking", data_info, k_sim=10)
    model.fit(train_data, neg_sampling=True, verbose=0)
    artifact_dir = export_native(tmp_path / "native_knn", model)
    proc, port = start_native_server(artifact_dir)
    try:
        user = pure_frames[0].user.iloc[0]
        out = _post(port, "/knn/recommend", {"user": int(user), "n_rec": 5})
        assert 0 < len(out["rec_list"]) <= 5
        recs = model.recommend_user(user=user, n_rec=5)[user]
        assert set(map(int, out["rec_list"])) <= set(map(int, recs)) | set(
            map(int, out["rec_list"])
        )
        # items must not include consumed
        uid = data_info.user2id[user]
        consumed_raw = {
            int(data_info.id2item[i]) for i in data_info.user_consumed[uid]
        }
        assert not (set(map(int, out["rec_list"])) & consumed_raw)
        # deep request: can't-filter passthrough means consumed items are
        # no longer demoted — they dominate their own similarity-derived
        # scores, so they must surface in the FRONT half of the deep list
        # (with demotion they would all sit at the very tail)
        deep = data_info.n_items - 3
        out_deep = _post(port, "/knn/recommend",
                         {"user": int(user), "n_rec": deep})
        front = set(map(int, out_deep["rec_list"][: deep // 2]))
        assert front & consumed_raw
    finally:
        proc.kill()
        proc.wait()


def test_native_model_online_endpoints(pure_builds, pure_frames, tmp_path):
    """Native /model/recommend and /online/recommend execute the exported
    scoring program IN-PROCESS (jaxpr_interp) — the Python backend is NOT
    running — and match direct model calls (dyn-embed family: GRU user
    tower via the native scan)."""
    from librecommender_tpu.models import RNN4Rec

    train_data, *_, data_info = pure_builds
    model = RNN4Rec("ranking", data_info, embed_size=8, n_epochs=1,
                    batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)

    artifact_dir = export_native(tmp_path / "native_online", model)
    proc, port = start_native_server(artifact_dir)  # no backend configured
    try:
        frame = pure_frames[0]
        user = frame.user.iloc[0]
        out = _post(port, "/model/recommend", {"user": int(user), "n_rec": 5})
        recs = model.recommend_user(user=user, n_rec=5)[user]
        assert list(map(int, out["rec_list"])) == list(map(int, recs))

        seq = [int(i) for i in frame.item.iloc[:5]]
        out_dyn = _post(
            port, "/online/recommend",
            {"user": int(user), "n_rec": 5, "seq": seq},
        )
        recs_dyn = model.recommend_user(user=user, n_rec=5, seq=seq)[user]
        assert list(map(int, out_dyn["rec_list"])) == list(map(int, recs_dyn))

        # consumed filtering happens natively
        uid = data_info.user2id[user]
        consumed_raw = {
            int(data_info.id2item[i]) for i in data_info.user_consumed[uid]
        }
        assert not (set(map(int, out["rec_list"])) & consumed_raw)

        # cold user with a request seq still serves
        cold = _post(port, "/online/recommend",
                     {"user": -4242, "n_rec": 5, "seq": seq})
        assert len(cold["rec_list"]) == 5
    finally:
        proc.kill()
        proc.wait()


def test_native_feat_model_online(feat_builds, feat_frames, tmp_path):
    """Feat/seq family (DIN) model + online endpoints natively: request-time
    user_feats and seq overrides assembled in C++ match
    model.recommend_user with the same overrides. No Python backend."""
    from librecommender_tpu.models import DIN

    train_data, *_, data_info = feat_builds
    model = DIN("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=256, recent_num=5)
    model.fit(train_data, neg_sampling=True, verbose=0)

    artifact_dir = export_native(tmp_path / "native_din", model)
    proc, port = start_native_server(artifact_dir)
    try:
        frame = feat_frames[0]
        user = frame.user.iloc[0]
        # model family: static full-catalog scoring
        out = _post(port, "/model/recommend", {"user": int(user), "n_rec": 5})
        recs = model.recommend_user(user=user, n_rec=5)[user]
        assert list(map(int, out["rec_list"])) == list(map(int, recs))

        # online family: dynamic seq + user_feats
        seq = [int(i) for i in frame.item.iloc[:4]]
        feats = {"sex": str(frame.sex.iloc[1]), "age": 0.25}
        out_dyn = _post(
            port, "/online/recommend",
            {"user": int(user), "n_rec": 5, "seq": seq, "user_feats": feats},
        )
        recs_dyn = model.recommend_user(
            user=user, n_rec=5, seq=seq, user_feats=feats
        )[user]
        assert list(map(int, out_dyn["rec_list"])) == list(map(int, recs_dyn))

        # online with feats only (stored history used)
        out_f = _post(port, "/online/recommend",
                      {"user": int(user), "n_rec": 5, "user_feats": feats})
        recs_f = model.recommend_user(user=user, n_rec=5,
                                      user_feats=feats)[user]
        assert list(map(int, out_f["rec_list"])) == list(map(int, recs_f))
    finally:
        proc.kill()
        proc.wait()


def test_native_tiled_scoring(feat_builds, feat_frames, tmp_path):
    """Tiled catalog execution (tile_size < n_items forces multiple tiles
    through the TilePool) returns the SAME recommendations as the model
    for /model and /online — large-catalog path parity."""
    from librecommender_tpu.models import DIN

    train_data, *_, data_info = feat_builds
    model = DIN("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=256, recent_num=5)
    model.fit(train_data, neg_sampling=True, verbose=0)

    artifact_dir = export_native(tmp_path / "native_tiled", model,
                                 tile_size=16)
    meta = json.loads(
        (artifact_dir / "runtime_meta.json").read_text())
    assert meta["tile"] == 16 and data_info.n_items > 16
    proc, port = start_native_server(artifact_dir)
    try:
        frame = feat_frames[0]
        user = frame.user.iloc[0]
        out = _post(port, "/model/recommend", {"user": int(user), "n_rec": 7})
        recs = model.recommend_user(user=user, n_rec=7)[user]
        assert list(map(int, out["rec_list"])) == list(map(int, recs))

        seq = [int(i) for i in frame.item.iloc[:4]]
        feats = {"sex": str(frame.sex.iloc[1]), "age": 0.25}
        out_dyn = _post(
            port, "/online/recommend",
            {"user": int(user), "n_rec": 7, "seq": seq, "user_feats": feats},
        )
        recs_dyn = model.recommend_user(
            user=user, n_rec=7, seq=seq, user_feats=feats
        )[user]
        assert list(map(int, out_dyn["rec_list"])) == list(map(int, recs_dyn))

        # deep request: n_rec + |consumed| > n_items triggers the
        # reference's can't-filter passthrough (unfiltered top-k,
        # ranking.py:38) — server and model must agree on it
        deep = data_info.n_items - 3
        out_deep = _post(port, "/model/recommend",
                         {"user": int(user), "n_rec": deep})
        recs_deep = model.recommend_user(user=user, n_rec=deep)[user]
        assert list(map(int, out_deep["rec_list"])) == list(map(int, recs_deep))
    finally:
        proc.kill()
        proc.wait()


def test_native_dyn_request_coalescing(pure_builds, pure_frames, tmp_path):
    """Concurrent /online requests on a dyn-family model coalesce into
    batched tower executions (user_repr_b) — every response must still
    match the model's answer for ITS user/seq (no cross-request bleed)."""
    import concurrent.futures

    from librecommender_tpu.models import RNN4Rec

    train_data, *_, data_info = pure_builds
    model = RNN4Rec("ranking", data_info, embed_size=8, n_epochs=1,
                    batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)

    artifact_dir = export_native(tmp_path / "native_coalesce", model)
    assert (artifact_dir / "user_repr_b.program.json").exists()
    proc, port = start_native_server(artifact_dir)
    try:
        frame = pure_frames[0]
        users = [int(u) for u in frame.user.unique()[:12]]
        seqs = {u: [int(i) for i in frame.item.iloc[k : k + 4]]
                for k, u in enumerate(users)}
        want = {
            u: list(map(int, model.recommend_user(
                user=u, n_rec=5, seq=seqs[u])[u]))
            for u in users
        }

        def hit(u):
            out = _post(port, "/online/recommend",
                        {"user": u, "n_rec": 5, "seq": seqs[u]})
            return u, list(map(int, out["rec_list"]))

        with concurrent.futures.ThreadPoolExecutor(max_workers=12) as pool:
            for u, got in pool.map(hit, users * 4):
                assert got == want[u], (u, got, want[u])
    finally:
        proc.kill()
        proc.wait()


def test_native_benchmark_client(pure_builds, tmp_path):
    """The C++ load generator round-trips keep-alive requests without
    failures and reports sane latency stats."""
    import subprocess

    from librecommender_tpu.serving.native_server import build_benchmark

    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    artifact_dir = export_native(tmp_path / "native_bench", model)
    proc, port = start_native_server(artifact_dir)
    try:
        bench_bin = build_benchmark()
        out = subprocess.run(
            [str(bench_bin), "127.0.0.1", str(port), "/embed/recommend",
             "2", "300", str(data_info.n_users)],
            capture_output=True, text=True, timeout=60,
        )
        stats = json.loads(out.stdout)
        assert stats["n_fail"] == 0 and stats["n_ok"] >= 299
        assert stats["req_per_s"] > 100
    finally:
        proc.kill()
        proc.wait()


def test_native_keepalive_and_pipelining(pure_builds, tmp_path):
    """Two sequential requests on ONE connection (keep-alive), then a
    Connection: close request is honored."""
    import http.client

    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    artifact_dir = export_native(tmp_path / "native_ka", model)
    proc, port = start_native_server(artifact_dir)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        for _ in range(2):
            conn.request("POST", "/embed/recommend",
                         body=json.dumps({"user": 1, "n_rec": 3}),
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            assert resp.status == 200
            assert resp.headers["Connection"] == "keep-alive"
            assert len(json.loads(resp.read())["rec_list"]) == 3
        conn.request("POST", "/embed/recommend",
                     body=json.dumps({"user": 1, "n_rec": 3}),
                     headers={"Content-Type": "application/json",
                              "Connection": "close"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.headers["Connection"] == "close"
        conn.close()
    finally:
        proc.kill()
        proc.wait()


def test_native_embed_ivf(pure_builds, pure_frames, tmp_path):
    """IVF-probed embed endpoint matches the Python IVF index search with
    consumed filtering (same exported index, same n_probe)."""
    from librecommender_tpu.retrieval.ivf import IVFIndex

    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    artifact_dir = export_native(
        tmp_path / "native_ivf", model, ivf=True, n_probe=4
    )
    assert (tmp_path / "native_ivf" / "ivf_centroids.bin").exists()
    proc, port = start_native_server(artifact_dir)
    try:
        user = pure_frames[0].user.iloc[0]
        uid = data_info.user2id[user]
        out = _post(port, "/embed/recommend", {"user": int(user), "n_rec": 5})
        index = IVFIndex.build(
            np.asarray(model.item_embeds_np)[: model.n_items],
            seed=model.seed,
        )
        consumed = set(map(int, data_info.user_consumed.get(uid, [])))
        ids, _ = index.search(
            np.asarray(model.user_embeds_np)[uid],
            k=5 + len(consumed), n_probe=4,
        )
        expected = [
            int(data_info.id2item[i]) for i in ids[0]
            if i >= 0 and int(i) not in consumed
        ][:5]
        assert list(map(int, out["rec_list"])) == expected
    finally:
        proc.kill()
        proc.wait()


def test_native_two_tower_online_feats(feat_builds, feat_frames, tmp_path):
    """TwoTower online with request-time user_feats runs natively (the
    user tower executes in-process with C++-assembled override rows) and
    matches the model's dyn recommend. No Python backend."""
    from librecommender_tpu.models import TwoTower

    train_data, *_, data_info = feat_builds
    model = TwoTower("ranking", data_info, embed_size=8, n_epochs=1,
                     batch_size=256, loss_type="softmax",
                     hidden_units=(16,))
    model.fit(train_data, neg_sampling=False, verbose=0)

    artifact_dir = export_native(tmp_path / "native_tt", model)
    proc, port = start_native_server(artifact_dir)
    try:
        frame = feat_frames[0]
        user = frame.user.iloc[0]
        feats = {"sex": str(frame.sex.iloc[1]), "age": 0.75}
        out = _post(port, "/online/recommend",
                    {"user": int(user), "n_rec": 5, "user_feats": feats})
        recs = model.recommend_user(user=user, n_rec=5,
                                    user_feats=feats)[user]
        assert list(map(int, out["rec_list"])) == list(map(int, recs))
        # without overrides the tower reproduces the static embed result
        out_static = _post(port, "/online/recommend",
                           {"user": int(user), "n_rec": 5})
        recs_static = model.recommend_user(user=user, n_rec=5)[user]
        assert (list(map(int, out_static["rec_list"]))
                == list(map(int, recs_static)))
    finally:
        proc.kill()
        proc.wait()


def test_native_online_hardening(feat_builds, feat_frames, tmp_path):
    """Malformed/adversarial online requests never crash the server:
    unknown feature names fall to OOV, wrong-typed feats are ignored,
    oversized seqs truncate to the window, garbage ids cold-start."""
    from librecommender_tpu.models import DIN

    train_data, *_, data_info = feat_builds
    model = DIN("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=256, recent_num=5)
    model.fit(train_data, neg_sampling=True, verbose=0)
    artifact_dir = export_native(tmp_path / "native_hard", model)
    proc, port = start_native_server(artifact_dir)
    try:
        user = int(feat_frames[0].user.iloc[0])
        # unknown feature name + wrong-typed value + unknown raw value
        out = _post(port, "/online/recommend", {
            "user": user, "n_rec": 5,
            "user_feats": {"no_such_col": 1, "sex": 123456,
                           "age": "not-a-number"},
        })
        assert len(out["rec_list"]) == 5
        # oversized seq (10x the window) with unknown items mixed in
        seq = [int(i) for i in feat_frames[0].item.iloc[:40]] + [999999] * 10
        out = _post(port, "/online/recommend",
                    {"user": user, "n_rec": 5, "seq": seq})
        assert len(out["rec_list"]) == 5
        recs = model.recommend_user(user=user, n_rec=5, seq=seq)[user]
        assert list(map(int, out["rec_list"])) == list(map(int, recs))
        # nonsense body fields are ignored; server stays up
        out = _post(port, "/online/recommend",
                    {"user": "not-a-user", "n_rec": 5, "user_feats": []})
        assert len(out["rec_list"]) == 5
        out2 = _post(port, "/model/recommend", {"user": user, "n_rec": 3})
        assert len(out2["rec_list"]) == 3
    finally:
        proc.kill()
        proc.wait()


def test_native_fm_online_no_seq(feat_builds, feat_frames, tmp_path):
    """A seq-less feat model (FM) serves online natively: the override
    program has only feature-row inputs; request seqs are ignored."""
    from librecommender_tpu.models import FM

    train_data, *_, data_info = feat_builds
    model = FM("ranking", data_info, embed_size=8, n_epochs=1,
               batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    artifact_dir = export_native(tmp_path / "native_fm", model)
    proc, port = start_native_server(artifact_dir)
    try:
        user = int(feat_frames[0].user.iloc[0])
        feats = {"sex": str(feat_frames[0].sex.iloc[1])}
        out = _post(port, "/online/recommend",
                    {"user": user, "n_rec": 5, "user_feats": feats})
        recs = model.recommend_user(user=user, n_rec=5,
                                    user_feats=feats)[user]
        assert list(map(int, out["rec_list"])) == list(map(int, recs))
    finally:
        proc.kill()
        proc.wait()

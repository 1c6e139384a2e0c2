"""Serving tests: serialization artifacts + the four aiohttp endpoint
families against a DictStore (mirrors the reference's tests/serving/ with
Redis + sanic subprocesses; here the apps run in-process via
aiohttp.test_utils)."""
import asyncio
import json
from pathlib import Path

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from librecommender_tpu.models import BPR, DIN, ItemCF, RNN4Rec, UserCF
from librecommender_tpu.serving import (
    DictStore,
    embed2store,
    knn2store,
    online2store,
    save_embed,
    save_knn,
    save_online,
)
from librecommender_tpu.serving.app import create_app


def _post(app, url, payload):
    async def go():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.post(url, json=payload)
            assert resp.status == 200, await resp.text()
            return await resp.json()
        finally:
            await client.close()

    return asyncio.run(go())


def test_knn_serving(pure_builds, pure_frames, tmp_path):
    train_data, *_, data_info = pure_builds
    model = UserCF("ranking", data_info, k_sim=10)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = save_knn(tmp_path / "knn", model)
    assert (path / "model_meta.json").exists()
    store = DictStore()
    meta = knn2store(path, store)
    assert meta["model_name"] == "UserCF"
    user = pure_frames[0].user.iloc[0]
    out = _post(create_app("knn", store), "/knn/recommend",
                {"user": int(user), "n_rec": 5})
    assert len(out["rec_list"]) == 5
    # parity with the in-process model
    recs = model.recommend_user(user=user, n_rec=5)[user]
    assert set(map(int, out["rec_list"])) == set(map(int, recs))


def test_embed_serving(pure_builds, pure_frames, tmp_path):
    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = save_embed(tmp_path / "embed", model)
    store = DictStore()
    embed2store(path, store)
    user = pure_frames[0].user.iloc[0]
    out = _post(create_app("embed", store), "/embed/recommend",
                {"user": int(user), "n_rec": 5})
    recs = model.recommend_user(user=user, n_rec=5)[user]
    assert list(map(int, out["rec_list"])) == list(map(int, recs))


def test_model_serving(feat_builds, feat_frames, tmp_path):
    train_data, *_, data_info = feat_builds
    model = DIN("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=256, recent_num=5)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = save_online(tmp_path / "model", model)
    store = DictStore()
    online2store(path, store)
    user = feat_frames[0].user.iloc[0]
    out = _post(create_app("model", store), "/model/recommend",
                {"user": int(user), "n_rec": 5})
    recs = model.recommend_user(user=user, n_rec=5)[user]
    assert list(map(int, out["rec_list"])) == list(map(int, recs))


def test_online_serving_dynamic_seq(pure_builds, pure_frames, tmp_path):
    train_data, *_, data_info = pure_builds
    model = RNN4Rec("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = save_online(tmp_path / "online", model)
    store = DictStore()
    online2store(path, store)
    frame = pure_frames[0]
    user = frame.user.iloc[0]
    seq = [int(i) for i in frame.item.iloc[:5]]
    app = create_app("online", store)
    out = _post(app, "/online/recommend",
                {"user": int(user), "n_rec": 5, "seq": seq})
    assert len(out["rec_list"]) == 5
    # dynamic state must match direct model call
    recs = model.recommend_user(user=user, n_rec=5, seq=seq)[user]
    assert list(map(int, out["rec_list"])) == list(map(int, recs))


def test_item_cf_knn_serving(pure_builds, pure_frames, tmp_path):
    train_data, *_, data_info = pure_builds
    model = ItemCF("ranking", data_info, k_sim=10)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = save_knn(tmp_path / "knn_item", model)
    store = DictStore()
    knn2store(path, store)
    user = pure_frames[0].user.iloc[0]
    out = _post(create_app("knn", store), "/knn/recommend",
                {"user": int(user), "n_rec": 5})
    assert len(out["rec_list"]) == 5


def test_latency_benchmark_tool(pure_builds, pure_frames, tmp_path):
    """The load-test tool runs against a live app and reports percentiles."""
    from librecommender_tpu.serving.benchmark import run_benchmark

    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = save_embed(tmp_path / "bench_embed", model)
    store = DictStore()
    embed2store(path, store)

    async def go():
        from aiohttp.test_utils import TestServer

        server = TestServer(create_app("embed", store))
        await server.start_server()
        try:
            url = str(server.make_url("/embed/recommend"))
            user = int(pure_frames[0].user.iloc[0])
            return await run_benchmark(url, [{"user": user, "n_rec": 5}], 40, 4)
        finally:
            await server.close()

    result = asyncio.run(go())
    assert result["requests"] == 40
    assert result["p95_ms"] > 0


def test_grpc_online_serving(pure_builds, pure_frames):
    """gRPC endpoint parity with direct model calls (reference
    online_deploy_grpc.rs analog)."""
    import socket

    from librecommender_tpu.serving.grpc_server import recommend_client, serve
    from librecommender_tpu.models import RNN4Rec

    train_data, *_, data_info = pure_builds
    model = RNN4Rec("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = serve(model, port=port)
    try:
        frame = pure_frames[0]
        user = int(frame.user.iloc[0])
        out = recommend_client(port, user, n_rec=5)
        recs = model.recommend_user(user=user, n_rec=5)[user]
        assert list(map(int, out["rec_list"])) == list(map(int, recs))
        # dynamic sequence through gRPC
        seq = [int(i) for i in frame.item.iloc[:4]]
        out_seq = recommend_client(port, user, n_rec=5, seq=seq)
        recs_seq = model.recommend_user(user=user, n_rec=5, seq=seq)[user]
        assert list(map(int, out_seq["rec_list"])) == list(map(int, recs_seq))
    finally:
        server.stop(0)


def test_grpc_proto_wire_contract(pure_builds, pure_frames):
    """Binary-protobuf client generated from the reference's
    recommend.proto contract (libserving/actix_serving/proto/
    recommend.proto) talks to the server: same package/service/rpc and
    field numbers over the wire."""
    import socket

    from librecommender_tpu.models import RNN4Rec
    from librecommender_tpu.serving.grpc_server import (
        get_pb2,
        recommend_client_proto,
        serve,
    )

    pb2 = get_pb2()
    # contract assertions: field numbers must match the reference proto
    req_fields = {f.name: f.number for f in pb2.RecRequest.DESCRIPTOR.fields}
    assert req_fields == {"user": 1, "n_rec": 2, "user_feats": 3, "seq": 4}
    assert [f.number for f in pb2.RecResponse.DESCRIPTOR.fields] == [1]
    assert pb2.DESCRIPTOR.package == "recommend"

    train_data, *_, data_info = pure_builds
    model = RNN4Rec("ranking", data_info, embed_size=8, n_epochs=1,
                    batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = serve(model, port=port)
    try:
        frame = pure_frames[0]
        user = int(frame.user.iloc[0])
        resp = recommend_client_proto(port, user, n_rec=5)
        recs = model.recommend_user(user=user, n_rec=5)[user]
        assert list(map(int, resp.items)) == list(map(int, recs))
        seq = [int(i) for i in frame.item.iloc[:4]]
        resp_seq = recommend_client_proto(port, user, n_rec=5, seq=seq)
        recs_seq = model.recommend_user(user=user, n_rec=5, seq=seq)[user]
        assert list(map(int, resp_seq.items)) == list(map(int, recs_seq))
    finally:
        server.stop(0)

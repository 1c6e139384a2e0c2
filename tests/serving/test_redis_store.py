"""RedisStore wire-protocol tests against a real RESP socket server
(tests/serving/fake_resp.FakeRespServer — the in-image stand-in for the
reference's integration Redis, reference tests/serving/conftest.py:29-36).

Covers every command the client emits (PING/SELECT/SET/GET/HSET/HGET/
EXISTS/FLUSHDB), binary-safety/chunked reads, RESP error replies, the
reconnect-once path, artifact hydration (knn2store/embed2store/
online2store), serving through an aiohttp app backed by RedisStore, and
launch.build_store's redis-first selection.
"""
import asyncio
import os

import numpy as np
import pytest

from librecommender_tpu.models import BPR, UserCF
from librecommender_tpu.serving import (
    DictStore,
    embed2store,
    knn2store,
    save_embed,
    save_knn,
)
from librecommender_tpu.serving.app import create_app
from librecommender_tpu.serving.store import RedisStore

from .fake_resp import FakeRespServer


@pytest.fixture()
def resp_server():
    srv = FakeRespServer()
    yield srv
    srv.close()


@pytest.fixture()
def rstore(resp_server):
    return RedisStore(host="127.0.0.1", port=resp_server.port)


def test_protocol_roundtrip(resp_server, rstore):
    assert rstore.ping()
    rstore.set("k", {"a": 1, "b": [1, 2, 3]})
    assert rstore.get("k") == {"a": 1, "b": [1, 2, 3]}
    assert rstore.get("missing") is None
    rstore.hset("h", "f", [1.5, 2.5])
    assert rstore.hget("h", "f") == [1.5, 2.5]
    assert rstore.hget("h", "nope") is None
    assert rstore.hget("noh", "f") is None
    assert rstore.exists("k") and not rstore.exists("absent")
    rstore.flushdb()
    assert not rstore.exists("k")
    emitted = {name for name, _ in resp_server.commands}
    assert emitted == {"PING", "SET", "GET", "HSET", "HGET", "EXISTS",
                       "FLUSHDB"}


def test_select_db_on_connect(resp_server):
    RedisStore(host="127.0.0.1", port=resp_server.port, db=3)
    assert resp_server.commands[0] == ("SELECT", ["3"])


def test_large_value_spans_recv_chunks(rstore):
    big = {"v": "x" * 300_000}  # > one 65536 recv
    rstore.set("big", big)
    assert rstore.get("big") == big


def test_error_reply_raises_without_reconnect(resp_server, rstore):
    resp_server.fail_next(1)
    with pytest.raises(RuntimeError, match="injected failure"):
        rstore.get("k")
    # the connection survives an -ERR reply (no re-dial)
    assert rstore.ping()
    assert sum(1 for n, _ in resp_server.commands if n == "PING") == 1


def test_reconnect_once_after_drop(resp_server, rstore):
    rstore.set("persist", 42)
    resp_server.drop_connections()
    # the dead socket is only discovered on use; the command retries on a
    # fresh connection and the store (server-side data) is intact
    assert rstore.get("persist") == 42
    assert rstore.ping()


def test_knn_hydration_and_serving(pure_builds, pure_frames, tmp_path,
                                   resp_server, rstore):
    train_data, *_, data_info = pure_builds
    model = UserCF("ranking", data_info, k_sim=10)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = save_knn(tmp_path / "knn", model)

    meta = knn2store(path, rstore)
    assert meta["model_name"] == "UserCF"

    # same artifacts through a DictStore must agree field by field
    dstore = DictStore()
    knn2store(path, dstore)
    assert rstore.get("user2id") == dstore.get("user2id")
    assert rstore.get("cf_mode") == dstore.get("cf_mode")
    assert rstore.hget("k_sims", "0") == dstore.hget("k_sims", "0")

    out = _post(create_app("knn", rstore), "/knn/recommend",
                {"user": int(pure_frames[0].user.iloc[0]), "n_rec": 3})
    assert len(out["rec_list"]) == 3


def test_embed_hydration_and_serving(pure_builds, pure_frames, tmp_path,
                                     rstore):
    train_data, *_, data_info = pure_builds
    model = BPR("ranking", data_info, embed_size=16, n_epochs=1,
                batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = save_embed(tmp_path / "embed", model)
    embed2store(path, rstore)
    assert rstore.get("user_embed_shape")[1] == 17  # +1 bias column
    out = _post(create_app("embed", rstore), "/embed/recommend",
                {"user": int(pure_frames[0].user.iloc[0]), "n_rec": 4})
    assert len(out["rec_list"]) == 4


def test_online_hydration_and_serving(feat_builds, feat_frames, tmp_path,
                                      rstore):
    from librecommender_tpu.models import DIN
    from librecommender_tpu.serving import online2store, save_online

    train_data, *_, data_info = feat_builds
    model = DIN("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=256, recent_num=5)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = save_online(tmp_path / "model", model)
    online2store(path, rstore)
    assert rstore.get("model_path") == str(path)
    user = feat_frames[0].user.iloc[0]
    out = _post(create_app("model", rstore), "/model/recommend",
                {"user": int(user), "n_rec": 5})
    recs = model.recommend_user(user=user, n_rec=5)[user]
    assert list(map(int, out["rec_list"])) == list(map(int, recs))


def test_build_store_prefers_reachable_redis(pure_builds, tmp_path,
                                             resp_server, monkeypatch):
    from librecommender_tpu.serving.launch import build_store

    train_data, *_, data_info = pure_builds
    model = UserCF("ranking", data_info, k_sim=10)
    model.fit(train_data, neg_sampling=True, verbose=0)
    path = save_knn(tmp_path / "knn", model)

    monkeypatch.setenv("REDIS_HOST", "127.0.0.1")
    monkeypatch.setenv("REDIS_PORT", str(resp_server.port))
    store = build_store("knn", path)
    assert isinstance(store, RedisStore)
    assert store.exists("k_sims")

    # unreachable redis falls back to the in-process store
    monkeypatch.setenv("REDIS_PORT", "1")  # nothing listens there
    store2 = build_store("knn", path)
    assert isinstance(store2, DictStore)


def _post(app, url, payload):
    from aiohttp.test_utils import TestClient, TestServer

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

"""Async HTTP serving apps (aiohttp): knn / embed / model / online.

Reference parity: libserving/sanic_serving/{knn,embed,tf,online}_deploy.py —
the four endpoint families keep the same request/response shape
(POST {"user": ..., "n_rec": k} -> {"rec_list": [...]}), with the feature
store abstracted behind store.py (Redis in production, DictStore in tests).
The `model` app is the TF-Serving-path analog: it drives the full jitted
model; `online` additionally accepts dynamic "user_feats"/"seq".
"""
import numpy as np
from aiohttp import web


def _cached(app, key, builder):
    """Materialize immutable store payloads ONCE per app: store.get may
    deserialize (RedisStore json-parses; list->ndarray conversion of a
    ~1M-element CSR costs ~100 ms) — paying that per request was the
    difference between ~12 and several hundred req/s."""
    cache = app.setdefault("_cache", {})
    if key not in cache:
        cache[key] = builder()
    return cache[key]


def _raw_items(app, ids):
    id2item = _cached(app, "id2item", lambda: app["store"].get("id2item"))
    return [id2item.get(str(int(i)), int(i)) for i in ids]


def _uid_consumed(app, user):
    store = app["store"]
    user2id = _cached(app, "user2id", lambda: store.get("user2id"))
    uid = user2id.get(str(user))
    consumed = _cached(
        app, "user_consumed", lambda: store.get("user_consumed") or {}
    )
    return uid, set(consumed.get(str(uid), []) if uid is not None else [])


async def knn_recommend(request):
    """Sim-aggregation recommendation (reference knn_deploy.py:18)."""
    body = await request.json()
    user, n_rec = body["user"], int(body.get("n_rec", 10))
    app = request.app
    store = app["store"]
    uid, consumed = _uid_consumed(app, user)
    if uid is None:
        return web.json_response({"rec_list": []}, status=200)
    meta = _cached(app, "model_meta", lambda: store.get("model_meta"))
    n_items = meta["n_items"]

    def _inter_arrays():
        inter = store.get("interaction")
        return (
            np.asarray(inter["indptr"]),
            np.asarray(inter["indices"]),
            np.asarray(inter["data"]),
        )

    indptr, indices, data = _cached(app, "interaction", _inter_arrays)
    scores = np.zeros(n_items)
    if store.get("cf_mode") == "user":
        # sim-weighted sum of neighbor interaction rows, vectorized over the
        # CSR slices (the k_sim-sized outer loop is negligible)
        for nbr, sim in store.hget("k_sims", str(uid)) or []:
            s, e = indptr[nbr], indptr[nbr + 1]
            np.add.at(scores, indices[s:e], sim * data[s:e])
    else:
        sims_by_item = [
            store.hget("k_sims", str(i)) or []
            for i in indices[indptr[uid]:indptr[uid + 1]]
        ]
        flat = [p for sims in sims_by_item for p in sims]
        if flat:
            nbrs = np.fromiter((p[0] for p in flat), np.int64, len(flat))
            vals = np.fromiter((p[1] for p in flat), np.float64, len(flat))
            np.add.at(scores, nbrs, vals)
    scores[list(consumed)] = -np.inf
    take = min(n_rec, n_items - 1)
    top = np.argpartition(-scores, take)[:n_rec]
    top = top[np.argsort(-scores[top])]
    top = [int(t) for t in top if np.isfinite(scores[t])][:n_rec]
    return web.json_response({"rec_list": _raw_items(app, top)})


async def embed_recommend(request):
    """Embedding dot-product retrieval (reference embed_deploy.py:21; exact
    top-k replaces the faiss index)."""
    body = await request.json()
    user, n_rec = body["user"], int(body.get("n_rec", 10))
    app = request.app
    store = app["store"]
    uid, consumed = _uid_consumed(app, user)
    user_embed = _cached(
        app, "user_embed", lambda: np.asarray(store.get("user_embed"))
    )
    item_embed = _cached(
        app, "item_embed", lambda: np.asarray(store.get("item_embed"))
    )
    n_items = _cached(app, "model_meta", lambda: store.get("model_meta"))["n_items"]
    row = user_embed[uid if uid is not None else -1]
    scores = item_embed[:n_items] @ row
    if consumed:
        scores[list(consumed)] = -np.inf
    take = min(n_rec, n_items - 1)
    top = np.argpartition(-scores, take)[:n_rec]
    top = top[np.argsort(-scores[top])]
    return web.json_response({"rec_list": _raw_items(app, [int(t) for t in top])})


def _get_model(app):
    if "model" not in app:
        from ..utils.save_load import load_hyper_params
        from .. import models as model_zoo

        path = app["store"].get("model_path")
        meta = app["store"].get("model_meta")
        name = meta["model_name"]
        hparams = load_hyper_params(path, name)
        cls = getattr(model_zoo, hparams.get("model_class", name))
        app["model"] = cls.load(path, name)
    return app["model"]


async def model_recommend(request):
    """Full-model scoring (reference tf_deploy.py:19 — the TF Serving hop
    becomes an in-process jitted forward)."""
    body = await request.json()
    user, n_rec = body["user"], int(body.get("n_rec", 10))
    model = _get_model(request.app)
    recs = model.recommend_user(user=user, n_rec=n_rec)
    key = next(iter(recs))
    return web.json_response(
        {"rec_list": [_json_safe(i) for i in recs[key]]}
    )


async def online_recommend(request):
    """Dynamic-state scoring (reference online_deploy.py:25): optional
    request-time "seq" (raw item ids) and "user_feats" override."""
    body = await request.json()
    user, n_rec = body["user"], int(body.get("n_rec", 10))
    model = _get_model(request.app)
    kwargs = {}
    if body.get("seq") is not None:
        kwargs["seq"] = body["seq"]
    if body.get("user_feats") is not None:
        kwargs["user_feats"] = body["user_feats"]
    try:
        recs = model.recommend_user(user=user, n_rec=n_rec, **kwargs)
    except TypeError:  # model family without dynamic-state support
        recs = model.recommend_user(user=user, n_rec=n_rec)
    key = next(iter(recs))
    return web.json_response({"rec_list": [_json_safe(i) for i in recs[key]]})


async def candidates(request):
    """Inner-id candidate scoring for the native server's model/online
    endpoints (the TF-Serving-analog hop: the C++ tier does id mapping and
    consumed filtering, this endpoint only runs the jitted forward —
    reference libserving/actix_serving/src/tf_deploy.rs architecture)."""
    body = await request.json()
    uid, k = int(body["user_inner"]), int(body.get("k", 10))
    model = _get_model(request.app)
    kwargs = {}
    if body.get("seq") is not None:
        # request seqs carry raw item ids; scoring below runs inner_id=True
        item2id = model.data_info.item2id
        kwargs["seq"] = [item2id[i] for i in body["seq"] if i in item2id]
    if body.get("user_feats") is not None:
        kwargs["user_feats"] = body["user_feats"]
    try:
        recs = model.recommend_user(
            user=uid, n_rec=min(k, model.n_items), inner_id=True,
            filter_consumed=False, **kwargs,
        )
    except TypeError:  # model family without dynamic-state support
        recs = model.recommend_user(
            user=uid, n_rec=min(k, model.n_items), inner_id=True,
            filter_consumed=False,
        )
    key = next(iter(recs))
    return web.json_response(
        {"candidates": [int(i) for i in recs[key]]}
    )


def _json_safe(v):
    return v.item() if isinstance(v, np.generic) else v


async def health(request):
    return web.json_response({"status": "ok"})


def create_app(kind, store):
    """kind in {"knn", "embed", "model", "online"}."""
    handlers = {
        "knn": knn_recommend,
        "embed": embed_recommend,
        "model": model_recommend,
        "online": online_recommend,
    }
    app = web.Application()
    app["store"] = store
    app.router.add_post(f"/{kind}/recommend", handlers[kind])
    if kind in ("model", "online"):
        app.router.add_post("/candidates", candidates)
    app.router.add_get("/health", health)
    return app


def run_server(kind, store, port=8000):  # pragma: no cover - manual entry
    web.run_app(create_app(kind, store), port=port)

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


def _raw_items(store, ids):
    id2item = store.get("id2item")
    return [id2item.get(str(int(i)), int(i)) for i in ids]


def _uid_consumed(store, user):
    user2id = store.get("user2id")
    uid = user2id.get(str(user))
    consumed = store.get("user_consumed") or {}
    return uid, set(consumed.get(str(uid), []) if uid is not None else [])


async def knn_recommend(request):
    """Sim-aggregation recommendation (reference knn_deploy.py:18)."""
    body = await request.json()
    user, n_rec = body["user"], int(body.get("n_rec", 10))
    store = request.app["store"]
    uid, consumed = _uid_consumed(store, user)
    if uid is None:
        return web.json_response({"rec_list": []}, status=200)
    meta = store.get("model_meta")
    n_items = meta["n_items"]
    inter = store.get("interaction")
    indptr, indices, data = inter["indptr"], inter["indices"], inter["data"]
    scores = np.zeros(n_items)
    if store.get("cf_mode") == "user":
        for nbr, sim in store.hget("k_sims", str(uid)) or []:
            for p in range(indptr[nbr], indptr[nbr + 1]):
                scores[indices[p]] += sim * data[p]
    else:
        for p in range(indptr[uid], indptr[uid + 1]):
            for nbr, sim in store.hget("k_sims", str(indices[p])) or []:
                scores[nbr] += sim
    scores[list(consumed)] = -np.inf
    top = np.argsort(-scores)[:n_rec]
    top = [int(t) for t in top if np.isfinite(scores[t])][:n_rec]
    return web.json_response({"rec_list": _raw_items(store, top)})


async def embed_recommend(request):
    """Embedding dot-product retrieval (reference embed_deploy.py:21; exact
    top-k replaces the faiss index)."""
    body = await request.json()
    user, n_rec = body["user"], int(body.get("n_rec", 10))
    store = request.app["store"]
    uid, consumed = _uid_consumed(store, user)
    user_embed = np.asarray(store.get("user_embed"))
    item_embed = np.asarray(store.get("item_embed"))
    n_items = store.get("model_meta")["n_items"]
    row = user_embed[uid if uid is not None else -1]
    scores = item_embed[:n_items] @ row
    if consumed:
        scores[list(consumed)] = -np.inf
    top = np.argsort(-scores)[:n_rec]
    return web.json_response({"rec_list": _raw_items(store, [int(t) for t in top])})


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
    app.router.add_get("/health", health)
    return app


def run_server(kind, store, port=8000):  # pragma: no cover - manual entry
    web.run_app(create_app(kind, store), port=port)

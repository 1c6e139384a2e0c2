"""AOT serving artifacts via ``jax.export`` — the SavedModel analog.

The reference exports TF SavedModels so its serving tier can score without
the training library (libserving/serialization/tfmodel.py:17,37-66, consumed
by TF Serving). The TPU-native equivalent is a serialized StableHLO program:
``save_exported`` ahead-of-time-exports two scoring entry points with a
symbolic batch dimension

* ``predict``:   (params, users (b,), items (b,)) -> scores (b,)
* ``score_all``: (params, users (b,)) -> scores (b, n_items)

plus the params npz (the same flat layout as utils/save_load.save_params)
and a JSON meta. ``load_exported`` reconstructs a scorer from those three
files alone — no model class, no model-building code, any jax backend
(CPU serving box or TPU) — and applies the model's output transform
(sigmoid for ranking, clipping for rating) exactly like ``model.predict``.

Feature tables, sequence caches and other non-param device state captured
by the model's forward are baked into the program as constants, so the
artifact is self-contained the way a SavedModel's frozen graph is.
"""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ..utils.save_load import flatten_tree, unflatten_tree


def _param_specs(params):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params
    )


def save_exported_dyn(path, name, model):
    """Online-serving export for the DynEmbedBase family (TwoTower /
    YouTubeRetrieval / RNN4Rec / Caser / WaveNet): the user tower
    ``(params, users (b,), seqs (b, L)) -> (b, D)`` AOT-compiled with a
    symbolic batch dim, plus the item matrix (bias folded) — the
    counterpart of the reference's online SavedModel whose signature takes
    request-time sequences (serialization/tfmodel.py:69-94)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    model._ensure_repr_fn()
    params = model.params
    specs = _param_specs(params)
    (b,) = jax_export.symbolic_shape("b")
    users = jax.ShapeDtypeStruct((b,), jnp.int32)
    seqs = jax.ShapeDtypeStruct((b, model.max_seq_len), jnp.int32)
    repr_exp = jax_export.export(model._user_repr_fn)(specs, users, seqs)
    (path / f"{name}_user_repr.stablehlo").write_bytes(repr_exp.serialize())

    host = jax.device_get(params)
    flat = {k: np.asarray(v) for k, v in flatten_tree(host).items()}
    np.savez(path / f"{name}_export_params.npz", **flat)
    item_repr = np.asarray(model._item_repr(host))[: model.n_items]
    bias = model._item_bias(host)
    if bias is not None:
        item_repr = np.hstack(
            [item_repr, np.asarray(bias)[: model.n_items, None]]
        )
    # stored recent histories make the artifact self-sufficient for known
    # users (row n_users = the cold/OOV pad row), like the feature tables
    # the reference ships to its online store
    np.savez(
        path / f"{name}_export_items.npz",
        item_repr=item_repr,
        recent_seq=np.asarray(model.recent_seq_table, dtype=np.int32),
    )
    meta = {
        "model_name": model.model_name,
        "task": model.task,
        "kind": "dyn_embed",
        "n_users": int(model.n_users),
        "n_items": int(model.n_items),
        "max_seq_len": int(model.max_seq_len),
        "pad_id": int(model.pad_id),
        "has_bias": bias is not None,
    }
    (path / f"{name}_export_meta.json").write_text(json.dumps(meta))


class ExportedDynScorer:
    """Scores from the dyn artifacts: user tower + item matrix."""

    def __init__(self, repr_exp, params, item_repr, meta, recent_seq=None):
        self._repr = repr_exp
        self._params = params
        self.item_repr = item_repr
        self.recent_seq = recent_seq
        self.meta = meta

    def user_embedding(self, users, seqs=None):
        """(b,) inner user ids + optional (b, L) padded inner-id seqs
        -> (b, D[+1 bias column]) user vectors. Without ``seqs`` the
        stored recent histories are used (unknown ids get the pad row)."""
        users = jnp.asarray(users, dtype=jnp.int32).reshape(-1)
        if seqs is None and self.recent_seq is not None:
            rows = np.clip(np.asarray(users), 0, len(self.recent_seq) - 1)
            seqs = self.recent_seq[rows]
        elif seqs is None:
            seqs = np.full(
                (users.shape[0], self.meta["max_seq_len"]),
                self.meta["pad_id"], np.int32,
            )
        seqs = jnp.asarray(seqs, dtype=jnp.int32)
        out = np.asarray(self._repr.call(self._params, users, seqs))
        if self.meta["has_bias"]:
            out = np.hstack([out, np.ones((len(out), 1), np.float32)])
        return out

    def score_all(self, users, seqs=None):
        return self.user_embedding(users, seqs) @ self.item_repr.T

    def recommend(self, users, n_rec, seqs=None):
        scores = self.score_all(users, seqs)
        return np.argsort(-scores, axis=1)[:, :n_rec]


def load_exported_dyn(path, name):
    path = Path(path)
    repr_exp = jax_export.deserialize(
        (path / f"{name}_user_repr.stablehlo").read_bytes()
    )
    with np.load(path / f"{name}_export_params.npz") as data:
        params = unflatten_tree({k: data[k] for k in data.files})
    params = jax.tree.map(jnp.asarray, params)
    with np.load(path / f"{name}_export_items.npz") as data:
        item_repr = data["item_repr"]
        recent_seq = data["recent_seq"] if "recent_seq" in data else None
    meta = json.loads((path / f"{name}_export_meta.json").read_text())
    return ExportedDynScorer(repr_exp, params, item_repr, meta, recent_seq)


def save_exported(path, name, model):
    """Write ``{name}_predict.stablehlo``, ``{name}_score_all.stablehlo``,
    ``{name}_export_params.npz`` and ``{name}_export_meta.json``.
    DynEmbedBase models dispatch to :func:`save_exported_dyn`."""
    if hasattr(model, "dyn_user_embedding"):
        return save_exported_dyn(path, name, model)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    model._ensure_inference_fns()
    n_items = model.n_items
    params = model.params
    specs = _param_specs(params)
    (b,) = jax_export.symbolic_shape("b")
    ids = jax.ShapeDtypeStruct((b,), jnp.int32)

    predict_exp = jax_export.export(model._predict_fn)(specs, ids, ids)

    forward = model._forward
    catalog = getattr(model, "_score_catalog", None)

    @jax.jit
    def score_all(p, users):
        if catalog is not None:
            # model-provided catalog scorer (shares per-user seq work
            # across items); shape arithmetic is symbolic-dim safe
            return catalog(p, users, users.shape[0])
        items = jnp.broadcast_to(
            jnp.arange(n_items, dtype=jnp.int32)[None, :],
            (users.shape[0], n_items),
        ).reshape(-1)
        users_rep = jnp.repeat(users, n_items)
        logits = forward(
            p, {"user": users_rep, "item": items}, train=False, rng=None
        )
        return logits.reshape(users.shape[0], n_items)

    score_exp = jax_export.export(score_all)(specs, ids)

    (path / f"{name}_predict.stablehlo").write_bytes(predict_exp.serialize())
    (path / f"{name}_score_all.stablehlo").write_bytes(score_exp.serialize())
    host = jax.device_get(params)
    flat = {k: np.asarray(v) for k, v in flatten_tree(host).items()}
    np.savez(path / f"{name}_export_params.npz", **flat)
    meta = {
        "model_name": model.model_name,
        "task": model.task,
        "n_users": int(model.n_users),
        "n_items": int(n_items),
    }
    if model.task == "rating":
        meta["lower_bound"] = float(model.lower_bound)
        meta["upper_bound"] = float(model.upper_bound)
    (path / f"{name}_export_meta.json").write_text(json.dumps(meta))


class ExportedScorer:
    """Scores from the AOT artifacts alone (inner ids in, scores out)."""

    def __init__(self, predict_exp, score_exp, params, meta):
        self._predict = predict_exp
        self._score_all = score_exp
        self._params = params
        self.meta = meta

    def _transform(self, logits):
        if self.meta["task"] == "rating":
            return np.clip(
                np.asarray(logits),
                self.meta["lower_bound"], self.meta["upper_bound"],
            )
        return np.asarray(jax.nn.sigmoid(logits))

    def predict(self, users, items):
        users = jnp.asarray(users, dtype=jnp.int32).reshape(-1)
        items = jnp.asarray(items, dtype=jnp.int32).reshape(-1)
        return self._transform(self._predict.call(self._params, users, items))

    def score_all(self, users):
        """(b,) user inner ids -> (b, n_items) scores (raw logits)."""
        users = jnp.asarray(users, dtype=jnp.int32).reshape(-1)
        return np.asarray(self._score_all.call(self._params, users))

    def recommend(self, users, n_rec):
        scores = self.score_all(users)
        top = np.argsort(-scores, axis=1)[:, :n_rec]
        return top


def load_exported(path, name):
    path = Path(path)
    predict_exp = jax_export.deserialize(
        (path / f"{name}_predict.stablehlo").read_bytes()
    )
    score_exp = jax_export.deserialize(
        (path / f"{name}_score_all.stablehlo").read_bytes()
    )
    with np.load(path / f"{name}_export_params.npz") as data:
        params = unflatten_tree({k: data[k] for k in data.files})
    params = jax.tree.map(jnp.asarray, params)
    meta = json.loads((path / f"{name}_export_meta.json").read_text())
    return ExportedScorer(predict_exp, score_exp, params, meta)

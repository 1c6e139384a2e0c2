"""Model persistence: hyper-params + params pytree + DataInfo.

Reference parity: libreco/utils/save_load.py:11-112 (init-arg capture via
``all_args``, hyper-params as JSON, weights as npz). A model is three
artifacts:

- ``{name}_hyper_params.json`` — init kwargs captured from ``all_args``
- ``{name}_params.npz``        — the params pytree flattened to path->array
- DataInfo's own files         — via ``DataInfo.save``

JSON + npz keep ``load`` safe on untrusted model directories (no pickle
code execution) and inspectable, matching the reference's format choice.
Legacy ``.pkl`` artifacts from older saves are still readable.

Param pytrees are nested dicts/lists/tuples with array leaves. Paths are
encoded as ``a/b#2/c`` (dict keys joined by ``/``, list positions as
``#i``); dict keys in model params are code-controlled identifiers, never
containing ``/`` or ``#``.
"""
import json
import pickle
from pathlib import Path

import jax
import numpy as np


def _jsonable(v):
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, (tuple, list)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    return v


def save_hyper_params(path, model, extra=None):
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    hparams = {k: _jsonable(v) for k, v in model.all_args.items()}
    hparams["model_class"] = model.__class__.__name__
    if extra:
        hparams.update({k: _jsonable(v) for k, v in extra.items()})
    with open(path / f"{model.model_name}_hyper_params.json", "w") as f:
        json.dump(hparams, f, indent=2)


def load_hyper_params(path, model_name):
    p = Path(path) / f"{model_name}_hyper_params.json"
    if p.exists():
        with open(p) as f:
            return json.load(f)
    legacy = Path(path) / f"{model_name}_hyper_params.pkl"
    with open(legacy, "rb") as f:  # legacy rounds saved pickle
        return pickle.load(f)


def flatten_tree(tree, prefix=""):
    """Flatten a dict/list/tuple pytree to ``{path: leaf}``."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}/{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}#{i}"))
    else:
        out[prefix] = tree
    return out


def unflatten_tree(flat):
    """Rebuild the nested dict/list structure from ``{path: leaf}``.

    Tuples are restored as lists (JAX treats both as pytree sequences and
    model code indexes them positionally).
    """
    root = {}
    for path, leaf in flat.items():
        # split "a/b#2/c" into tokens: ('a',), ('b',), (2,), ('c',)
        node = root
        tokens = []
        for seg in path.split("/"):
            parts = seg.split("#")
            tokens.append(("k", parts[0]))
            tokens.extend(("i", int(p)) for p in parts[1:])
        for t, (kind, key) in enumerate(tokens[:-1]):
            nxt_kind = tokens[t + 1][0]
            default = {} if nxt_kind == "k" else []
            if kind == "k":
                node = node.setdefault(key, default)
            else:
                while len(node) <= key:
                    node.append(None)
                if node[key] is None:
                    node[key] = default
                node = node[key]
        kind, key = tokens[-1]
        if kind == "k":
            node[key] = leaf
        else:
            while len(node) <= key:
                node.append(None)
            node[key] = leaf
    return root


def save_params(path, model):
    """Persist the params pytree as a flat npz (device -> host once)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    host_params = jax.device_get(model.params)
    flat = {k: np.asarray(v) for k, v in flatten_tree(host_params).items()}
    np.savez(path / f"{model.model_name}_params.npz", **flat)


def load_params(path, model_name):
    p = Path(path) / f"{model_name}_params.npz"
    if p.exists():
        with np.load(p) as data:
            return unflatten_tree({k: data[k] for k in data.files})
    legacy = Path(path) / f"{model_name}_params.pkl"
    with open(legacy, "rb") as f:  # legacy rounds saved pickle
        return pickle.load(f)


def save_opt_state(path, model_name, opt_state):
    """Persist optimizer state as an npz of leaves in tree-flatten order.

    The treedef is NOT stored: on restore/graft the trainer re-creates the
    state structure with ``optimizer.init`` and substitutes these leaves,
    which keeps load pickle-free (structure comes from code, data from npz).
    """
    leaves = jax.tree_util.tree_leaves(jax.device_get(opt_state))
    arrays = {f"leaf_{i:05d}": np.asarray(v) for i, v in enumerate(leaves)}
    np.savez(Path(path) / f"{model_name}_opt_state.npz", **arrays)


def load_opt_state(path, model_name):
    """Returns ("leaves", [arrays]) from npz, ("pytree", obj) from a legacy
    pickle, or None if no optimizer state was saved."""
    p = Path(path) / f"{model_name}_opt_state.npz"
    if p.exists():
        with np.load(p) as data:
            return "leaves", [data[k] for k in sorted(data.files)]
    legacy = Path(path) / f"{model_name}_opt_state.pkl"
    if legacy.exists():
        with open(legacy, "rb") as f:
            return "pytree", pickle.load(f)
    return None


def restore_opt_leaves(fresh_state, leaves):
    """Rebuild an opt-state pytree from saved leaves using the structure of
    a freshly-initialized state (identical treedef by construction)."""
    treedef = jax.tree_util.tree_structure(fresh_state)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"saved optimizer state has {len(leaves)} leaves but the fresh "
            f"state has {treedef.num_leaves}; optimizer configuration "
            "changed between save and load"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_default_recs(path, model):
    if model.default_recs is not None:
        np.savez_compressed(
            Path(path) / f"{model.model_name}_default_recs",
            default_recs=np.asarray(model.default_recs),
        )


def load_default_recs(path, model_name):
    p = Path(path) / f"{model_name}_default_recs.npz"
    if p.exists():
        return np.load(p)["default_recs"]
    return None

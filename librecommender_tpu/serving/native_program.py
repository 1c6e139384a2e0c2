"""Jaxpr -> flat native program serialization for the C++ serving runtime.

The reference's high-performance serving tier never executes Python on the
scoring path: its Rust server delegates to TF Serving's C++ runtime
(libserving/actix_serving/src/tf_deploy.rs:1, online_deploy_grpc.rs:38).
The TPU-native analog: the SAME jitted scoring functions that run on TPU
are traced to a jaxpr, which is serialized here to a flat op-list program
(JSON) plus a binary constant blob; the C++ server executes it in-process
(native_server/jaxpr_interp.hpp) — no Python, no extra network hop (one hop
fewer than the reference's actix -> TF Serving architecture).

Design notes:
- Model params and feature tables are closed over at trace time, so they
  land in the constant blob and the artifact is self-contained, like a
  frozen SavedModel graph.
- Shapes are fixed at trace time (the serving dispatch width, e.g. one
  user per request); call-like primitives (pjit/custom_jvp/...) are inlined
  during serialization so the interpreter only sees ~40 flat primitives
  plus `scan` (kept as a loop with a nested sub-program).
- The blob stores constants as little-endian row-major arrays at
  64-byte-aligned offsets (params appear once each; scalar literals are
  small enough that dedup isn't worth the bookkeeping).
"""
import json
from pathlib import Path

import jax
import numpy as np
from jax import core as jax_core

try:  # jax >= 0.4.x moves Literal around; keep a single name
    Literal = jax_core.Literal
except AttributeError:  # pragma: no cover
    from jax._src.core import Literal

# call-like primitives whose body is inlined at serialization time
_CALL_PRIMS = {
    "jit", "pjit", "closed_call", "core_call", "xla_call",
    "custom_jvp_call", "custom_vjp_call", "custom_jvp_call_jaxpr",
    "remat", "remat2", "checkpoint",
}

_IDENTITY_PRIMS = {"stop_gradient", "copy", "sharding_constraint"}

_DTYPE_NAMES = {
    np.dtype(np.float32): "f32",
    np.dtype(np.float64): "f64",
    np.dtype(np.int32): "i32",
    np.dtype(np.int64): "i64",
    np.dtype(np.uint32): "u32",
    np.dtype(np.bool_): "bool",
}


def _dtype_name(dt):
    dt = np.dtype(dt)
    if dt in _DTYPE_NAMES:
        return _DTYPE_NAMES[dt]
    if str(dt) == "bfloat16":
        return "bf16"
    raise NotImplementedError(f"native program: unsupported dtype {dt}")


def _attr_value(v):
    """Primitive params -> JSON-serializable attrs."""
    import enum

    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, enum.Enum):
        return str(v.name)
    if isinstance(v, np.dtype) or (isinstance(v, type) and
                                   issubclass(v, np.generic)):
        return _dtype_name(v)
    if hasattr(v, "dtype") and not hasattr(v, "shape"):
        return _dtype_name(v.dtype)
    if isinstance(v, (tuple, list)):
        return [_attr_value(x) for x in v]
    if hasattr(v, "_fields"):  # NamedTuple (GatherDimensionNumbers, ...)
        return {f: _attr_value(getattr(v, f)) for f in v._fields}
    # jnp dtypes like jnp.float32 arrive as type objects handled above;
    # anything else: stringify (never load-bearing for our primitive set)
    return str(v)


class _Blob:
    """Constant pool with 64-byte-aligned offsets."""

    def __init__(self):
        self.chunks = []
        self.size = 0

    def add(self, arr):
        """Append `arr`; returns (offset, stored_dtype_name). The
        interpreter computes floats in f32, so bf16/f64 constants are
        stored rounded-through; bools store as one byte each."""
        arr = np.asarray(arr)
        if str(arr.dtype) == "bfloat16" or arr.dtype == np.float64:
            arr = arr.astype(np.float32)
        if arr.dtype == np.bool_:
            arr = arr.astype(np.int8)
        arr = np.ascontiguousarray(arr)
        pad = (-self.size) % 64
        if pad:
            self.chunks.append(b"\0" * pad)
            self.size += pad
        offset = self.size
        data = arr.tobytes()
        self.chunks.append(data)
        self.size += len(data)
        stored = {"float32": "f32", "int32": "i32", "int64": "i64",
                  "uint32": "u32", "int8": "i8"}[str(arr.dtype)]
        return offset, stored

    def tobytes(self):
        return b"".join(self.chunks)


class _Serializer:
    def __init__(self):
        self.ops = []
        self.constants = []
        self.blob = _Blob()
        self.next_id = 0

    def new_id(self):
        i = self.next_id
        self.next_id += 1
        return i

    def tensor_decl(self, aval):
        return {
            "id": self.new_id(),
            "shape": [int(d) for d in aval.shape],
            "dtype": _dtype_name(aval.dtype),
        }

    def add_constant(self, value):
        arr = np.asarray(value)
        offset, stored = self.blob.add(arr)
        decl = {
            "id": self.new_id(),
            "shape": [int(d) for d in arr.shape],
            "dtype": _dtype_name(arr.dtype),  # logical dtype in the program
            "stored": stored,                 # physical dtype in the blob
            "offset": offset,
        }
        self.constants.append(decl)
        return decl["id"]

    def serialize_jaxpr(self, jaxpr, consts, input_ids):
        """Emit ops for `jaxpr` with invars bound to `input_ids`.
        Returns the output tensor ids."""
        env = {}
        for var, cval in zip(jaxpr.constvars, consts):
            env[var] = self.add_constant(cval)
        for var, tid in zip(jaxpr.invars, input_ids):
            env[var] = tid

        def read(atom):
            if isinstance(atom, Literal):
                return self.add_constant(atom.val)
            return env[atom]

        for eqn in jaxpr.eqns:
            prim = eqn.primitive.name
            in_ids = [read(v) for v in eqn.invars]
            if prim in _CALL_PRIMS:
                sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
                if hasattr(sub, "jaxpr"):  # ClosedJaxpr
                    sub_consts, sub = sub.consts, sub.jaxpr
                else:
                    sub_consts = ()
                if prim == "custom_vjp_call":
                    # drop the residual-producing fwd; call_jaxpr is primal
                    pass
                n_expected = len(sub.invars)
                out_ids = self.serialize_jaxpr(
                    sub, sub_consts, in_ids[len(in_ids) - n_expected:]
                )
                for var, oid in zip(eqn.outvars, out_ids):
                    if type(var).__name__ != "DropVar":
                        env[var] = oid
                continue
            if prim in _IDENTITY_PRIMS:
                env[eqn.outvars[0]] = in_ids[0]
                continue
            attrs = {}
            for k, v in eqn.params.items():
                if k in ("jaxpr", "call_jaxpr", "branches", "cond_jaxpr",
                         "body_jaxpr"):
                    continue
                attrs[k] = _attr_value(v)
            op = {"prim": prim, "inputs": in_ids, "attrs": attrs,
                  "outputs": []}
            if prim == "scan":
                closed = eqn.params["jaxpr"]
                body = _Serializer()
                body_inputs = [
                    body.tensor_decl(v.aval) for v in closed.jaxpr.invars
                ]
                body_out = body.serialize_jaxpr(
                    closed.jaxpr, closed.consts,
                    [d["id"] for d in body_inputs],
                )
                op["body"] = {
                    "inputs": body_inputs,
                    "ops": body.ops,
                    "constants": body.constants,
                    "outputs": body_out,
                }
                # nested constants append to the parent blob: align, copy,
                # rebase the body's offsets
                pad = (-self.blob.size) % 64
                if pad:
                    self.blob.chunks.append(b"\0" * pad)
                    self.blob.size += pad
                base_off = self.blob.size
                raw = body.blob.tobytes()
                self.blob.chunks.append(raw)
                self.blob.size += len(raw)

                def _rebase(prog):
                    for c in prog["constants"]:
                        c["offset"] += base_off
                    for o in prog["ops"]:
                        if "body" in o:
                            _rebase(o["body"])

                _rebase(op["body"])
            for var in eqn.outvars:
                if type(var).__name__ == "DropVar":
                    decl = self.tensor_decl(var.aval)
                    decl["drop"] = True
                else:
                    decl = self.tensor_decl(var.aval)
                    env[var] = decl["id"]
                op["outputs"].append(decl)
            self.ops.append(op)
        return [read(v) for v in jaxpr.outvars]


def trace_to_program(fn, *example_args):
    """Trace `fn` at the example shapes and serialize the closed jaxpr.

    Returns (program_dict, blob_bytes). `example_args` become the program
    inputs (flattened in pytree order); everything `fn` closes over is
    baked into the constant pool.
    """
    closed = jax.make_jaxpr(fn)(*example_args)
    flat_args, _ = jax.tree.flatten(example_args)
    ser = _Serializer()
    input_decls = []
    for a in flat_args:
        arr = np.asarray(a)
        input_decls.append({
            "id": ser.new_id(),
            "shape": [int(d) for d in arr.shape],
            "dtype": _dtype_name(arr.dtype),
        })
    out_ids = ser.serialize_jaxpr(
        closed.jaxpr, closed.consts, [d["id"] for d in input_decls]
    )
    program = {
        "version": 1,
        "inputs": input_decls,
        "constants": ser.constants,
        "ops": ser.ops,
        "outputs": out_ids,
    }
    return program, ser.blob.tobytes()


def save_program(path, name, fn, *example_args):
    """Write `{name}.program.json` + `{name}.blob.bin` under `path`."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    program, blob = trace_to_program(fn, *example_args)
    (path / f"{name}.program.json").write_text(json.dumps(program))
    (path / f"{name}.blob.bin").write_bytes(blob)
    return program


# --------------------------------------------------------- server artifacts
# feat-family tiled catalog scorer: tile width (items per program run).
# 256 keeps every intermediate of typical CTR/seq programs inside L2
# while amortizing per-op dispatch; the server pads the last tile.
# Measured sweep (DIN, ML-1M catalog, 4-thread load): 256 gives the best
# loaded p99 (31.5ms) at ~equal throughput to 512; 1024 loses p50.
_TILE_SIZE = 256
# dyn-family request-coalescing width: concurrent /online requests are
# batched into one user_repr execution + one (B, D) x (D, n_items) GEMM
# (the TF Serving batching trick, reference tf_deploy.rs:1).
_DYN_BATCH = 8
# feat-family precomputed static top-K depth: /model/recommend (stored
# features, no request overrides) is deterministic given the artifact, so
# the sorted lists are computed ONCE at export through the XLA scorer —
# the reference does exactly this (TfBase default_recs scores every user
# at fit, bases/tf_base.py:145). Requests needing deeper lists
# (n_rec + |consumed| > K) fall back to live tiled scoring.
_STATIC_TOPK = 512


def export_native_programs(path, model, tile_size=None):
    """Export the scoring programs + feature-assembly tables the native C++
    server needs to answer /model/recommend and /online/recommend without a
    Python backend. Returns the runtime meta dict (or None when the model
    family has no native program path). ``tile_size`` overrides the
    feat-family tiled-scorer width (default ``_TILE_SIZE``; tests use small
    values to drive the tiled path on tiny catalogs)."""
    from ..bases.feat_base import FeatBase
    from ..bases.dyn_embed_base import DynEmbedBase

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    data_info = model.data_info
    meta = None

    if isinstance(model, FeatBase):
        model._ensure_inference_fns()
        params = model.params
        users1 = np.zeros(1, np.int32)
        if hasattr(model, "_score_catalog"):
            save_program(path, "score_all",
                         lambda u: model._score_catalog(params, u, 1), users1)
        else:
            fn = model._recommend_fn.__wrapped__
            save_program(path, "score_all", lambda u: fn(params, u, 1), users1)

        # dynamic-override program: one input slot per override the model
        # supports, in a fixed order recorded in the meta
        ov_inputs = ["users"]
        examples = [users1]
        feats = model.feats
        if hasattr(model, "max_seq_len"):
            ov_inputs.append("seq")
            examples.append(np.full((1, model.max_seq_len),
                                    model.pad_id, np.int32))
        if hasattr(model, "long_max_len"):
            ov_inputs.append("seq_long")
            examples.append(np.full((1, model.long_max_len),
                                    model.pad_id, np.int32))
        if feats.user_sparse is not None:
            ov_inputs.append("user_sparse_row")
            examples.append(
                np.asarray(data_info.user_sparse_unique)[:1].astype(np.int32)
            )
        if feats.user_dense is not None:
            ov_inputs.append("user_dense_row")
            examples.append(
                np.asarray(data_info.user_dense_unique)[:1].astype(np.float32)
            )
        if len(ov_inputs) > 1:
            keys = ov_inputs[1:]

            def dyn_fn(u, *ovs):
                overrides = dict(zip(keys, ovs))
                if hasattr(model, "_score_catalog"):
                    return model._score_catalog(params, u, 1,
                                                overrides=overrides)
                inputs = model._catalog_pair_inputs(u, 1, overrides)
                out = model._forward(params, inputs, train=False, rng=None)
                return out.reshape(1, model.n_items)

            save_program(path, "score_dyn", dyn_fn, *examples)

        # tiled catalog scorer: (users, item tile, override slots) ->
        # (1, T) scores. The C++ server splits the catalog into T-item
        # tiles so every intermediate stays cache-resident and tiles fan
        # out across its worker pool (the large-catalog serving path; the
        # reference's analog is TF Serving's internal batching,
        # libserving/actix_serving/src/tf_deploy.rs:1). One program serves
        # BOTH /model and /online: stored rows are inputs like overrides.
        tile = int(min(tile_size or _TILE_SIZE, model.n_items))
        tile_keys = ov_inputs[1:]
        items_ex = np.arange(tile, dtype=np.int32)

        def tile_fn(u, items, *ovs):
            overrides = dict(zip(tile_keys, ovs))
            if hasattr(model, "_score_catalog"):
                return model._score_catalog(
                    params, u, 1, overrides=overrides, items=items
                )
            inputs = model._catalog_pair_inputs(u, 1, overrides, items)
            out = model._forward(params, inputs, train=False, rng=None)
            return out.reshape(1, tile)

        # trace the tile program with PER-ID token assembly: a tile touches
        # only `tile` items, so the packed all-items token table (a
        # training-time optimization, seq_base.token_pack_max_items) would
        # rebuild O(n_items) token rows in every tile execution —
        # n_items/tile times the work per request
        pack_attr = getattr(model, "token_pack_max_items", None)
        try:
            if pack_attr is not None:
                model.token_pack_max_items = 0
            save_program(path, "score_tile", tile_fn, users1, items_ex,
                         *examples[1:])
        finally:
            if pack_attr is not None:
                model.token_pack_max_items = pack_attr

        # stored recent histories: the score_dyn program takes seq as an
        # INPUT, so the server needs the tables to fill requests without one
        if getattr(model, "recent_seq_table", None) is not None:
            tab = np.ascontiguousarray(
                np.asarray(model.recent_seq_table), np.int32)
            np.asarray(tab.shape, np.int64).tofile(
                path / "recent_seq_shape.bin")
            tab.tofile(path / "recent_seq.bin")
        if getattr(model, "recent_long_table", None) is not None:
            tab = np.ascontiguousarray(
                np.asarray(model.recent_long_table), np.int32)
            np.asarray(tab.shape, np.int64).tofile(
                path / "recent_long_shape.bin")
            tab.tofile(path / "recent_long.bin")

        # precomputed static top-K through the XLA scorer (batched over
        # user chunks; one compile at the fixed chunk width).
        # Score provenance: this table is XLA-produced, while a /model
        # request that exhausts the table (n_rec + consumed > K) falls
        # back to live tiled scoring in the C++ interpreter (fexp
        # approximation, different float-sum order) — near-tie ranks at
        # the table/live boundary may therefore differ between the two
        # paths for the same user. Bound and verification protocol:
        # docs/serving_guide.md §4 (scoring-precision boundary).
        K = int(min(model.n_items, _STATIC_TOPK))
        n_rows = model.n_users + 1  # + OOV/cold row
        top_ids = np.empty((n_rows, K), np.int32)
        chunk = 64  # seq catalog scorers materialize (n_items, U, D)
        for start in range(0, n_rows, chunk):
            uids = np.arange(start, min(start + chunk, n_rows),
                             dtype=np.int32)
            pad = chunk - len(uids)
            uids_p = np.pad(uids, (0, pad)).astype(np.int32)
            scores = np.asarray(
                model._recommend_fn(params, uids_p, chunk)
            )[: len(uids)]
            part = np.argpartition(-scores, K - 1, axis=1)[:, :K]
            row_scores = np.take_along_axis(scores, part, 1)
            order = np.argsort(-row_scores, axis=1, kind="stable")
            top_ids[start : start + len(uids)] = np.take_along_axis(
                part, order, 1
            )
        np.asarray(top_ids.shape, np.int64).tofile(
            path / "static_topk_shape.bin")
        np.ascontiguousarray(top_ids).tofile(path / "static_topk.bin")

        meta = {
            "kind": "feat",
            "inputs": ov_inputs,
            "n_users": int(model.n_users),
            "n_items": int(model.n_items),
            "pad_id": int(getattr(model, "pad_id", model.n_items)),
            "max_seq_len": int(getattr(model, "max_seq_len", 0)),
            "long_max_len": int(getattr(model, "long_max_len", 0)),
            "tile": tile,
            "static_topk": K,
        }
        _export_feature_tables(path, model)

    elif hasattr(model, "user_tower") and \
            getattr(model, "item_embeds_np", None) is not None:
        # TwoTower family: EmbedBase whose online path recomputes the user
        # vector through the tower with request-time feature overrides
        params = model.params
        feats = model.feats
        users1 = np.zeros(1, np.int32)
        ov_inputs = ["users"]
        examples = [users1]
        if feats.user_sparse is not None:
            ov_inputs.append("user_sparse_row")
            examples.append(
                np.asarray(data_info.user_sparse_unique)[:1].astype(np.int32)
            )
        if feats.user_dense is not None:
            ov_inputs.append("user_dense_row")
            examples.append(
                np.asarray(data_info.user_dense_unique)[:1].astype(np.float32)
            )
        keys = ov_inputs[1:]

        def tower_fn(u, *ovs):
            kw = dict(zip(keys, ovs))
            return model.user_tower(
                params, u,
                sparse_rows=kw.get("user_sparse_row"),
                dense_rows=kw.get("user_dense_row"),
            )

        save_program(path, "user_repr", tower_fn, *examples)
        # coalesced width: B concurrent requests -> one tower execution
        exB = [np.repeat(e, _DYN_BATCH, axis=0) for e in examples]
        save_program(path, "user_repr_b", tower_fn, *exB)
        meta = {
            "kind": "dyn_feats",
            "inputs": ov_inputs,
            "n_users": int(model.n_users),
            "n_items": int(model.n_items),
            "pad_id": int(model.n_items),
            "max_seq_len": 0,
            "dyn_batch": _DYN_BATCH,
        }
        _export_feature_tables(path, model)

    elif isinstance(model, DynEmbedBase):
        model._ensure_repr_fn()
        params = model.params
        users1 = np.zeros(1, np.int32)
        seqs1 = np.full((1, model.max_seq_len), model.pad_id, np.int32)
        save_program(
            path, "user_repr",
            lambda u, s: model._user_repr(params, u, s, False, None),
            users1, seqs1,
        )
        save_program(
            path, "user_repr_b",
            lambda u, s: model._user_repr(params, u, s, False, None),
            np.repeat(users1, _DYN_BATCH), np.repeat(seqs1, _DYN_BATCH, 0),
        )
        host = {k: np.asarray(v) for k, v in
                jax.device_get(params).items()} if isinstance(params, dict) \
            else jax.device_get(params)
        item_repr = np.asarray(model._item_repr(host))[: model.n_items]
        bias = model._item_bias(host)
        has_bias = bias is not None
        if has_bias:
            item_repr = np.hstack(
                [item_repr, np.asarray(bias)[: model.n_items, None]]
            )
        item_repr = np.ascontiguousarray(item_repr, np.float32)
        np.asarray(item_repr.shape, np.int64).tofile(
            path / "item_repr_shape.bin")
        item_repr.tofile(path / "item_repr.bin")
        seq_tab = np.ascontiguousarray(
            np.asarray(model.recent_seq_table), np.int32)
        np.asarray(seq_tab.shape, np.int64).tofile(
            path / "recent_seq_shape.bin")
        seq_tab.tofile(path / "recent_seq.bin")
        meta = {
            "kind": "dyn",
            "inputs": ["users", "seq"],
            "n_users": int(model.n_users),
            "n_items": int(model.n_items),
            "pad_id": int(model.pad_id),
            "max_seq_len": int(model.max_seq_len),
            "has_bias": bool(has_bias),
            "dyn_batch": _DYN_BATCH,
        }

    if meta is not None:
        (path / "runtime_meta.json").write_text(json.dumps(meta))
    return meta


def _export_feature_tables(path, model):
    """User feature rows + raw-value -> flat-index maps so the server can
    assemble override rows exactly like FeatureTables.build_user_sparse_row."""
    data_info = model.data_info
    if data_info.user_sparse_unique is not None:
        rows = np.ascontiguousarray(
            np.asarray(data_info.user_sparse_unique), np.int32)
        np.asarray(rows.shape, np.int64).tofile(
            path / "user_sparse_rows_shape.bin")
        rows.tofile(path / "user_sparse_rows.bin")
    if data_info.user_dense_unique is not None:
        rows = np.ascontiguousarray(
            np.asarray(data_info.user_dense_unique), np.float32)
        np.asarray(rows.shape, np.int64).tofile(
            path / "user_dense_rows_shape.bin")
        rows.tofile(path / "user_dense_rows.bin")

    feat_map = {"sparse": {}, "dense": {}}
    u_sparse_names = list(data_info.user_sparse_col.name)
    for j, name in enumerate(u_sparse_names):
        col_pos = data_info.user_sparse_col.index[j]
        mapping = (data_info.sparse_idx_mapping or {}).get(name, {})
        offset = int(data_info.sparse_offset[col_pos])
        feat_map["sparse"][name] = {
            "pos": j,
            "oov": int(data_info.sparse_oov[col_pos]),
            "values": {str(k): offset + int(v) for k, v in mapping.items()},
        }
    for j, name in enumerate(data_info.user_dense_col.name):
        feat_map["dense"][name] = j
    (path / "feat_map.json").write_text(json.dumps(feat_map))

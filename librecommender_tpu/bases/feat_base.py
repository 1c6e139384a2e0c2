"""Base for feature/CTR models scored by a full forward pass.

Replaces the reference's TfBase (libreco/bases/tf_base.py:28): the TF1
session/graph machinery becomes a jitted forward; full-catalog scoring for
``recommend_user`` (tf_base.py:155,186) runs on device with a fixed
users-per-call shape so XLA compiles the scoring program once; the
``build_topk`` serving op (tf_base.py:355) maps to `ops.topk.topk_from_scores`.

Subclasses implement ``_init_params`` and ``_forward``; feature gathering
happens inside ``_forward`` via the device-resident FeatureTables.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .base import Base
from ..ops.features import FeatureTables
from ..ops.losses import bce_loss, focal_loss, mse_loss
from ..ops.topk import pad_consumed, topk_from_scores
from ..recommendation.cold_start import popular_recommendations

_PREDICT_CHUNK = 4096


class FeatBase(Base):
    paradigm = "pointwise"

    def __init__(
        self,
        task,
        data_info,
        loss_type="cross_entropy",
        embed_size=16,
        n_epochs=20,
        lr=0.001,
        lr_decay=False,
        epsilon=1e-5,
        reg=None,
        batch_size=256,
        sampler="random",
        num_neg=1,
        seed=42,
        lower_upper_bound=None,
        multi_sparse_combiner="sqrtn",
    ):
        super().__init__(task, data_info, lower_upper_bound, seed)
        if task == "ranking":
            assert loss_type in ("cross_entropy", "focal"), loss_type
        self.loss_type = loss_type
        self.embed_size = embed_size
        self.n_epochs = n_epochs
        self.lr = lr
        self.lr_decay = lr_decay
        self.epsilon = epsilon
        self.reg = reg
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_neg = num_neg
        self.multi_sparse_combiner = multi_sparse_combiner
        self.feats = None
        self._predict_fn = None
        self._recommend_fn = None
        self._users_per_rec_call = None

    # row-sparse LazyAdam opt-in for huge vocab tables (set the attribute
    # or pass sparse_optimizer=True where a model exposes it, e.g. DIN):
    # embedding tables and their Adam moments update only batch-touched
    # rows (training/sparse_optim.py) and compose with the device mesh
    sparse_optimizer = False

    @property
    def sparse_tables(self):
        tabs = ["user_embed", "item_embed"]
        if self.feats is not None and self.feats.has_sparse:
            tabs.append("sparse_embed")
        return tuple(t for t in tabs if t in (self.params or {}))

    def touched_indices(self, batch):
        users, items = batch["user"], batch["item"]
        if "item_neg" in batch:
            neg = batch["item_neg"]
            users_all = jnp.concatenate(
                [users, jnp.repeat(users, neg.shape[1])]
            )
            items_all = jnp.concatenate([items, neg.reshape(-1)])
        else:
            users_all, items_all = users, items
        out = {"user_embed": users_all, "item_embed": items_all}
        if self.feats is not None and self.feats.has_sparse:
            out["sparse_embed"] = self.feats.sparse_for(
                users_all, items_all
            ).reshape(-1)
        return out

    # -------------------------------------------------------------- building
    def build_model(self):
        self.feats = FeatureTables(self.data_info)
        rng = jax.random.PRNGKey(self.seed)
        self.params = self._init_params(rng)

    def _init_params(self, rng):
        raise NotImplementedError

    def _forward(self, params, inputs, train, rng):
        """Pure forward: inputs dict with (B,) 'user'/'item' (+ optional
        (B, L) 'seq') -> (B,) logits."""
        raise NotImplementedError

    def batch_extras(self, train_data):
        """Row-aligned extra arrays the BatchGenerator should slice into
        batches (e.g. per-row training sequences). Default: none."""
        return None

    # ------------------------------------------------------- shared compute
    @property
    def n_fields(self):
        """Static field count after multi-sparse combining: user + item +
        sparse fields + dense fields."""
        f_sparse = self.feats.n_sparse_fields
        info = self.feats.multi_sparse_info
        if info is not None and self.multi_sparse_combiner != "normal":
            f_sparse = f_sparse - int(sum(info.field_len)) + len(info.field_len)
        return 2 + f_sparse + self.feats.n_dense_fields

    # set True by the Trainer for the duration of a single-device TPU fit:
    # small-vocab table lookups then route through the MXU one-hot kernels
    # (ops/mxu_gather.py) so their gradient scatter-adds become matmuls —
    # profiled on DIN, the sparse_embed scatter was ~13% of the step
    _mxu_lookup = False

    def _train_lookup(self, table, idx):
        """table[idx], via the MXU kernels when enabled and profitable."""
        from ..ops.mxu_gather import AUTO_MAX_ROWS, table_lookup

        use = self._mxu_lookup and table.shape[0] <= AUTO_MAX_ROWS
        return table_lookup(table, idx, use)

    def _field_embeds(self, params, inputs):
        """inputs dict -> field embedding cube (B, n_fields, D) plus the raw
        sparse indices / dense values used (for linear terms and reg).
        Optional "user_sparse_row"/"user_dense_row" entries override the
        stored feature tables (request-time temporary features)."""
        from ..ops.embeddings import combine_multi_sparse, dense_embeds

        users, items = inputs["user"], inputs["item"]
        fields = [
            params["user_embed"][users][:, None, :],
            params["item_embed"][items][:, None, :],
        ]
        u_sp = inputs.get("user_sparse_row")
        u_ds = inputs.get("user_dense_row")
        sparse_idx, dense_vals = None, None
        if self.feats.has_sparse:
            # "sparse_row_full": complete (B, F) index rows in field order
            # (batched DataFrame prediction, prediction/predict.py analog)
            sparse_idx = inputs.get("sparse_row_full")
            if sparse_idx is None:
                sparse_idx = self.feats.sparse_for(users, items, user_rows=u_sp)
            emb = self._train_lookup(params["sparse_embed"], sparse_idx)
            emb = combine_multi_sparse(
                emb, sparse_idx, self.feats.multi_sparse_info,
                self.multi_sparse_combiner,
            )
            fields.append(emb)
        if self.feats.has_dense:
            dense_vals = inputs.get("dense_row_full")
            if dense_vals is None:
                dense_vals = self.feats.dense_for(users, items, user_rows=u_ds)
            fields.append(dense_embeds(params["dense_embed"], dense_vals))
        return jnp.concatenate(fields, axis=1), sparse_idx, dense_vals

    def _linear_term(self, params, users, items, sparse_idx, dense_vals):
        """First-order term shared by FM / WideDeep wide part."""
        out = params["linear_bias"] + params["linear_user"][users] + params["linear_item"][items]
        if sparse_idx is not None:
            out += jnp.sum(params["linear_sparse"][sparse_idx], axis=1)
        if dense_vals is not None:
            out += dense_vals @ params["linear_dense"]
        return out

    def _init_linear(self, rng, u_rows, i_rows):
        p = {
            "linear_bias": jnp.zeros(()),
            "linear_user": jnp.zeros((u_rows,)),
            "linear_item": jnp.zeros((i_rows,)),
        }
        if self.feats.has_sparse:
            p["linear_sparse"] = jnp.zeros((self._sparse_rows(),))
        if self.feats.has_dense:
            p["linear_dense"] = jnp.zeros((self.feats.n_dense_fields,))
        return p

    def _sparse_rows(self):
        from ..parallel.mesh import aligned_rows

        return aligned_rows(self.feats.sparse_vocab - 1)

    # -------------------------------------------------------------- training
    def loss_fn(self, params, batch, rng):
        users, items, labels, weight = (
            batch["user"], batch["item"], batch["label"], batch["weight"],
        )
        point_loss = mse_loss if self.task == "rating" else (
            bce_loss if self.loss_type == "cross_entropy" else focal_loss
        )
        rng, r1 = jax.random.split(rng)
        if "item_neg" in batch:
            neg = batch["item_neg"]
            S = neg.shape[1]
            inputs = {
                "user": jnp.concatenate([users, jnp.repeat(users, S)]),
                "item": jnp.concatenate([items, neg.reshape(-1)]),
            }
            for key in batch:
                if key.startswith("seq"):
                    if getattr(self, "shared_seq", False):
                        # pos/neg targets share each row's history: pass the
                        # (B, L) seq once; _forward fans targets out over it
                        # (din_attention multi-target form). Halves the seq
                        # gather and its backward scatter-add.
                        inputs[key] = batch[key]
                    else:
                        inputs[key] = jnp.concatenate(
                            [batch[key], jnp.repeat(batch[key], S, axis=0)]
                        )
            labels_all = jnp.concatenate(
                [jnp.ones_like(labels), jnp.zeros(neg.size, labels.dtype)]
            )
            weight_all = jnp.concatenate([weight, jnp.repeat(weight, S)])
        else:
            inputs = {"user": users, "item": items}
            for key in batch:
                if key.startswith("seq"):
                    inputs[key] = batch[key]
            labels_all, weight_all = labels, weight
        logits = self._forward(params, inputs, train=True, rng=r1)
        loss = point_loss(logits, labels_all, weight_all)
        if self.reg:
            loss += self.reg * self._reg_term(params, inputs["user"], inputs["item"])
        return loss

    def _reg_term(self, params, users, items):
        """L2 over the embeddings gathered for this batch."""
        total = 0.0
        n = users.shape[0]
        if "user_embed" in params:
            total += jnp.sum(jnp.square(params["user_embed"][users]))
        if "item_embed" in params:
            total += jnp.sum(jnp.square(params["item_embed"][items]))
        if "sparse_embed" in params and self.feats.has_sparse:
            idx = self.feats.sparse_for(users, items)
            total += jnp.sum(jnp.square(params["sparse_embed"][idx]))
        return total / n

    # ------------------------------------------------------------- inference
    def _sync_feature_tables(self):
        """Re-upload the unique feature tables (and re-bake the jitted
        programs that captured them as constants) after
        DataInfo.assign_user/item_features (reference
        changing_feature_example.py flow)."""
        v = getattr(self.data_info, "feature_version", 0)
        if self.feats is not None and getattr(self.feats, "version", 0) != v:
            from ..ops.features import FeatureTables

            self.feats = FeatureTables(self.data_info)
            self._predict_fn = None
            self._recommend_fn = None

    def _catalog_pair_inputs(self, users, n_users_call, overrides=None,
                             items=None):
        """(U,) users -> flat cross-product inputs (U*n_items rows) for the
        generic pair-loop scorer. Per-user override rows ((U, F) sparse/dense,
        (U, L) seq) are repeated across the catalog ON DEVICE, inside the
        jitted program — XLA fuses the broadcast into the downstream gathers,
        so no (n_items, F) arrays are built host-side or shipped over PCIe.
        ``items``: optional (T,) item-id subset (tiled native serving) —
        defaults to the full catalog."""
        if items is None:
            items = jnp.arange(self.n_items, dtype=jnp.int32)
        n_items = items.shape[0]
        inputs = {
            "user": jnp.repeat(users, n_items),
            "item": jnp.tile(items, n_users_call),
        }
        if overrides:
            for key, val in overrides.items():
                if val is not None and not key.startswith("seq"):
                    inputs[key] = jnp.repeat(val, n_items, axis=0)
        return inputs

    def _catalog_seq(self, users, overrides, key="seq"):
        """Per-user history for a catalog scorer: the (U, L) request-time
        override when present, else the stored recent table gathered on
        device."""
        if overrides and overrides.get(key) is not None:
            return overrides[key]
        table = (self.recent_long_table if key == "seq_long"
                 else self.recent_seq_table)
        return table[users]

    def _ensure_inference_fns(self):
        self._sync_feature_tables()
        if self._predict_fn is None:
            def predict(params, users, items):
                return self._forward(
                    params, {"user": users, "item": items}, train=False, rng=None
                )

            self._predict_fn = jax.jit(predict)

        if self._recommend_fn is None:
            # a transient-OOM-learned chunk cap (`_users_per_call_cap`) is
            # tied to the compiled scorer; recover it whenever the scorer
            # itself is rebuilt (feature updates, load, retrain)
            self.__dict__.pop("_users_per_call_cap", None)
            n_items = self.n_items

            @functools.partial(jax.jit, static_argnums=(2,))
            def score_all(params, users, n_users_call, overrides=None):
                if hasattr(self, "_score_catalog"):
                    # model-provided full-catalog scorer: shares the
                    # target-independent per-user work (e.g. seq-token K/V)
                    # across all items instead of recomputing it per pair
                    return self._score_catalog(
                        params, users, n_users_call, overrides=overrides
                    )
                inputs = self._catalog_pair_inputs(users, n_users_call, overrides)
                logits = self._forward(params, inputs, train=False, rng=None)
                return logits.reshape(n_users_call, n_items)

            self._recommend_fn = score_all

    def predict(self, user, item, inner_id=False, cold_start="average",
                feats=None):
        """``feats``: optional {col: value} overrides for the user side of a
        SINGLE pair (reference `predict_data_with_feats`,
        libreco/prediction/predict.py:95)."""
        if feats is not None:
            self._sync_feature_tables()
            users, items = self.convert_ids(user, item, inner_id)
            assert len(users) == 1, "`feats` prediction supports one pair"
            uid = int(users[0])
            inputs = {
                "user": jnp.asarray(users, jnp.int32),
                "item": jnp.asarray(items, jnp.int32),
            }
            if self.feats.user_sparse is not None:
                row = self.feats.build_user_sparse_row(uid, feats)
                inputs["user_sparse_row"] = jnp.asarray(row, jnp.int32)[None, :]
            if self.feats.user_dense is not None:
                row = self.feats.build_user_dense_row(uid, feats)
                inputs["user_dense_row"] = jnp.asarray(row, jnp.float32)[None, :]
            logit = float(
                np.asarray(self._forward(self.params, inputs, False, None))[0]
            )
            if self.task == "rating":
                return float(np.clip(logit, self.lower_bound, self.upper_bound))
            return float(1.0 / (1.0 + np.exp(-logit)))
        self._ensure_inference_fns()
        users, items = self.convert_ids(user, item, inner_id)
        n = len(users)
        # pad to the next power of two (capped at _PREDICT_CHUNK) so a
        # single-pair serving call compiles a size-1 program instead of
        # paying a full 4096-row forward; jit caches one program per size
        chunk = min(_PREDICT_CHUNK, 1 << max(0, n - 1).bit_length())
        pad = -n % chunk
        users_p = np.pad(users, (0, pad)).astype(np.int32)
        items_p = np.pad(items, (0, pad)).astype(np.int32)
        out = []
        for start in range(0, len(users_p), chunk):
            out.append(
                np.asarray(
                    self._predict_fn(
                        self.params,
                        users_p[start : start + chunk],
                        items_p[start : start + chunk],
                    )
                )
            )
        preds = np.concatenate(out)[:n]
        if self.task == "rating":
            preds = np.clip(preds, self.lower_bound, self.upper_bound)
        else:
            preds = 1.0 / (1.0 + np.exp(-preds))
        return preds[0] if np.isscalar(user) or preds.size == 1 else preds

    def recommend_user(
        self,
        user,
        n_rec,
        inner_id=False,
        cold_start="average",
        filter_consumed=True,
        random_rec=False,
        users_per_call=None,
        user_feats=None,
        seq=None,
    ):
        """``users_per_call=None`` auto-sizes the per-dispatch user chunk:
        start at 64 catalogs per device call (each dispatch costs a full
        host<->device round trip, so small chunks are latency-bound) and
        halve on HBM exhaustion — the catalog scorers materialize
        O(users x n_items x seq) activations, so the fitting chunk depends
        on the model and catalog. The learned cap is remembered on the
        instance."""
        if user_feats is not None or seq is not None:
            return self._recommend_dynamic(
                user, n_rec, inner_id, filter_consumed, user_feats, seq
            )
        self._ensure_inference_fns()
        raw_users = np.atleast_1d(np.asarray(user))
        if cold_start not in ("average", "popular"):
            raise ValueError(f"Unknown cold start strategy: {cold_start}")
        inner_ids = np.empty(len(raw_users), dtype=np.int64)
        popular_mask = np.zeros(len(raw_users), dtype=bool)
        for i, u in enumerate(raw_users):
            if inner_id:
                uid = int(u) if 0 <= int(u) < self.n_users else -1
            else:
                uid = self.data_info.user2id.get(u, -1)
            if uid < 0:
                if cold_start == "popular":
                    popular_mask[i] = True
                inner_ids[i] = self.n_users  # OOV feature row
            else:
                inner_ids[i] = uid

        result = {}
        main_idx = np.nonzero(~popular_mask)[0]
        if users_per_call is not None and users_per_call < 1:
            raise ValueError(f"users_per_call must be >= 1, got {users_per_call}")
        U = (users_per_call if users_per_call is not None
             else getattr(self, "_users_per_call_cap", 64))
        start = 0
        while start < len(main_idx):
            chunk = main_idx[start : start + U]
            uids = inner_ids[chunk]
            # pad the tail chunk to the next power of two, not the full
            # chunk size: a single-user request then scores 1 catalog, not
            # users_per_call of them (bounded set of compiled variants)
            u_call = 1 << (len(uids) - 1).bit_length()
            uids_p = np.pad(uids, (0, u_call - len(uids))).astype(np.int32)
            try:
                scores = self._recommend_fn(self.params, uids_p, u_call)
                scores = jax.block_until_ready(scores)  # surface exec OOM here
            except Exception as exc:  # noqa: BLE001 — OOM backoff only
                msg = str(exc)
                oom = ("RESOURCE_EXHAUSTED" in msg or "exceed memory" in msg
                       or "Out of memory" in msg)
                if oom and U > 1:
                    U = max(1, u_call // 2)
                    self._users_per_call_cap = U
                    continue
                raise
            if random_rec:
                from ..recommendation.ranking import rank_recommendations

                ids = rank_recommendations(
                    self.task,
                    uids,
                    np.asarray(scores)[: len(uids)],
                    n_rec,
                    self.n_items,
                    self.user_consumed,
                    filter_consumed=filter_consumed,
                    random_rec=True,
                    np_rng=self.data_info.np_rng,
                )
            else:
                consumed = (
                    pad_consumed(self.user_consumed, uids_p,
                                 n_rec=int(n_rec), n_items=self.n_items)
                    if filter_consumed else None
                )
                ids, _ = topk_from_scores(scores, consumed, int(n_rec))
                ids = np.asarray(ids)[: len(uids)]
            for r, i in enumerate(chunk):
                result[_key(raw_users[i])] = ids[r]
            start += len(chunk)
        for i in np.nonzero(popular_mask)[0]:
            result[_key(raw_users[i])] = popular_recommendations(
                self.data_info, inner_id=True, n_rec=n_rec
            )
        return self.finalize_rec(result, raw_users, inner_id)

    def _recommend_dynamic(self, user, n_rec, inner_id, filter_consumed,
                           user_feats, seq):
        """Score the catalog for one or MORE users with request-time
        feature/sequence overrides (reference recommend_tf_feat with
        user_feats/seq, recommendation/preprocess.py:38,110 — which limits
        dynamic feats to a single user, recommend.py:39; lifted here).

        ``user_feats``: one dict applied to every user, or a list of dicts
        (one per user). ``seq``: one item list shared by every user, or a
        list of per-user lists."""
        self._sync_feature_tables()
        users = np.atleast_1d(np.asarray(user))
        U = len(users)

        def _per_user(val):
            if val is None:
                return [None] * U
            if isinstance(val, dict):
                return [val] * U
            if isinstance(val, (list, tuple)) and U > 1:
                if len(val) != U:
                    raise ValueError(
                        f"per-user overrides need one entry per user: got "
                        f"{len(val)} for {U} users"
                    )
                return list(val)
            return [val] * U if U > 1 else [val]

        feats_list = _per_user(user_feats)
        if seq is not None and U > 1:
            # list-of-lists = per-user sequences; flat list = shared
            if not (isinstance(seq, (list, tuple))
                    and seq and isinstance(seq[0], (list, tuple, np.ndarray))):
                seq = [seq] * U
            elif len(seq) != U:
                raise ValueError(
                    f"per-user seq needs one list per user: got {len(seq)} "
                    f"for {U} users"
                )
        seq_list = [seq] * U if U == 1 else (seq if seq is not None else [None] * U)

        uids = np.empty(U, np.int64)
        for i, u in enumerate(users):
            if inner_id:
                uids[i] = int(u) if 0 <= int(u) < self.n_users else self.n_users
            else:
                uids[i] = self.data_info.user2id.get(u, self.n_users)

        # ---- per-user override rows, (U, F)/(U, L) — NEVER tiled to the
        # catalog: the jitted scorers broadcast them over items on device
        # (catalog scorers share each user's seq/feature work across items)
        self._ensure_inference_fns()
        overrides = {}
        if any(f is not None for f in feats_list):
            if self.feats.user_sparse is not None:
                rows = np.stack([
                    self.feats.build_user_sparse_row(int(uids[i]), feats_list[i])
                    if feats_list[i] is not None
                    else np.asarray(self.data_info.user_sparse_unique)[int(uids[i])]
                    for i in range(U)
                ])
                overrides["user_sparse_row"] = rows.astype(np.int32)
            if self.feats.user_dense is not None:
                rows = np.stack([
                    self.feats.build_user_dense_row(int(uids[i]), feats_list[i])
                    if feats_list[i] is not None
                    else np.asarray(self.data_info.user_dense_unique)[int(uids[i])]
                    for i in range(U)
                ])
                overrides["user_dense_row"] = rows.astype(np.float32)
        if any(s is not None for s in seq_list):
            overrides.update(self._request_seq_overrides(uids, seq_list, inner_id))

        n_items = self.n_items
        all_scores = np.empty((U, n_items), np.float32)
        cap = getattr(self, "_users_per_call_cap", 64)
        start = 0
        while start < U:
            uids_chunk = uids[start : start + cap]
            u_call = 1 << (len(uids_chunk) - 1).bit_length()
            pad = u_call - len(uids_chunk)
            uids_p = np.pad(uids_chunk, (0, pad)).astype(np.int32)
            ov = {
                k: jnp.asarray(np.pad(v[start : start + cap],
                                      [(0, pad)] + [(0, 0)] * (v.ndim - 1)))
                for k, v in overrides.items()
            }
            try:
                scores = self._recommend_fn(self.params, jnp.asarray(uids_p),
                                            u_call, ov)
                scores = jax.block_until_ready(scores)
            except Exception as exc:  # noqa: BLE001 — OOM backoff only
                msg = str(exc)
                oom = ("RESOURCE_EXHAUSTED" in msg or "exceed memory" in msg
                       or "Out of memory" in msg)
                if oom and cap > 1:
                    cap = max(1, u_call // 2)
                    self._users_per_call_cap = cap
                    continue
                raise
            all_scores[start : start + len(uids_chunk)] = (
                np.asarray(scores)[: len(uids_chunk)]
            )
            start += len(uids_chunk)
        consumed = (
            pad_consumed(self.user_consumed, uids,
                         n_rec=int(n_rec), n_items=self.n_items)
            if filter_consumed else None
        )
        ids, _ = topk_from_scores(jnp.asarray(all_scores), consumed, int(n_rec))
        ids = np.asarray(ids)
        result = {_key(users[i]): ids[i] for i in range(U)}
        return self.finalize_rec(result, users, inner_id)

    def _request_seq_overrides(self, uids, seq_list, inner_id):
        """Per-user request seqs -> {"seq": (U, L)} override array; users
        with no request seq fall back to their stored recent history.
        Dual-seq models (SIM) override this to split long/short windows.
        Non-sequence models ignore request seqs (reference recommend_tf_feat
        silently drops `seq` for models without a behavior sequence)."""
        if getattr(self, "recent_seq_table", None) is None:
            return {}
        rows = []
        table = None
        for i, s in enumerate(seq_list):
            if s is None:
                if table is None:
                    table = np.asarray(self.recent_seq_table)
                rows.append(table[int(uids[i])])
            else:
                rows.append(self._convert_request_seq(s, inner_id))
        return {"seq": np.stack(rows).astype(np.int32)}

    def _convert_request_seq(self, seq, inner_id, max_len=None):
        """Raw item list -> right-aligned padded inner-id array."""
        L = max_len or getattr(self, "max_seq_len", len(seq))
        if inner_id:
            ids = [int(i) for i in seq if 0 <= int(i) < self.n_items]
        else:
            ids = [
                self.data_info.item2id[i] for i in seq
                if i in self.data_info.item2id
            ]
        ids = ids[-L:]
        out = np.full(L, self.n_items, np.int64)
        if ids:
            out[L - len(ids):] = ids
        return out

    def _default_rec_source(self, num):
        """Cold 'average': score the catalog through the OOV feature row."""
        self._ensure_inference_fns()
        uids = np.full((1,), self.n_users, np.int32)
        scores = np.asarray(self._recommend_fn(self.params, uids, 1))[0]
        top = np.argsort(-scores)[: min(num, self.n_items)]
        return top

    def post_fit(self):
        # inference scorers trace WITHOUT the training-time MXU lookups
        # (catalog scoring gathers contiguous id ranges — plain gathers win)
        self._mxu_lookup = False
        self._predict_fn = None
        self._recommend_fn = None
        self.build_default_recs()

    def post_load(self):
        self.build_model_shell()

    def build_model_shell(self):
        """Rebuild static state (feature tables) without touching params."""
        self.feats = FeatureTables(self.data_info)


def _key(u):
    return u.item() if isinstance(u, np.generic) else u

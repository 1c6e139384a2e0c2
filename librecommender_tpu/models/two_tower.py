"""TwoTower: dual-encoder retrieval with in-batch softmax.

Reference parity: libreco/algorithms/two_tower.py:13 — user/item feature
towers; losses: cross_entropy / max_margin / in-batch `softmax` with
log-popularity correction, temperature (fixed or learnable) and
accidental-hit removal, and the SSL contrastive branch (two_tower.py:189;
ours in `_ssl_loss` below, wired into the training loss). Post-fit both
towers are exported as embeddings, so serving is a dot product + top-k.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..bases.embed_base import EmbedBase
from ..ops.features import FeatureTables
from ..ops.initializers import truncated_normal
from ..ops.losses import (
    bce_loss,
    max_margin_loss,
    softmax_cross_entropy_loss,
)
from ..ops.nn import init_mlp, l2_normalize, mlp
from ..parallel.mesh import aligned_rows

_TOWER_CHUNK = 1024


class TwoTower(EmbedBase):
    def __init__(
        self,
        task,
        data_info,
        loss_type="softmax",
        embed_size=16,
        norm_embed=False,
        n_epochs=20,
        lr=0.001,
        lr_decay=False,
        epsilon=1e-5,
        reg=None,
        batch_size=256,
        sampler="random",
        num_neg=1,
        use_bn=True,
        dropout_rate=None,
        hidden_units=(128, 64, 32),
        margin=1.0,
        use_correction=True,
        temperature=1.0,
        remove_accidental_hits=False,  # reference default (two_tower.py:134)
        ssl_pattern=None,
        ssl_alpha=0.2,
        ssl_temperature=0.1,
        alpha=None,  # reference name for ssl_alpha (two_tower.py:84)
        multi_sparse_combiner="sqrtn",
        sparse_optimizer=False,
        compute_dtype="f32",
        seed=42,
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        if task != "ranking":
            raise ValueError("TwoTower is only suitable for ranking")
        assert loss_type in ("cross_entropy", "max_margin", "softmax")
        super().__init__(task, data_info, embed_size, None, seed)
        self.loss_type = loss_type
        self.norm_embed = norm_embed
        # compute_dtype="bf16" runs the tower MLPs in bf16 with f32
        # outputs. Measured at the bench config (D=64, hidden 128/64/32,
        # B=8192): bf16 is ~4% SLOWER — the matmuls are too skinny for the
        # MXU either way and the casts add VPU work — so f32 is the
        # default; the knob pays off at wider towers.
        if compute_dtype not in ("bf16", "f32", None):
            raise ValueError("compute_dtype must be 'bf16', 'f32' or None")
        self.compute_dtype = compute_dtype or "f32"
        self.n_epochs = n_epochs
        self.lr = lr
        self.lr_decay = lr_decay
        self.epsilon = epsilon
        self.reg = reg
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_neg = num_neg
        self.use_bn = use_bn
        self.dropout_rate = dropout_rate or 0.0
        self.hidden_units = tuple(hidden_units)
        self.use_correction = use_correction
        self.temperature = temperature
        self.remove_accidental_hits = remove_accidental_hits
        if ssl_pattern is not None:
            assert ssl_pattern in ("rfm", "rfm-complementary", "cfm"), ssl_pattern
            assert loss_type == "softmax", "SSL requires softmax loss"
        self.ssl_pattern = ssl_pattern
        self.ssl_alpha = ssl_alpha if alpha is None else alpha
        self.ssl_temperature = ssl_temperature
        self.margin = margin
        # touched-rows LazyAdam over the id/feature tables (same contract as
        # the feat family: sparse_tables + touched_indices)
        self.sparse_optimizer = sparse_optimizer
        self.multi_sparse_combiner = multi_sparse_combiner
        self.feats = None
        self.item_probs = None
        if loss_type == "softmax":
            self.paradigm = "listwise"
        elif loss_type == "max_margin":
            self.paradigm = "pairwise"

    # ------------------------------------------------------------- building
    def build_model(self):
        self.feats = FeatureTables(self.data_info)
        counts = np.ones(self.n_items, np.float64)
        for i, users in self.data_info.item_consumed.items():
            counts[int(i)] += len(set(users))
        self.item_probs = jnp.asarray(counts / counts.sum(), jnp.float32)
        if self.ssl_pattern is not None:
            self._build_ssl_state()
        rng = jax.random.PRNGKey(self.seed)
        self.params = self._init_params(rng)

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
            users_all = jnp.concatenate([users, jnp.repeat(users, neg.shape[1])])
            items_all = jnp.concatenate([items, neg.reshape(-1)])
        else:
            users_all, items_all = users, items
        out = {"user_embed": users_all, "item_embed": items_all}
        if self.feats is not None and self.feats.has_sparse:
            rows = self.feats.sparse_for(users_all, items_all).reshape(-1)
            if self.ssl_pattern is not None:
                # SSL masked views embed per-field OOV rows every step
                rows = jnp.concatenate([rows, self.item_field_oov])
            out["sparse_embed"] = rows
        return out

    def _build_ssl_state(self):
        """Per-item-field OOV indices + (for cfm) mutual-information field
        ordering (reference feature/ssl.py:6,43)."""
        feats = self.feats
        positions = feats.item_sparse_pos
        assert positions, "SSL requires item sparse features"
        self.item_field_oov = jnp.asarray(
            np.asarray(self.data_info.sparse_oov)[positions], jnp.int32
        )
        if self.ssl_pattern == "cfm":
            from sklearn.metrics import mutual_info_score

            table = np.asarray(self.data_info.item_sparse_unique)[:, : len(positions)]
            F = len(positions)
            mi = np.zeros((F, F))
            for a in range(F):
                for b in range(F):
                    if a != b:
                        mi[a, b] = mutual_info_score(table[:, a], table[:, b])
            # for each seed field: other fields ordered by MI desc
            self.cfm_order = jnp.asarray(
                np.argsort(-mi, axis=1).astype(np.int32)
            )

    def _side_ms_info(self, is_user):
        """Multi-sparse group info remapped to this tower's local field
        order, so groups pool INSIDE the tower (reference
        libreco/tfops/features.py:47,90 used by two_tower.py)."""
        from ..data.data_info import MultiSparseInfo

        feats = self.feats
        info = feats.multi_sparse_info
        if info is None or self.multi_sparse_combiner == "normal":
            return None
        pos = feats.user_sparse_pos if is_user else feats.item_sparse_pos
        pos_to_local = {p: j for j, p in enumerate(pos)}
        offs, lens, oovs = [], [], []
        for g, (o, ln) in enumerate(zip(info.field_offset, info.field_len)):
            if o in pos_to_local:
                # group members are contiguous in full field order and all
                # on one side, so local indices stay consecutive
                assert all(o + t in pos_to_local for t in range(ln))
                offs.append(pos_to_local[o])
                lens.append(ln)
                oovs.append(np.asarray(info.feat_oov)[g])
        if not offs:
            return None
        return MultiSparseInfo(offs, lens, np.asarray(oovs), info.pad_val)

    def _n_tower_fields(self, is_user):
        feats = self.feats
        n_sp = len(feats.user_sparse_pos if is_user else feats.item_sparse_pos)
        side_info = self._side_ms_info(is_user)
        if side_info is not None:
            n_sp = n_sp - int(sum(side_info.field_len)) + len(side_info.field_len)
        n_d = len(feats.user_dense_pos if is_user else feats.item_dense_pos)
        return 1 + n_sp + n_d

    def _init_params(self, rng):
        D = self.embed_size
        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        r = jax.random.split(rng, 7)
        params = {
            "user_embed": truncated_normal(r[0], (u_rows, D)),
            "item_embed": truncated_normal(r[1], (i_rows, D)),
        }
        if self.feats.has_sparse:
            sp_rows = aligned_rows(self.feats.sparse_vocab - 1)
            params["sparse_embed"] = truncated_normal(r[2], (sp_rows, D))
        if self.feats.has_dense:
            params["dense_embed"] = truncated_normal(
                r[3], (self.feats.n_dense_fields, D)
            )
        # tower output dim = hidden_units[-1], NO extra embed_size
        # projection — matching the reference dense_nn towers
        # (two_tower.py:400-410); an earlier extra [D] tail both deepened
        # the net and bottlenecked it to embed_size, measured -0.026 AUC
        # vs the reference at the 5-epoch parity config
        params["user_mlp"] = init_mlp(
            r[4], self._n_tower_fields(True) * D, list(self.hidden_units),
            use_ln=self.use_bn,
        )
        params["item_mlp"] = init_mlp(
            r[5], self._n_tower_fields(False) * D, list(self.hidden_units),
            use_ln=self.use_bn,
        )
        return params

    # --------------------------------------------------------------- towers
    def user_tower(self, params, users, train=False, rng=None,
                   sparse_rows=None, dense_rows=None):
        """``sparse_rows``/``dense_rows``: optional (B, F) overrides of the
        stored user feature tables (request-time features — the reference
        UserEmbedModels online path)."""
        from ..ops.embeddings import combine_multi_sparse

        feats = self.feats
        pieces = [params["user_embed"][users]]
        if feats.user_sparse is not None:
            idx = feats.user_sparse[users] if sparse_rows is None \
                else sparse_rows                               # (B, F_u)
            emb = combine_multi_sparse(
                params["sparse_embed"][idx], idx,
                self._side_ms_info(True), self.multi_sparse_combiner,
            )
            pieces.append(emb.reshape(idx.shape[0], -1))
        if feats.user_dense is not None:
            vals = feats.user_dense[users] if dense_rows is None \
                else dense_rows                                # (B, F_ud)
            emb = params["dense_embed"][jnp.asarray(feats.user_dense_pos)]
            pieces.append((vals[:, :, None] * emb[None]).reshape(vals.shape[0], -1))
        x = jnp.concatenate(pieces, axis=1)
        mlp_params = params["user_mlp"]
        if self.compute_dtype == "bf16":
            x = x.astype(jnp.bfloat16)
            mlp_params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16), mlp_params
            )
        out = mlp(mlp_params, x, dropout_rate=self.dropout_rate,
                  train=train, rng=rng,
                  final_activation=False).astype(jnp.float32)
        return l2_normalize(out) if self.norm_embed else out

    def item_tower(self, params, items, train=False, rng=None, sparse_rows=None):
        from ..ops.embeddings import combine_multi_sparse

        feats = self.feats
        pieces = [params["item_embed"][items]]
        if feats.item_sparse is not None:
            idx = feats.item_sparse[items] if sparse_rows is None else sparse_rows
            emb = combine_multi_sparse(
                params["sparse_embed"][idx], idx,
                self._side_ms_info(False), self.multi_sparse_combiner,
            )
            pieces.append(emb.reshape(idx.shape[0], -1))
        if feats.item_dense is not None:
            vals = feats.item_dense[items]
            emb = params["dense_embed"][jnp.asarray(feats.item_dense_pos)]
            pieces.append((vals[:, :, None] * emb[None]).reshape(vals.shape[0], -1))
        x = jnp.concatenate(pieces, axis=1)
        mlp_params = params["item_mlp"]
        if self.compute_dtype == "bf16":
            x = x.astype(jnp.bfloat16)
            mlp_params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16), mlp_params
            )
        out = mlp(mlp_params, x, dropout_rate=self.dropout_rate,
                  train=train, rng=rng,
                  final_activation=False).astype(jnp.float32)
        return l2_normalize(out) if self.norm_embed else out

    # ------------------------------------------------------------- training
    def loss_fn(self, params, batch, rng):
        users, items, weight = batch["user"], batch["item"], batch["weight"]
        r1, r2 = jax.random.split(rng)
        u = self.user_tower(params, users, train=True, rng=r1)
        if self.loss_type == "softmax":
            v = self.item_tower(params, items, train=True, rng=r2)
            loss = softmax_cross_entropy_loss(
                u,
                v,
                weight=weight,
                item_ids=items,
                correction_probs=(
                    self.item_probs[items] if self.use_correction else None
                ),
                temperature=self.temperature,
                remove_accidental_hits=self.remove_accidental_hits,
            )
            if self.ssl_pattern is not None:
                loss += self.ssl_alpha * self._ssl_term(params, items, rng)
            return loss
        neg = batch["item_neg"]                                # (B, S)
        S = neg.shape[1]
        v_pos = self.item_tower(params, items, train=True, rng=r2)
        v_neg = self.item_tower(params, neg.reshape(-1), train=True, rng=r2)
        pos_scores = jnp.sum(u * v_pos, axis=1)
        neg_scores = jnp.sum(
            jnp.repeat(u, S, axis=0) * v_neg, axis=1
        )
        if self.loss_type == "max_margin":
            return max_margin_loss(
                jnp.repeat(pos_scores, S), neg_scores,
                jnp.repeat(weight, S), margin=self.margin,
            )
        logits = jnp.concatenate([pos_scores, neg_scores])
        labels = jnp.concatenate(
            [jnp.ones_like(pos_scores), jnp.zeros_like(neg_scores)]
        )
        w = jnp.concatenate([weight, jnp.repeat(weight, S)])
        return bce_loss(logits, labels, w)

    def _ssl_term(self, params, items, rng):
        """Contrastive loss between two masked item-feature views
        (reference two_tower.py:189-203, feature/ssl.py)."""
        from ..ops.losses import ssl_loss

        feats = self.feats
        idx = feats.item_sparse[items]                          # (B, F)
        F = idx.shape[1]
        half = F // 2 if F > 1 else 1
        r1, r2, r3 = jax.random.split(rng, 3)
        if self.ssl_pattern == "cfm":
            seed_field = jax.random.randint(r1, (), 0, F)
            order = self.cfm_order[seed_field]                  # fields by MI
            in_view1 = jnp.zeros((F,), bool).at[order[:half]].set(True)
            in_view1 = in_view1.at[seed_field].set(True)
        else:
            perm = jax.random.permutation(r1, F)
            in_view1 = jnp.zeros((F,), bool).at[perm[:half]].set(True)
        if self.ssl_pattern == "rfm":
            perm2 = jax.random.permutation(r2, F)
            in_view2 = jnp.zeros((F,), bool).at[perm2[:half]].set(True)
        else:  # complementary masking
            in_view2 = ~in_view1
        oov = self.item_field_oov[None, :]
        view1 = jnp.where(in_view1[None, :], oov, idx)
        view2 = jnp.where(in_view2[None, :], oov, idx)
        v1 = self.item_tower(params, items, train=True, rng=r3, sparse_rows=view1)
        v2 = self.item_tower(params, items, train=True, rng=r3, sparse_rows=view2)
        return ssl_loss(v1, v2, temperature=self.ssl_temperature)

    # ----------------------------------------------------------- embeddings
    def set_embeddings(self):
        u_fn = jax.jit(lambda p, u: self.user_tower(p, u))
        i_fn = jax.jit(lambda p, i: self.item_tower(p, i))
        self.user_embeds_np = self._append_oov(
            _batched_tower(u_fn, self.params, self.n_users)
        )
        self.item_embeds_np = self._append_oov(
            _batched_tower(i_fn, self.params, self.n_items)
        )

    def dyn_user_embedding(self, user, user_feats=None, inner_id=False):
        """Embed a user with optionally overridden features at request time
        (reference DynEmbedBase.dyn_user_embedding) — stateless: the
        override row is built per request, no table mutation."""
        uid = (
            int(user) if inner_id else self.data_info.user2id.get(user, self.n_users)
        )
        users = jnp.asarray(np.full((1,), uid, np.int32))
        kw = {}
        if user_feats:
            if self.feats.user_sparse is not None:
                row = self.feats.build_user_sparse_row(uid, user_feats)
                kw["sparse_rows"] = jnp.asarray(row, jnp.int32)[None, :]
            if self.feats.user_dense is not None:
                row = self.feats.build_user_dense_row(uid, user_feats)
                kw["dense_rows"] = jnp.asarray(row, jnp.float32)[None, :]
        return np.asarray(self.user_tower(self.params, users, **kw))[0]

    def recommend_user(self, user, n_rec, inner_id=False,
                       cold_start="average", filter_consumed=True,
                       random_rec=False, user_feats=None):
        """EmbedBase recommend plus request-time ``user_feats`` (reference
        recommend_tf_feat on UserEmbedModels): with overrides, the user
        vector is recomputed through the tower and ranked against the
        exported item embeddings."""
        if user_feats is None:
            return super().recommend_user(
                user, n_rec, inner_id=inner_id, cold_start=cold_start,
                filter_consumed=filter_consumed, random_rec=random_rec,
            )
        if cold_start not in ("average", "popular"):
            raise ValueError(f"Unknown cold start strategy: {cold_start}")
        from ..ops.topk import pad_consumed, topk_from_scores
        from ..recommendation.cold_start import popular_recommendations
        from ..recommendation.ranking import rank_recommendations

        users = np.atleast_1d(np.asarray(user))

        def _uid(u):
            if inner_id:
                return int(u) if 0 <= int(u) < self.n_users else -1
            return self.data_info.user2id.get(u, -1)

        raw_uids = np.asarray([_uid(u) for u in users], np.int64)
        # unknown users: "popular" bypasses the tower entirely (base
        # recommend_user contract); "average" routes them through the
        # OOV params row with the override feats applied
        popular_mask = (raw_uids < 0) & (cold_start == "popular")
        uids = np.where(raw_uids < 0, self.n_users, raw_uids)
        result = {}
        main_idx = np.nonzero(~popular_mask)[0]
        if main_idx.size > 0:
            m_uids = uids[main_idx]
            vecs = np.stack([
                self.dyn_user_embedding(int(uid), user_feats, inner_id=True)
                for uid in m_uids
            ])
            scores = vecs @ self.item_embeds_np[: self.n_items].T
            if random_rec:
                ids = rank_recommendations(
                    self.task, m_uids, scores, n_rec, self.n_items,
                    self.user_consumed, filter_consumed=filter_consumed,
                    random_rec=True, np_rng=self.data_info.np_rng,
                )
            else:
                consumed = (
                    pad_consumed(self.user_consumed, m_uids,
                                 n_rec=int(n_rec), n_items=self.n_items)
                    if filter_consumed else None
                )
                ids, _ = topk_from_scores(
                    jnp.asarray(scores), consumed, int(n_rec)
                )
                ids = np.asarray(ids)
            for row, i in enumerate(main_idx):
                u = users[i]
                key = u.item() if isinstance(u, np.generic) else u
                result[key] = ids[row]
        for i in np.nonzero(popular_mask)[0]:
            u = users[i]
            key = u.item() if isinstance(u, np.generic) else u
            result[key] = popular_recommendations(
                self.data_info, inner_id=True, n_rec=n_rec
            )
        return self.finalize_rec(result, users, inner_id)

    def post_load(self):
        self.feats = FeatureTables(self.data_info)
        counts = np.ones(self.n_items, np.float64)
        for i, users in self.data_info.item_consumed.items():
            counts[int(i)] += len(set(users))
        self.item_probs = jnp.asarray(counts / counts.sum(), jnp.float32)
        if self.ssl_pattern is not None:
            self._build_ssl_state()
        if self.params is not None:
            self.set_embeddings()


def _batched_tower(fn, params, n, chunk=_TOWER_CHUNK):
    out = []
    ids = np.arange(n, dtype=np.int32)
    for start in range(0, n, chunk):
        part = ids[start : start + chunk]
        pad = chunk - len(part)
        part_p = np.pad(part, (0, pad))
        res = np.asarray(fn(params, jnp.asarray(part_p)))
        out.append(res[: len(part)])
    return np.concatenate(out).astype(np.float32)

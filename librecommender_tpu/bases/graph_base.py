"""Base for full-graph GNN embedding models (LightGCN / NGCF / GraphSage /
PinSage).

Replaces the reference's SageBase + GraphTrainer + DGL stack
(libreco/bases/sage_base.py:15, training/torch_trainer.py:164,
graph/from_dgl.py) with one pattern: a pure ``_propagate(params, rng, train)``
producing full (user_out, item_out) matrices each step — exactly the
reference's full-graph torch forward (torch_modules/lightgcn_module.py:36-62)
— with per-batch indexing for the loss. Propagation is gather + segment_sum
over static edge arrays: XLA fuses this into efficient scatter adds, and the
(rows, D) matrices stay in HBM.

The graph family defaults to Adam epsilon=1e-8 — the reference's torch
models use torch Adam's default (libreco/algorithms/lightgcn.py:82,
ngcf.py:84, graphsage.py:121, pinsage.py:125), unlike its TF family's 1e-5
(tfops/configs.py). At init scale 0.1 the second moments are small enough
that 1e-5 visibly damps the effective step (measured on the 1M synthetic:
LightGCN AUC 0.598 @eps 1e-5 vs reference 0.681 at identical configs).
"""
import jax
import jax.numpy as jnp
import numpy as np

from .embed_base import EmbedBase
from ..ops.losses import bce_loss, bpr_loss, focal_loss, max_margin_loss


class GraphEmbedBase(EmbedBase):
    def __init__(
        self,
        task,
        data_info,
        loss_type,
        embed_size,
        lower_upper_bound=None,
        seed=42,
    ):
        super().__init__(task, data_info, embed_size, lower_upper_bound, seed)
        if loss_type not in ("cross_entropy", "focal", "bpr", "max_margin"):
            raise ValueError(f"unknown loss_type for graph model: {loss_type}")
        self.loss_type = loss_type
        if loss_type in ("bpr", "max_margin"):
            self.paradigm = "pairwise"

    def _margin_loss(self, pos, neg, w):
        """max_margin with the model's configured margin (reference torch
        graph models' ``margin`` kwarg, e.g. libreco/algorithms/lightgcn.py)."""
        return max_margin_loss(pos, neg, w, margin=getattr(self, "margin", 1.0))

    def _propagate(self, params, rng, train):
        """-> (user_out (u_rows, D'), item_out (i_rows, D'))."""
        raise NotImplementedError

    # ---- reference-style node features (SAGE family) --------------------
    # GraphSageModelBase.get_raw_features (torch_modules/
    # graphsage_module.py:54-79): a node's level-0 representation is
    # proj(concat([sparse-field embeds, dense-field embeds, id embed])).
    # Models opt in by calling _init_node_feats from _init_params and
    # _node_base from _propagate.
    def _init_node_feats(self, rng, params):
        from ..ops.features import FeatureTables
        from ..ops.initializers import truncated_normal
        from ..ops.nn import init_dense

        di = self.data_info
        has = bool(len(di.sparse_col.name) or len(di.dense_col.name))
        self.feats = FeatureTables(di) if has else None
        if self.feats is None:
            return params
        D = self.embed_size
        r = jax.random.split(rng, 4)
        if self.feats.has_sparse:
            params["sparse_embed"] = truncated_normal(
                r[0], (self.feats.sparse_vocab, D)
            )
        if self.feats.has_dense:
            params["dense_embed"] = truncated_normal(
                r[1], (self.feats.n_dense_fields, D)
            )
        fu = 1 + len(self.feats.user_sparse_pos) + len(self.feats.user_dense_pos)
        fi = 1 + len(self.feats.item_sparse_pos) + len(self.feats.item_dense_pos)
        if getattr(self, "graph_paradigm", "u2i") == "u2i":
            params["user_feat_proj"] = init_dense(r[2], fu * D, D)
        params["item_feat_proj"] = init_dense(r[3], fi * D, D)
        return params

    def _node_base(self, params, which):
        """(n_rows_aligned, D) level-0 node representations: the id
        embedding when the dataset has no features, else the reference's
        projected concat of field embeds + id embed."""
        from ..ops.nn import dense as dense_op

        key = "user_embed" if which == "user" else "item_embed"
        base = params[key]
        if getattr(self, "feats", None) is None:
            # a LOADED model skips _init_params: rebuild the feature
            # tables when the saved params carry the projection weights
            if "item_feat_proj" in params:
                from ..ops.features import FeatureTables

                self.feats = FeatureTables(self.data_info)
            else:
                return base
        f = self.feats
        n = self.n_users if which == "user" else self.n_items
        parts = []
        if f.has_sparse:
            tab = f.user_sparse if which == "user" else f.item_sparse
            if tab is not None:
                rows = params["sparse_embed"][tab[:n]]      # (n, F_s, D)
                parts.append(rows.reshape(n, -1))
        if f.has_dense:
            vals = f.user_dense if which == "user" else f.item_dense
            pos = f.user_dense_pos if which == "user" else f.item_dense_pos
            if vals is not None and pos:
                dvec = params["dense_embed"][jnp.asarray(pos)]  # (F_d, D)
                parts.append(
                    (vals[:n, :, None] * dvec[None]).reshape(n, -1)
                )
        parts.append(base[:n])
        proj_key = "user_feat_proj" if which == "user" else "item_feat_proj"
        if proj_key not in params:
            return base
        out = dense_op(params[proj_key], jnp.concatenate(parts, axis=1))
        return jnp.zeros_like(base[:, : out.shape[1]]).at[:n].set(out)

    def _init_params(self, rng):
        raise NotImplementedError

    def build_model(self):
        rng = jax.random.PRNGKey(self.seed)
        self.params = self._init_params(rng)

    def _i2i_loss(self, params, batch, rng):
        """Item-to-item training: walk pairs + negatives drawn in-kernel.

        Reference: GraphCollator's i2i branch (libreco/batch/collators.py:
        348-361) — start nodes (uniform or inverse-popularity), bipartite
        random-walk positive pairs, negatives excluding anchor AND positive.
        Here the walks run on device over the padded neighbor tables
        (graph/walks.py) so every step draws fresh pairs without host work;
        pairs the reference would skip carry zero weight instead.
        """
        from ..graph.walks import i2i_negatives, walk_pairs

        weight = batch["weight"]
        b = weight.shape[0]
        rng, r_start, r_walk, r_neg, r_prop = jax.random.split(rng, 5)
        if self.start_node == "unpopular":
            start = jax.random.categorical(
                r_start, self._start_logits, shape=(b,)
            ).astype(jnp.int32)
        else:
            start = jax.random.randint(r_start, (b,), 0, self.n_items)
        anchors, positives, valid = walk_pairs(
            r_walk, start, self.item_nbr, self.item_deg,
            self.user_nbr, self.user_deg,
            self.num_walks, self.sample_walk_len, self.focus_start,
        )
        w = jnp.repeat(weight, self.num_walks * self.sample_walk_len) * valid
        neg = i2i_negatives(r_neg, self.n_items, anchors, positives,
                            self.num_neg,
                            logits=getattr(self, "_neg_logits", None),
                            out_batch=self.sampler == "out-batch")
        _, item_out = self._propagate(params, r_prop, True)
        a = item_out[anchors]
        p = item_out[positives]
        n = item_out[neg]  # (P, S, D)
        s = self.num_neg
        pos_scores = jnp.sum(a * p, axis=1)
        neg_scores = jnp.einsum("pd,psd->ps", a, n)
        if self.loss_type in ("bpr", "max_margin"):
            pair_loss = bpr_loss if self.loss_type == "bpr" else self._margin_loss
            loss = pair_loss(
                jnp.repeat(pos_scores[:, None], s, axis=1).reshape(-1),
                neg_scores.reshape(-1),
                jnp.repeat(w[:, None], s, axis=1).reshape(-1),
            )
        else:
            logits = jnp.concatenate([pos_scores, neg_scores.reshape(-1)])
            labels = jnp.concatenate(
                [jnp.ones_like(pos_scores), jnp.zeros(neg_scores.size)]
            )
            w_all = jnp.concatenate(
                [w, jnp.repeat(w[:, None], s, axis=1).reshape(-1)]
            )
            point_loss = (
                bce_loss if self.loss_type == "cross_entropy" else focal_loss
            )
            loss = point_loss(logits, labels, w_all)
        if getattr(self, "reg", None):
            loss += self.reg * sum(
                jnp.sum(jnp.square(e)) for e in (a, p, n)
            ) / anchors.shape[0]
        return loss

    def loss_fn(self, params, batch, rng):
        if getattr(self, "graph_paradigm", "u2i") == "i2i":
            return self._i2i_loss(params, batch, rng)
        users, items, labels, weight = (
            batch["user"], batch["item"], batch["label"], batch["weight"],
        )
        rng, r1 = jax.random.split(rng)
        user_out, item_out = self._propagate(params, r1, True)
        u = user_out[users]
        if self.paradigm == "pairwise":
            neg = batch["item_neg"]
            S = neg.shape[1]
            pos_scores = jnp.sum(u * item_out[items], axis=1)
            neg_scores = jnp.einsum("bd,bsd->bs", u, item_out[neg])
            pair_loss = bpr_loss if self.loss_type == "bpr" else self._margin_loss
            loss = pair_loss(
                jnp.repeat(pos_scores[:, None], S, axis=1).reshape(-1),
                neg_scores.reshape(-1),
                jnp.repeat(weight[:, None], S, axis=1).reshape(-1),
            )
            reg_embeds = (u, item_out[items], item_out[neg])
        else:
            if "item_neg" in batch:
                neg = batch["item_neg"]
                S = neg.shape[1]
                u_all = jnp.concatenate([u, jnp.repeat(u, S, axis=0)])
                i_all = jnp.concatenate(
                    [item_out[items], item_out[neg.reshape(-1)]]
                )
                labels_all = jnp.concatenate(
                    [jnp.ones_like(labels), jnp.zeros(neg.size, labels.dtype)]
                )
                weight_all = jnp.concatenate([weight, jnp.repeat(weight, S)])
            else:
                u_all, i_all, labels_all, weight_all = (
                    u, item_out[items], labels, weight,
                )
            logits = jnp.sum(u_all * i_all, axis=1)
            if self.task == "rating":
                from ..ops.losses import mse_loss

                loss = mse_loss(logits, labels_all, weight_all)
            else:
                point_loss = (
                    bce_loss if self.loss_type == "cross_entropy" else focal_loss
                )
                loss = point_loss(logits, labels_all, weight_all)
            reg_embeds = (u_all, i_all)
        if getattr(self, "reg", None):
            loss += self.reg * sum(jnp.sum(jnp.square(e)) for e in reg_embeds) / (
                users.shape[0]
            )
        return loss

    def set_embeddings(self):
        prop = jax.jit(lambda p: self._propagate(p, jax.random.PRNGKey(0), False))
        user_out, item_out = prop(self.params)
        item_np = np.asarray(item_out)[: self.n_items]
        if getattr(self, "graph_paradigm", "u2i") == "i2i":
            # i2i never trains a user tower: a user is the mean of their
            # consumed items' final embeddings (sage_base.py:170-175)
            user_np = np.zeros((self.n_users, item_np.shape[1]), item_np.dtype)
            counts = np.zeros(self.n_users, dtype=item_np.dtype)
            uc = self.data_info.user_consumed
            idx_u = np.concatenate(
                [np.full(len(v), int(u)) for u, v in uc.items()]
            )
            idx_i = np.concatenate([np.asarray(v) for v in uc.values()])
            np.add.at(user_np, idx_u, item_np[idx_i])
            np.add.at(counts, idx_u, 1.0)
            user_np /= np.maximum(counts, 1.0)[:, None]
        else:
            user_np = np.asarray(user_out)[: self.n_users]
        self.user_embeds_np = self._append_oov(user_np)
        self.item_embeds_np = self._append_oov(item_np)

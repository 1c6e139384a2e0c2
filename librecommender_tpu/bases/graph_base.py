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
        self.loss_type = loss_type
        if loss_type in ("bpr", "max_margin"):
            self.paradigm = "pairwise"

    def _propagate(self, params, rng, train):
        """-> (user_out (u_rows, D'), item_out (i_rows, D'))."""
        raise NotImplementedError

    def _init_params(self, rng):
        raise NotImplementedError

    def build_model(self):
        rng = jax.random.PRNGKey(self.seed)
        self.params = self._init_params(rng)

    def loss_fn(self, params, batch, rng):
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
            pair_loss = bpr_loss if self.loss_type == "bpr" else max_margin_loss
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
        self.user_embeds_np = self._append_oov(
            np.asarray(user_out)[: self.n_users]
        )
        self.item_embeds_np = self._append_oov(
            np.asarray(item_out)[: self.n_items]
        )

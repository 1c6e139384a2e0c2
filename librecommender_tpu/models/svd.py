"""SVD: biased matrix factorization.

Reference parity: libreco/algorithms/svd.py:9 — score = user_bias +
item_bias + <u, v>; embeddings exported post-fit with bias columns folded in
(svd.py:146) so recommendation stays a single dot product.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..bases.embed_base import EmbedBase
from ..ops.initializers import truncated_normal
from ..ops.losses import bce_loss, focal_loss, mse_loss


class SVD(EmbedBase):
    paradigm = "pointwise"

    def __init__(
        self,
        task,
        data_info,
        loss_type="cross_entropy",
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
        sparse_optimizer=False,
        seed=42,
        lower_upper_bound=None,
    ):
        self.all_args = {
            k: v
            for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        super().__init__(task, data_info, embed_size, lower_upper_bound, seed)
        assert loss_type in ("cross_entropy", "focal")
        self.loss_type = loss_type
        # l2-normalize latent factors in the score and the exported
        # embeddings (reference libreco/algorithms/svd.py:138,157)
        self.norm_embed = norm_embed
        self.n_epochs = n_epochs
        self.lr = lr
        self.lr_decay = lr_decay
        self.epsilon = epsilon
        self.reg = reg
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_neg = num_neg
        # lazy row-sparse Adam (TF sparse-Adam semantics; see BPR)
        self.sparse_optimizer = sparse_optimizer
        self.sparse_tables = (
            "user_embed", "item_embed", "user_bias", "item_bias",
        )

    def touched_indices(self, batch):
        items = batch["item"]
        if "item_neg" in batch:
            items = jnp.concatenate([items, batch["item_neg"].reshape(-1)])
        return {
            "user_embed": batch["user"],
            "item_embed": items,
            "user_bias": batch["user"],
            "item_bias": items,
        }

    def build_model(self):
        from ..parallel.mesh import aligned_rows

        rng = jax.random.PRNGKey(self.seed)
        r1, r2 = jax.random.split(rng)
        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        self.params = {
            "user_embed": truncated_normal(r1, (u_rows, self.embed_size)),
            "item_embed": truncated_normal(r2, (i_rows, self.embed_size)),
            "user_bias": jnp.zeros((u_rows,)),
            "item_bias": jnp.zeros((i_rows,)),
        }

    def _scores(self, params, users, items):
        ue = params["user_embed"][users]
        ie = params["item_embed"][items]
        if self.norm_embed:
            ue = ue / jnp.maximum(jnp.linalg.norm(ue, axis=-1, keepdims=True), 1e-12)
            ie = ie / jnp.maximum(jnp.linalg.norm(ie, axis=-1, keepdims=True), 1e-12)
        return (
            params["user_bias"][users]
            + params["item_bias"][items]
            + jnp.sum(ue * ie, axis=-1)
        )

    def loss_fn(self, params, batch, rng):
        users, items, labels, weight = (
            batch["user"], batch["item"], batch["label"], batch["weight"],
        )
        point_loss = mse_loss if self.task == "rating" else (
            bce_loss if self.loss_type == "cross_entropy" else focal_loss
        )
        if "item_neg" in batch:
            neg = batch["item_neg"]                              # (B, S)
            users_all = jnp.concatenate([users, jnp.repeat(users, neg.shape[1])])
            items_all = jnp.concatenate([items, neg.reshape(-1)])
            labels_all = jnp.concatenate(
                [jnp.ones_like(labels), jnp.zeros(neg.size, labels.dtype)]
            )
            weight_all = jnp.concatenate(
                [weight, jnp.repeat(weight, neg.shape[1])]
            )
            loss = point_loss(
                self._scores(params, users_all, items_all), labels_all, weight_all
            )
            reg_items = items_all
            reg_users = users_all
        else:
            loss = point_loss(self._scores(params, users, items), labels, weight)
            reg_items, reg_users = items, users
        if self.reg:
            loss += self.reg * (
                jnp.sum(jnp.square(params["user_embed"][reg_users]))
                + jnp.sum(jnp.square(params["item_embed"][reg_items]))
            ) / reg_users.shape[0]
        return loss

    def set_embeddings(self):
        p = jax.device_get(self.params)
        n_u, n_i = self.n_users, self.n_items
        pu, qi = np.asarray(p["user_embed"]), np.asarray(p["item_embed"])
        if self.norm_embed:
            pu = pu / np.maximum(np.linalg.norm(pu, axis=-1, keepdims=True), 1e-12)
            qi = qi / np.maximum(np.linalg.norm(qi, axis=-1, keepdims=True), 1e-12)
        p = {**p, "user_embed": pu, "item_embed": qi}
        user = np.hstack(
            [
                p["user_embed"][:n_u],
                p["user_bias"][:n_u, None],
                np.ones((n_u, 1), np.float32),
            ]
        )
        item = np.hstack(
            [
                p["item_embed"][:n_i],
                np.ones((n_i, 1), np.float32),
                p["item_bias"][:n_i, None],
            ]
        )
        self.user_embeds_np = self._append_oov(user)
        self.item_embeds_np = self._append_oov(item)

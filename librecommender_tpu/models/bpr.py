"""BPR: Bayesian Personalized Ranking matrix factorization.

Reference parity: libreco/algorithms/bpr.py:21 (both the Cython SGD path
:137 and the TF pairwise-loss path collapse into one jitted pairwise train
step; score = item_bias + <u, v>). Ranking task only.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..bases.embed_base import EmbedBase
from ..ops.initializers import truncated_normal
from ..ops.losses import bpr_loss


class BPR(EmbedBase):
    paradigm = "pairwise"

    def __init__(
        self,
        task,
        data_info,
        loss_type="bpr",
        embed_size=16,
        n_epochs=20,
        lr=0.001,
        lr_decay=False,
        epsilon=1e-5,
        reg=None,
        batch_size=256,
        sampler="random",
        num_neg=1,
        use_tf=None,  # accepted for API familiarity; ignored
        sparse_optimizer=False,
        seed=42,
    ):
        self.all_args = {
            k: v
            for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        if task != "ranking":
            raise ValueError("BPR is only suitable for ranking")
        super().__init__(task, data_info, embed_size, None, seed)
        assert loss_type == "bpr", "BPR uses bpr loss"
        self.loss_type = loss_type
        self.n_epochs = n_epochs
        self.lr = lr
        self.lr_decay = lr_decay
        self.epsilon = epsilon
        self.reg = reg
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_neg = num_neg
        # row-sparse LazyAdam for huge vocab tables (docs/implementation_details.md)
        self.sparse_optimizer = sparse_optimizer
        self.sparse_tables = ("user_embed", "item_embed", "item_bias")

    def touched_indices(self, batch):
        items = batch["item"]
        if "item_neg" in batch:
            items = jnp.concatenate([items, batch["item_neg"].reshape(-1)])
        return {
            "user_embed": batch["user"],
            "item_embed": items,
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
            "item_bias": jnp.zeros((i_rows,)),
        }

    def loss_fn(self, params, batch, rng):
        users, items_pos, weight = batch["user"], batch["item"], batch["weight"]
        items_neg = batch["item_neg"]                            # (B, S)
        ue = params["user_embed"][users]                         # (B, D)
        pe = params["item_embed"][items_pos]
        pos_scores = params["item_bias"][items_pos] + jnp.sum(ue * pe, axis=-1)
        ne = params["item_embed"][items_neg]                     # (B, S, D)
        neg_scores = params["item_bias"][items_neg] + jnp.einsum("bd,bsd->bs", ue, ne)
        S = items_neg.shape[1]
        loss = bpr_loss(
            jnp.repeat(pos_scores[:, None], S, axis=1).reshape(-1),
            neg_scores.reshape(-1),
            jnp.repeat(weight[:, None], S, axis=1).reshape(-1),
        )
        if self.reg:
            loss += self.reg * (
                jnp.sum(jnp.square(ue)) + jnp.sum(jnp.square(pe)) + jnp.sum(jnp.square(ne))
            ) / users.shape[0]
        return loss

    def set_embeddings(self):
        p = jax.device_get(self.params)
        n_u, n_i = self.n_users, self.n_items
        user = np.hstack(
            [p["user_embed"][:n_u], np.ones((n_u, 1), np.float32)]
        )
        item = np.hstack(
            [p["item_embed"][:n_i], p["item_bias"][:n_i, None]]
        )
        self.user_embeds_np = self._append_oov(user)
        self.item_embeds_np = self._append_oov(item)

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
        norm_embed=False,
        n_epochs=20,
        lr=0.001,
        lr_decay=False,
        epsilon=1e-5,
        reg=None,
        batch_size=256,
        sampler="random",
        num_neg=1,
        use_tf=None,  # accepted for API familiarity; ignored
        optimizer="adam",
        num_threads=1,  # accepted for API familiarity (Cython-path knob); ignored
        sparse_optimizer=None,
        mxu_gather="auto",
        seed=42,
        lower_upper_bound=None,  # accepted for API familiarity (ranking-only)
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
        # l2-normalize latent factors (bias column excluded) in the loss
        # and the exported embeddings (reference libreco/algorithms/bpr.py:196,390)
        self.norm_embed = norm_embed
        self.n_epochs = n_epochs
        self.lr = lr
        self.lr_decay = lr_decay
        self.epsilon = epsilon
        self.reg = reg
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_neg = num_neg
        # reference BPR's Cython path offers sgd/momentum/adam
        # (libreco/algorithms/bpr.py:87); mapped to optax here
        if optimizer not in ("adam", "sgd", "momentum"):
            raise ValueError("optimizer must be one of ('adam', 'sgd', 'momentum')")
        if optimizer != "adam" and sparse_optimizer:
            raise ValueError("sparse_optimizer (LazyAdam) requires optimizer='adam'")
        self.optimizer = optimizer
        # Row-sparse LazyAdam is the DEFAULT on the adam path: the reference's
        # Cython/TF updates are lazy (untouched rows never move), and dense
        # Adam's stale momentum visibly diverges on small datasets
        # (PARITY.md BPR row: 0.6353 dense vs 0.7238 reference at matched lr).
        # Pass sparse_optimizer=False explicitly for dense Adam semantics.
        if sparse_optimizer is None:
            sparse_optimizer = optimizer == "adam"
        self.sparse_optimizer = sparse_optimizer
        self.sparse_tables = ("user_embed", "item_embed")
        # route table lookups through the MXU one-hot kernels
        # (ops/mxu_gather.py): forward gather AND backward scatter-add
        # become matmuls. "auto" = on-TPU + small vocab (measured
        # crossover ~2k rows); True/False force it.
        self.mxu_gather = mxu_gather

    def _custom_optimizer(self):
        if self.optimizer == "adam":
            return None  # default Adam path (lr_decay-aware)
        import optax

        return (
            optax.sgd(self.lr) if self.optimizer == "sgd"
            else optax.sgd(self.lr, momentum=0.9)
        )

    def touched_indices(self, batch):
        items = batch["item"]
        if "item_neg" in batch:
            items = jnp.concatenate([items, batch["item_neg"].reshape(-1)])
        return {
            "user_embed": batch["user"],
            "item_embed": items,
        }

    def build_model(self):
        from ..parallel.mesh import aligned_rows

        rng = jax.random.PRNGKey(self.seed)
        r1, r2 = jax.random.split(rng)
        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        # the item bias lives in column D of the item table: a TPU gather
        # costs ~7ns per index row REGARDLESS of row width, so a separate
        # (B,) bias gather (+ its backward scatter-add) costs as much as
        # the whole (B, D) embedding row — folding it in makes the score
        # one wide gather per side (profiled +20% on the BPR step)
        self.params = {
            "user_embed": truncated_normal(r1, (u_rows, self.embed_size)),
            "item_embed": jnp.concatenate(
                [truncated_normal(r2, (i_rows, self.embed_size)),
                 jnp.zeros((i_rows, 1))], axis=1,
            ),
        }

    def loss_fn(self, params, batch, rng):
        from ..ops.mxu_gather import auto_enable, table_lookup

        users, items_pos, weight = batch["user"], batch["item"], batch["weight"]
        items_neg = batch["item_neg"]                            # (B, S)
        D = self.embed_size
        use_mxu = not getattr(self, "_under_mesh", False) and auto_enable(
            (params["user_embed"].shape[0], params["item_embed"].shape[0]),
            self.mxu_gather,
        )
        ue = table_lookup(params["user_embed"], users, use_mxu)  # (B, D)
        pe = table_lookup(params["item_embed"], items_pos, use_mxu)
        ne = table_lookup(params["item_embed"], items_neg, use_mxu)
        if self.norm_embed:
            def _norm(x):
                return x / jnp.maximum(
                    jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
                )
            ue = _norm(ue)
            pe = jnp.concatenate([_norm(pe[:, :D]), pe[:, D:]], axis=-1)
            ne = jnp.concatenate([_norm(ne[..., :D]), ne[..., D:]], axis=-1)
        ua = jnp.concatenate([ue, jnp.ones_like(ue[:, :1])], axis=1)
        pos_scores = jnp.sum(ua * pe, axis=-1)
        neg_scores = jnp.einsum("bd,bsd->bs", ua, ne)
        S = items_neg.shape[1]
        loss = bpr_loss(
            jnp.repeat(pos_scores[:, None], S, axis=1).reshape(-1),
            neg_scores.reshape(-1),
            jnp.repeat(weight[:, None], S, axis=1).reshape(-1),
        )
        if self.reg:
            # regularize the latent factors only (bias column excluded,
            # matching the separate-bias formulation)
            loss += self.reg * (
                jnp.sum(jnp.square(ue))
                + jnp.sum(jnp.square(pe[:, :D]))
                + jnp.sum(jnp.square(ne[..., :D]))
            ) / users.shape[0]
        return loss

    def set_embeddings(self):
        p = jax.device_get(self.params)
        n_u, n_i = self.n_users, self.n_items
        ue = np.asarray(p["user_embed"][:n_u])
        item = np.array(p["item_embed"][:n_i])  # bias already in col D
        if self.norm_embed:
            ue = ue / np.maximum(np.linalg.norm(ue, axis=-1, keepdims=True), 1e-12)
            fac = item[:, : self.embed_size]
            item[:, : self.embed_size] = fac / np.maximum(
                np.linalg.norm(fac, axis=-1, keepdims=True), 1e-12
            )
        user = np.hstack([ue, np.ones((n_u, 1), np.float32)])
        self.user_embeds_np = self._append_oov(user)
        self.item_embeds_np = self._append_oov(item)

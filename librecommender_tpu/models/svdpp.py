"""SVD++: biased MF with implicit-feedback item factors.

Reference parity: libreco/algorithms/svdpp.py:9 — user representation
u + |N(u)|^-1/2 * sum_{j in N(u)} y_j (the sparse implicit term computed
with tf.nn.safe_embedding_lookup_sparse in the reference becomes a padded
gather + masked mean over a device-resident consumed table).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..bases.embed_base import EmbedBase
from ..graph.adjacency import build_neighbor_table
from ..ops.initializers import truncated_normal
from ..ops.losses import bce_loss, focal_loss, mse_loss
from ..parallel.mesh import aligned_rows


class SVDpp(EmbedBase):
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
        recent_num=None,
        max_implicit=128,
        dense_adj_limit=200_000_000,
        seed=42,
        lower_upper_bound=None,
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        super().__init__(task, data_info, embed_size, lower_upper_bound, seed)
        assert loss_type in ("cross_entropy", "focal")
        self.loss_type = loss_type
        self.n_epochs = n_epochs
        self.lr = lr
        self.lr_decay = lr_decay
        self.epsilon = epsilon
        self.reg = reg
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_neg = num_neg
        # reference svdpp.py:186 keeps each user's `recent_num` most recent
        # consumed items for the implicit term (its default: 30); None keeps
        # everything up to the `max_implicit` table width
        assert recent_num is None or (
            isinstance(recent_num, int) and recent_num > 0
        ), "`recent_num` must be None or positive int"
        self.recent_num = recent_num
        self.max_implicit = (
            max_implicit if recent_num is None else min(max_implicit, recent_num)
        )
        self.dense_adj_limit = dense_adj_limit
        self.consumed_table = None
        self.consumed_counts = None
        self.implicit_adj = None

    def _build_implicit(self):
        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        consumed = self.data_info.user_consumed
        if self.recent_num is not None:
            consumed = {
                u: list(items)[-self.recent_num:] for u, items in consumed.items()
            }
        table, counts = build_neighbor_table(
            consumed, self.n_users, self.max_implicit,
            pad=self.n_items,  # pad indexes a zero-contribution row via mask
        )
        if u_rows * i_rows <= self.dense_adj_limit:
            # The implicit term is one-sided graph propagation: the padded
            # per-row gather costs B*max_implicit index rows per step
            # (~1M at batch 8192 — profiled as 97% of the step at the
            # ~7ns/index-row floor). A dense (u_rows, i_rows) matrix with
            # entries 1/sqrt(|N(u)|) — built from the SAME neighbor table,
            # so both paths agree exactly — turns it into ONE MXU matmul
            # per step (implicit_all = W @ y), the same design as
            # LightGCN's dense adjacency; the gather path remains for
            # huge catalogs.
            W = np.zeros((u_rows, i_rows), np.float32)
            for u in range(self.n_users):
                c = int(counts[u])
                if c:
                    W[u, table[u, :c]] = 1.0 / np.sqrt(float(c))
            self.implicit_adj = jnp.asarray(W)
        else:
            self.consumed_table = jnp.asarray(table)
            self.consumed_counts = jnp.asarray(counts)

    def build_model(self):
        self._build_implicit()
        rng = jax.random.PRNGKey(self.seed)
        r = jax.random.split(rng, 3)
        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        self.params = {
            "user_embed": truncated_normal(r[0], (u_rows, self.embed_size)),
            "item_embed": truncated_normal(r[1], (i_rows, self.embed_size)),
            "implicit_embed": truncated_normal(r[2], (i_rows, self.embed_size)),
            "user_bias": jnp.zeros((u_rows,)),
            "item_bias": jnp.zeros((i_rows,)),
        }

    def _user_repr(self, params, users):
        if self.implicit_adj is not None:
            implicit_all = self.implicit_adj @ params["implicit_embed"]
            return params["user_embed"][users] + implicit_all[users]
        nbrs = self.consumed_table[users]                      # (B, C)
        mask = (nbrs != self.n_items).astype(jnp.float32)
        y = params["implicit_embed"][nbrs]                     # (B, C, D)
        implicit = jnp.sum(y * mask[:, :, None], axis=1)
        counts = jnp.maximum(self.consumed_counts[users], 1.0)
        implicit = implicit / jnp.sqrt(counts)[:, None]
        return params["user_embed"][users] + implicit

    def _scores(self, params, users, items):
        u = self._user_repr(params, users)
        return (
            params["user_bias"][users]
            + params["item_bias"][items]
            + jnp.sum(u * params["item_embed"][items], axis=-1)
        )

    def loss_fn(self, params, batch, rng):
        users, items, labels, weight = (
            batch["user"], batch["item"], batch["label"], batch["weight"],
        )
        point_loss = mse_loss if self.task == "rating" else (
            bce_loss if self.loss_type == "cross_entropy" else focal_loss
        )
        if "item_neg" in batch:
            neg = batch["item_neg"]
            S = neg.shape[1]
            u = self._user_repr(params, users)                 # compute once
            pos = (
                params["user_bias"][users] + params["item_bias"][items]
                + jnp.sum(u * params["item_embed"][items], axis=-1)
            )
            negs = (
                params["user_bias"][users][:, None]
                + params["item_bias"][neg]
                + jnp.einsum("bd,bsd->bs", u, params["item_embed"][neg])
            )
            logits = jnp.concatenate([pos, negs.reshape(-1)])
            labels_all = jnp.concatenate(
                [jnp.ones_like(pos), jnp.zeros(neg.size, labels.dtype)]
            )
            weight_all = jnp.concatenate([weight, jnp.repeat(weight, S)])
            loss = point_loss(logits, labels_all, weight_all)
        else:
            loss = point_loss(self._scores(params, users, items), labels, weight)
        if self.reg:
            loss += self.reg * (
                jnp.sum(jnp.square(params["user_embed"][users]))
                + jnp.sum(jnp.square(params["item_embed"][items]))
            ) / users.shape[0]
        return loss

    def set_embeddings(self):
        reprs = []
        repr_fn = jax.jit(self._user_repr)
        chunk = 1024
        ids = np.arange(self.n_users, dtype=np.int32)
        for start in range(0, self.n_users, chunk):
            part = ids[start : start + chunk]
            part_p = np.pad(part, (0, chunk - len(part)))
            out = np.asarray(repr_fn(self.params, jnp.asarray(part_p)))
            reprs.append(out[: len(part)])
        u_repr = np.concatenate(reprs) if reprs else np.zeros((0, self.embed_size))
        p = jax.device_get(self.params)
        n_u, n_i = self.n_users, self.n_items
        user = np.hstack(
            [u_repr, p["user_bias"][:n_u, None], np.ones((n_u, 1), np.float32)]
        )
        item = np.hstack(
            [p["item_embed"][:n_i], np.ones((n_i, 1), np.float32),
             p["item_bias"][:n_i, None]]
        )
        self.user_embeds_np = self._append_oov(user)
        self.item_embeds_np = self._append_oov(item)

    def post_load(self):
        self._build_implicit()
        if self.params is not None:
            self.set_embeddings()

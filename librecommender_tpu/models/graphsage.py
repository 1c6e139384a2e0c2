"""GraphSage: inductive neighbor-mean aggregation.

Reference parity: libreco/algorithms/graphsage.py:8 (+ the DGL variant
graphsage_dgl.py:16 — collapsed into this one implementation): per layer,
h_v = relu(W [h_v ; mean(h_N(v))]) over fixed-size neighborhoods. Instead of
per-batch host-side neighbor sampling (graph/neighbor_walk.py:7), padded
neighbor tables are built once; each training step draws a fresh fixed-size
neighbor subset on device (uniform indices modulo degree), keeping the hot
loop free of host work.
"""
import jax
import jax.numpy as jnp

from ..bases.graph_base import GraphEmbedBase
from ..graph.adjacency import build_neighbor_table
from ..ops.initializers import truncated_normal
from ..ops.nn import dense, init_dense
from ..parallel.mesh import aligned_rows


class GraphSage(GraphEmbedBase):
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
        num_layers=2,
        num_neighbors=10,
        max_stored_neighbors=50,
        seed=42,
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        if task != "ranking":
            raise ValueError("GraphSage is only suitable for ranking")
        super().__init__(task, data_info, loss_type, embed_size, None, seed)
        self.n_epochs = n_epochs
        self.lr = lr
        self.lr_decay = lr_decay
        self.epsilon = epsilon
        self.reg = reg
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_neg = num_neg
        self.num_layers = num_layers
        self.num_neighbors = num_neighbors
        self.max_stored_neighbors = max_stored_neighbors
        self.user_nbr = self.user_deg = None
        self.item_nbr = self.item_deg = None

    def build_model(self):
        un, uc = build_neighbor_table(
            self.data_info.user_consumed, self.n_users,
            self.max_stored_neighbors, pad=0,
        )
        inn, ic = build_neighbor_table(
            self.data_info.item_consumed, self.n_items,
            self.max_stored_neighbors, pad=0,
        )
        self.user_nbr, self.user_deg = jnp.asarray(un), jnp.asarray(uc)
        self.item_nbr, self.item_deg = jnp.asarray(inn), jnp.asarray(ic)
        super().build_model()

    def _init_params(self, rng):
        D = self.embed_size
        r = jax.random.split(rng, 2 + 2 * self.num_layers)
        params = {
            "user_embed": truncated_normal(r[0], (aligned_rows(self.n_users), D)),
            "item_embed": truncated_normal(r[1], (aligned_rows(self.n_items), D)),
            "user_w": [init_dense(r[2 + 2 * l], 2 * D, D) for l in range(self.num_layers)],
            "item_w": [init_dense(r[3 + 2 * l], 2 * D, D) for l in range(self.num_layers)],
        }
        return params

    def _sample_neighbor_mean(self, h_other, nbr_table, deg, rng, train):
        """Mean embedding of K neighbors per node (K sampled during train,
        the first K stored otherwise). Nodes without neighbors get zeros."""
        n_rows, T = nbr_table.shape
        K = self.num_neighbors
        if train:
            idx = jax.random.randint(rng, (n_rows, K), 0, T)
        else:
            idx = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :], (n_rows, 1))
        degc = jnp.maximum(deg, 1.0).astype(jnp.int32)[:, None]
        idx = jnp.mod(idx, degc)
        rows = jnp.arange(n_rows)[:, None]
        picked = nbr_table[rows, idx]                           # (n_rows, K)
        embeds = h_other[picked]                                # (n_rows, K, D)
        mean = jnp.mean(embeds, axis=1)
        has_nbr = (deg > 0.0)[:, None]
        return jnp.where(has_nbr, mean, 0.0)

    def _propagate(self, params, rng, train):
        user_h = params["user_embed"]
        item_h = params["item_embed"]
        n_u, n_i = self.n_users, self.n_items
        for l in range(self.num_layers):
            rng, r1, r2 = jax.random.split(rng, 3)
            u_nbr_mean = self._sample_neighbor_mean(
                item_h, self.user_nbr, self.user_deg, r1, train
            )
            i_nbr_mean = self._sample_neighbor_mean(
                user_h, self.item_nbr, self.item_deg, r2, train
            )
            u_new = jax.nn.relu(
                dense(
                    params["user_w"][l],
                    jnp.concatenate([user_h[:n_u], u_nbr_mean], axis=1),
                )
            )
            i_new = jax.nn.relu(
                dense(
                    params["item_w"][l],
                    jnp.concatenate([item_h[:n_i], i_nbr_mean], axis=1),
                )
            )
            user_h = jnp.zeros_like(user_h[:, : u_new.shape[1]]).at[:n_u].set(u_new)
            item_h = jnp.zeros_like(item_h[:, : i_new.shape[1]]).at[:n_i].set(i_new)
        return user_h, item_h

    def post_load(self):
        un, uc = build_neighbor_table(
            self.data_info.user_consumed, self.n_users,
            self.max_stored_neighbors, pad=0,
        )
        inn, ic = build_neighbor_table(
            self.data_info.item_consumed, self.n_items,
            self.max_stored_neighbors, pad=0,
        )
        self.user_nbr, self.user_deg = jnp.asarray(un), jnp.asarray(uc)
        self.item_nbr, self.item_deg = jnp.asarray(inn), jnp.asarray(ic)
        if self.params is not None:
            self.set_embeddings()

"""NGCF: neural graph collaborative filtering.

Reference parity: libreco/algorithms/ngcf.py:9 + torch_modules/ngcf_module.py
— per-layer propagation m = A_hat (W1 e) + A_hat (W1 e ⊙ W2 e_self-interact);
LeakyReLU, message dropout, L2-normalized per-layer outputs concatenated.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..bases.graph_base import GraphEmbedBase
from ..graph.adjacency import build_edges
from ..ops.initializers import truncated_normal
from ..ops.nn import l2_normalize
from ..parallel.mesh import aligned_rows


class NGCF(GraphEmbedBase):
    def __init__(
        self,
        task,
        data_info,
        loss_type="bpr",
        embed_size=16,
        n_epochs=20,
        lr=0.001,
        lr_decay=False,
        epsilon=1e-8,
        reg=None,
        batch_size=256,
        sampler="random",
        num_neg=1,
        margin=1.0,
        amsgrad=False,
        lower_upper_bound=None,  # accepted for API familiarity (ranking-only)
        hidden_units=(64, 64, 64),
        node_dropout=0.0,
        message_dropout=0.0,
        dense_adj_limit=200_000_000,
        seed=42,
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        if task != "ranking":
            raise ValueError("NGCF is only suitable for ranking")
        super().__init__(task, data_info, loss_type, embed_size, None, seed)
        self.margin = margin
        self.amsgrad = amsgrad
        self.n_epochs = n_epochs
        self.lr = lr
        self.lr_decay = lr_decay
        self.epsilon = epsilon
        self.reg = reg
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_neg = num_neg
        self.hidden_units = tuple(hidden_units)
        self.node_dropout = node_dropout
        self.message_dropout = message_dropout
        self.dense_adj_limit = dense_adj_limit
        self.edge_u = self.edge_i = self.edge_w = None
        self.adj = None

    def _build_graph(self):
        from ..parallel.mesh import aligned_rows

        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        eu, ei, _ = build_edges(
            self.data_info.user_consumed, self.n_users, self.n_items
        )
        # reference Laplacian: ROW-normalized (A + I), ngcf_module.py:61-86
        # — side = L @ E decomposes into (R @ other + self) / (deg + 1)
        deg_u = np.zeros(u_rows, np.float32)
        deg_i = np.zeros(i_rows, np.float32)
        np.add.at(deg_u, eu, 1.0)
        np.add.at(deg_i, ei, 1.0)
        self.inv_du = jnp.asarray(1.0 / (deg_u + 1.0))
        self.inv_di = jnp.asarray(1.0 / (deg_i + 1.0))
        if u_rows * i_rows <= self.dense_adj_limit:
            R = np.zeros((u_rows, i_rows), np.float32)
            R[eu, ei] = 1.0
            self.adj = jnp.asarray(R)  # RAW binary interactions
        else:
            self.edge_u = jnp.asarray(eu)
            self.edge_i = jnp.asarray(ei)
            self.edge_w = jnp.ones(len(eu), jnp.float32)

    def build_model(self):
        self._build_graph()
        super().build_model()

    def _init_params(self, rng):
        dims = [self.embed_size, *self.hidden_units]
        r = jax.random.split(rng, 2 + 2 * len(self.hidden_units))
        params = {
            "user_embed": truncated_normal(
                r[0], (aligned_rows(self.n_users), self.embed_size)
            ),
            "item_embed": truncated_normal(
                r[1], (aligned_rows(self.n_items), self.embed_size)
            ),
            "w1": [], "w2": [],
        }
        params["b1"], params["b2"] = [], []
        for li in range(len(self.hidden_units)):
            scale = dims[li] ** -0.5
            params["w1"].append(
                truncated_normal(r[2 + 2 * li], (dims[li], dims[li + 1]), scale=scale)
            )
            params["w2"].append(
                truncated_normal(r[3 + 2 * li], (dims[li], dims[li + 1]), scale=scale)
            )
            params["b1"].append(jnp.zeros(dims[li + 1]))
            params["b2"].append(jnp.zeros(dims[li + 1]))
        return params

    def _propagate(self, params, rng, train):
        """Reference-exact recipe (ngcf_module.py:88-129): per layer
        side = L @ prev with L = row-normalized (A + I); message =
        LeakyReLU(side @ W_self + b_self + (side ⊙ prev) @ W_pair +
        b_pair); message dropout; L2-normalize; the NORMALIZED output is
        the next layer's input; all layer outputs (incl. the raw
        embeddings) concatenate."""
        u_rows = params["user_embed"].shape[0]
        i_rows = params["item_embed"].shape[0]
        r1, r2 = jax.random.split(rng)
        user_h, item_h = params["user_embed"], params["item_embed"]
        user_layers, item_layers = [user_h], [item_h]
        dense = self.adj is not None
        if dense:
            A = self.adj
            if train and self.node_dropout > 0.0:
                keep = 1.0 - self.node_dropout
                mask = jax.random.bernoulli(r1, keep, A.shape)
                A = jnp.where(mask, A / keep, 0.0)
        else:
            w = self.edge_w
            if train and self.node_dropout > 0.0:
                keep = 1.0 - self.node_dropout
                mask = jax.random.bernoulli(r1, keep, w.shape)
                w = jnp.where(mask, w / keep, 0.0)
            eu, ei = self.edge_u, self.edge_i
        inv_du, inv_di = self.inv_du[:, None], self.inv_di[:, None]
        for li, (w1, b1, w2, b2) in enumerate(zip(
            params["w1"], params["b1"], params["w2"], params["b2"]
        )):
            if dense:
                side_u = inv_du * (A @ item_h + user_h)
                side_i = inv_di * (A.T @ user_h + item_h)
            else:
                agg_u = jax.ops.segment_sum(
                    item_h[ei] * w[:, None], eu, num_segments=u_rows,
                    indices_are_sorted=True,
                )
                agg_i = jax.ops.segment_sum(
                    user_h[eu] * w[:, None], ei, num_segments=i_rows
                )
                side_u = inv_du * (agg_u + user_h)
                side_i = inv_di * (agg_i + item_h)
            u_new = jax.nn.leaky_relu(
                side_u @ w1 + b1 + (side_u * user_h) @ w2 + b2,
                negative_slope=0.2,
            )
            i_new = jax.nn.leaky_relu(
                side_i @ w1 + b1 + (side_i * item_h) @ w2 + b2,
                negative_slope=0.2,
            )
            if train and self.message_dropout > 0.0:
                keep = 1.0 - self.message_dropout
                r2, k1, k2 = jax.random.split(r2, 3)
                u_new = jnp.where(
                    jax.random.bernoulli(k1, keep, u_new.shape), u_new / keep, 0.0
                )
                i_new = jnp.where(
                    jax.random.bernoulli(k2, keep, i_new.shape), i_new / keep, 0.0
                )
            # normalized outputs feed the next layer (ngcf_module.py:124)
            user_h, item_h = l2_normalize(u_new), l2_normalize(i_new)
            user_layers.append(user_h)
            item_layers.append(item_h)
        return (
            jnp.concatenate(user_layers, axis=1),
            jnp.concatenate(item_layers, axis=1),
        )

    def post_load(self):
        self._build_graph()
        if self.params is not None:
            self.set_embeddings()

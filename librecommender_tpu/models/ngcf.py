"""NGCF: neural graph collaborative filtering.

Reference parity: libreco/algorithms/ngcf.py:9 + torch_modules/ngcf_module.py
— per-layer propagation m = A_hat (W1 e) + A_hat (W1 e ⊙ W2 e_self-interact);
LeakyReLU, message dropout, L2-normalized per-layer outputs concatenated.
"""
import jax
import jax.numpy as jnp

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
        from ..graph.adjacency import build_dense_adjacency
        from ..parallel.mesh import aligned_rows

        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        if u_rows * i_rows <= self.dense_adj_limit:
            self.adj = jnp.asarray(
                build_dense_adjacency(
                    self.data_info.user_consumed, self.n_users, self.n_items,
                    u_rows, i_rows,
                )
            )
        else:
            eu, ei, ew = build_edges(
                self.data_info.user_consumed, self.n_users, self.n_items
            )
            self.edge_u = jnp.asarray(eu)
            self.edge_i = jnp.asarray(ei)
            self.edge_w = jnp.asarray(ew)

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
        for li in range(len(self.hidden_units)):
            scale = dims[li] ** -0.5
            params["w1"].append(
                truncated_normal(r[2 + 2 * li], (dims[li], dims[li + 1]), scale=scale)
            )
            params["w2"].append(
                truncated_normal(r[3 + 2 * li], (dims[li], dims[li + 1]), scale=scale)
            )
        return params

    def _propagate(self, params, rng, train):
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
        for li, (w1, w2) in enumerate(zip(params["w1"], params["w2"])):
            if dense:
                # the per-edge interaction term factors through the dense
                # matmul: sum_i w_ui (h_i ⊙ h_u) = (A @ h_i) ⊙ h_u
                agg_i = A @ item_h                            # (u_rows, d)
                u_agg = agg_i @ w1 + (agg_i * user_h) @ w2
                agg_u = A.T @ user_h
                i_agg = agg_u @ w1 + (agg_u * item_h) @ w2
            else:
                i_msg = item_h[ei] @ w1 + (item_h[ei] * user_h[eu]) @ w2
                u_agg = jax.ops.segment_sum(
                    i_msg * w[:, None], eu, num_segments=u_rows,
                    indices_are_sorted=True,
                )
                u_msg = user_h[eu] @ w1 + (user_h[eu] * item_h[ei]) @ w2
                i_agg = jax.ops.segment_sum(
                    u_msg * w[:, None], ei, num_segments=i_rows
                )
            u_self = user_h @ w1
            u_new = jax.nn.leaky_relu(u_self + u_agg, negative_slope=0.2)
            i_self = item_h @ w1
            i_new = jax.nn.leaky_relu(i_self + i_agg, negative_slope=0.2)
            if train and self.message_dropout > 0.0:
                keep = 1.0 - self.message_dropout
                r2, k1, k2 = jax.random.split(r2, 3)
                u_new = jnp.where(
                    jax.random.bernoulli(k1, keep, u_new.shape), u_new / keep, 0.0
                )
                i_new = jnp.where(
                    jax.random.bernoulli(k2, keep, i_new.shape), i_new / keep, 0.0
                )
            user_h, item_h = u_new, i_new
            user_layers.append(l2_normalize(user_h))
            item_layers.append(l2_normalize(item_h))
        return (
            jnp.concatenate(user_layers, axis=1),
            jnp.concatenate(item_layers, axis=1),
        )

    def post_load(self):
        self._build_graph()
        if self.params is not None:
            self.set_embeddings()

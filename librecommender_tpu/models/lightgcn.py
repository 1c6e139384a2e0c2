"""LightGCN: layer-averaged linear propagation over the normalized adjacency.

Reference parity: libreco/algorithms/lightgcn.py:9 +
torch_modules/lightgcn_module.py:7-62 — K propagation layers
e^(k+1) = A_hat e^(k) (no weights, no nonlinearity), final embedding = mean
of all layers, edge (node-message) dropout during training. The sparse
matmul is expressed as gather + segment_sum over static edge arrays, which
XLA lowers to efficient TPU scatter/gather; edge dropout is a bernoulli mask
drawn on device.
"""
import jax
import jax.numpy as jnp

from ..bases.graph_base import GraphEmbedBase
from ..graph.adjacency import build_edges
from ..ops.initializers import truncated_normal
from ..parallel.mesh import aligned_rows


class LightGCN(GraphEmbedBase):
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
        n_layers=3,
        dropout_rate=0.0,
        dense_adj_limit=200_000_000,
        adj_dtype="bf16",
        seed=42,
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        if task != "ranking":
            raise ValueError("LightGCN is only suitable for ranking")
        assert loss_type in ("cross_entropy", "focal", "bpr", "max_margin")
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
        self.n_layers = n_layers
        self.dropout_rate = dropout_rate
        self.dense_adj_limit = dense_adj_limit
        if adj_dtype not in ("bf16", "f32"):
            raise ValueError("adj_dtype must be 'bf16' or 'f32'")
        self.adj_dtype = adj_dtype
        self.edge_u = self.edge_i = self.edge_w = None
        self.adj = None  # dense (u_rows, i_rows) when within the limit

    def _build_graph(self):
        from ..graph.adjacency import build_dense_adjacency
        from ..parallel.mesh import aligned_rows

        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        if u_rows * i_rows <= self.dense_adj_limit:
            # MXU path: propagation = two dense matmuls per layer
            self.adj = jnp.asarray(
                build_dense_adjacency(
                    self.data_info.user_consumed, self.n_users, self.n_items,
                    u_rows, i_rows,
                ),
                dtype=jnp.bfloat16 if self.adj_dtype == "bf16" else jnp.float32,
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
        # scale 0.1 matches the reference's nn.init.normal_(0, 0.1) for
        # graph models (torch_modules/lightgcn_module.py:32) — propagation
        # averages shrink signal, so the larger init matters here
        r1, r2 = jax.random.split(rng)
        return {
            "user_embed": truncated_normal(
                r1, (aligned_rows(self.n_users), self.embed_size), scale=0.1
            ),
            "item_embed": truncated_normal(
                r2, (aligned_rows(self.n_items), self.embed_size), scale=0.1
            ),
        }

    def _propagate(self, params, rng, train):
        user_h = params["user_embed"]
        item_h = params["item_embed"]
        user_acc, item_acc = user_h, item_h
        if self.adj is not None:
            A = self.adj
            if train and self.dropout_rate > 0.0:
                keep = 1.0 - self.dropout_rate
                mask = jax.random.bernoulli(rng, keep, A.shape)
                A = jnp.where(mask, A / keep, jnp.zeros((), A.dtype))
            # the step is HBM-bound on streaming A (~12 passes/step across
            # fwd+bwd): a bf16 adjacency halves that traffic and doubles
            # the MXU rate; accumulation stays f32 (preferred_element_type)
            # and the layer-sum accumulators stay f32 params precision
            for _ in range(self.n_layers):
                msg_to_user = jnp.dot(
                    A, item_h.astype(A.dtype),
                    preferred_element_type=jnp.float32,
                )
                msg_to_item = jnp.dot(
                    A.T, user_h.astype(A.dtype),
                    preferred_element_type=jnp.float32,
                )
                user_h, item_h = msg_to_user, msg_to_item
                user_acc = user_acc + user_h
                item_acc = item_acc + item_h
        else:
            u_rows = params["user_embed"].shape[0]
            i_rows = params["item_embed"].shape[0]
            w = self.edge_w
            if train and self.dropout_rate > 0.0:
                keep = 1.0 - self.dropout_rate
                mask = jax.random.bernoulli(rng, keep, w.shape)
                w = jnp.where(mask, w / keep, 0.0)
            eu, ei = self.edge_u, self.edge_i
            for _ in range(self.n_layers):
                msg_to_user = jax.ops.segment_sum(
                    item_h[ei] * w[:, None], eu, num_segments=u_rows,
                    indices_are_sorted=True,
                )
                msg_to_item = jax.ops.segment_sum(
                    user_h[eu] * w[:, None], ei, num_segments=i_rows,
                )
                user_h, item_h = msg_to_user, msg_to_item
                user_acc = user_acc + user_h
                item_acc = item_acc + item_h
        scale = 1.0 / (self.n_layers + 1)
        return user_acc * scale, item_acc * scale

    def post_load(self):
        self._build_graph()
        if self.params is not None:
            self.set_embeddings()

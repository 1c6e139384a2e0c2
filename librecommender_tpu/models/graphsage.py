"""GraphSage: inductive neighbor-mean aggregation.

Reference parity: libreco/algorithms/graphsage.py:8 (+ the DGL variant
graphsage_dgl.py:16 — collapsed into this one implementation): per layer,
h_v = relu(W [h_v ; mean(h_N(v))]) over fixed-size neighborhoods. Instead of
per-batch host-side neighbor sampling (graph/neighbor_walk.py:7), padded
neighbor tables are built once; each training step draws a fresh fixed-size
neighbor subset on device (uniform indices modulo degree), keeping the hot
loop free of host work.

Both reference training paradigms are supported (sage_base.py:33-96):
``paradigm="u2i"`` trains user-item pairs; ``paradigm="i2i"`` trains
item-item pairs from bipartite random walks — start nodes uniform or
inverse-popularity (``start_node``), ``num_walks`` x ``sample_walk_len``
pairs per start, ``focus_start`` anchoring, negatives excluding anchor and
positive. The walks themselves run in-kernel (graph/walks.py) instead of in
a host collator (collators.py:348), and at inference a user is the mean of
their consumed items' embeddings.
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..bases.graph_base import GraphEmbedBase
from ..graph.adjacency import build_neighbor_table
from ..ops.initializers import truncated_normal
from ..ops.nn import dense, dropout, init_dense
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
        epsilon=1e-8,
        reg=None,
        batch_size=256,
        sampler="random",
        num_neg=1,
        dropout_rate=None,
        margin=1.0,
        amsgrad=False,
        remove_edges=False,
        num_layers=2,
        num_neighbors=10,
        max_stored_neighbors=50,
        paradigm="u2i",
        num_walks=10,
        sample_walk_len=5,
        start_node="random",
        focus_start=False,
        seed=42,
        lower_upper_bound=None,  # accepted for API familiarity (ranking-only)
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        if task != "ranking":
            raise ValueError("GraphSage is only suitable for ranking")
        if paradigm not in ("u2i", "i2i"):
            raise ValueError("`paradigm` must be one of ('u2i', 'i2i')")
        if start_node not in ("random", "unpopular"):
            raise ValueError("`start_node` must be one of ('random', 'unpopular')")
        if paradigm == "i2i" and sampler is None:
            raise ValueError("the i2i paradigm requires negative sampling")
        if paradigm == "i2i" and sampler not in (
            "random", "popular", "out-batch"
        ):
            raise ValueError(
                "i2i negatives are drawn in-kernel; sampler must be "
                "'random', 'popular' or 'out-batch'"
            )
        super().__init__(task, data_info, loss_type, embed_size, None, seed)
        self.n_epochs = n_epochs
        self.lr = lr
        self.lr_decay = lr_decay
        self.epsilon = epsilon
        self.reg = reg
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_neg = num_neg
        self.dropout_rate = dropout_rate or 0.0
        self.margin = margin
        self.amsgrad = amsgrad
        if remove_edges:
            # the reference removes target<->positive edges from per-example
            # sampled subgraphs (libreco/algorithms/graphsage.py:55); this
            # design propagates over the FULL graph once per step, so there
            # is no per-example subgraph to drop edges from — neighbor
            # sampling already re-randomizes every step
            warnings.warn(
                "remove_edges has no effect under full-graph propagation; "
                "per-step neighbor re-sampling plays the same role",
                stacklevel=2,
            )
        self.remove_edges = remove_edges
        self.num_layers = num_layers
        self.num_neighbors = num_neighbors
        self.max_stored_neighbors = max_stored_neighbors
        self.graph_paradigm = paradigm
        self.num_walks = num_walks
        self.sample_walk_len = sample_walk_len
        self.start_node = start_node
        self.focus_start = focus_start
        if paradigm == "i2i":
            # batch rows only set the walk count per step: start nodes,
            # walk pairs and negatives are all drawn in-kernel
            # (graph/walks.py), so the generator ships positives only
            self.paradigm = "listwise"
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
        if self.graph_paradigm == "i2i" and self.sampler == "popular":
            from ..sampling.negatives import neg_probs_from_frequency

            p = neg_probs_from_frequency(
                self.data_info.item_consumed, self.n_items, 0.75
            )
            self._neg_logits = jnp.asarray(
                np.where(p > 0, np.log(np.maximum(p, 1e-30)), -np.inf),
                dtype=jnp.float32,
            )
        if self.graph_paradigm == "i2i" and self.start_node == "unpopular":
            from ..sampling.negatives import pos_probs_from_frequency

            probs = np.asarray(
                pos_probs_from_frequency(
                    self.data_info.item_consumed, self.n_users, self.n_items,
                    1e-3,
                ),
                dtype=np.float64,
            )
            probs = np.nan_to_num(probs, nan=0.0, posinf=0.0)
            self._start_logits = jnp.asarray(
                np.where(probs > 0, np.log(np.maximum(probs, 1e-30)), -np.inf),
                dtype=jnp.float32,
            )
        super().build_model()

    def _init_params(self, rng):
        D = self.embed_size
        r = jax.random.split(rng, 3 + 2 * self.num_layers)
        params = {
            "user_embed": truncated_normal(r[0], (aligned_rows(self.n_users), D)),
            "item_embed": truncated_normal(r[1], (aligned_rows(self.n_items), D)),
            "item_w": [init_dense(r[3 + 2 * l], 2 * D, D) for l in range(self.num_layers)],
        }
        if self.graph_paradigm != "u2i":
            # u2i leaves the user side un-conv'd (reference structure:
            # raw projected features only) — no user conv weights to
            # train there
            params["user_w"] = [
                init_dense(r[2 + 2 * l], 2 * D, D)
                for l in range(self.num_layers)
            ]
        # reference get_raw_features: node level-0 = proj(field embeds +
        # id embed) when the dataset carries features
        return self._init_node_feats(r[2 + 2 * self.num_layers], params)

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
        user_h = self._node_base(params, "user")
        item_h = self._node_base(params, "item")
        n_u, n_i = self.n_users, self.n_items
        if self.graph_paradigm == "u2i":
            # reference u2i: the USER side is the raw projected features
            # (sage_base.py:106 user_repr -> get_raw_features, NO conv);
            # only items run the SAGE layers
            user_raw = user_h
            for l in range(self.num_layers):
                rng, r2 = jax.random.split(rng)
                i_nbr_mean = self._sample_neighbor_mean(
                    user_h, self.item_nbr, self.item_deg, r2, train
                )
                act = (
                    (lambda x: x) if l == self.num_layers - 1
                    else jax.nn.relu
                )
                i_new = act(
                    dense(
                        params["item_w"][l],
                        jnp.concatenate([item_h[:n_i], i_nbr_mean], axis=1),
                    )
                )
                if train and self.dropout_rate > 0.0:
                    rng, rd = jax.random.split(rng)
                    i_new = dropout(i_new, self.dropout_rate, rd)
                item_h = (
                    jnp.zeros_like(item_h[:, : i_new.shape[1]])
                    .at[:n_i]
                    .set(i_new)
                )
            return user_raw, item_h
        for l in range(self.num_layers):
            rng, r1, r2 = jax.random.split(rng, 3)
            u_nbr_mean = self._sample_neighbor_mean(
                item_h, self.user_nbr, self.user_deg, r1, train
            )
            i_nbr_mean = self._sample_neighbor_mean(
                user_h, self.item_nbr, self.item_deg, r2, train
            )
            # the FINAL layer is linear (reference graphsage_module.py:133
            # applies relu only when layer < num_layers-1): relu-ing the
            # last layer forces nonnegative embeddings whose dot products
            # can't express dislikes — measured -0.10 AUC at the u2i
            # parity config
            act = (
                (lambda x: x) if l == self.num_layers - 1 else jax.nn.relu
            )
            u_new = act(
                dense(
                    params["user_w"][l],
                    jnp.concatenate([user_h[:n_u], u_nbr_mean], axis=1),
                )
            )
            i_new = act(
                dense(
                    params["item_w"][l],
                    jnp.concatenate([item_h[:n_i], i_nbr_mean], axis=1),
                )
            )
            if train and self.dropout_rate > 0.0:
                rng, rd1, rd2 = jax.random.split(rng, 3)
                u_new = dropout(u_new, self.dropout_rate, rd1)
                i_new = dropout(i_new, self.dropout_rate, rd2)
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

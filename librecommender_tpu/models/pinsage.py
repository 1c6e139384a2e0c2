"""PinSage: importance-weighted neighbor aggregation.

Reference parity: libreco/algorithms/pinsage.py:8 (+ pinsage_dgl.py:11,
collapsed): item neighborhoods are defined by bipartite random-walk visit
counts with importance weights (graph/adjacency.py `pinsage_neighbor_table`,
mirroring sampling/random_walks.py:75); aggregation is the weighted mean of
neighbor embeddings through a dense layer. Users aggregate their consumed
items uniformly (u2i paradigm).
"""
import jax
import jax.numpy as jnp

from .graphsage import GraphSage
from ..graph.adjacency import pinsage_neighbor_table
from ..ops.nn import dense, dropout


class PinSage(GraphSage):
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
        num_walks=10,
        neighbor_walk_len=2,
        termination_prob=0.5,
        max_stored_neighbors=50,
        paradigm="u2i",
        sample_walk_len=5,
        start_node="random",
        focus_start=False,
        seed=42,
        lower_upper_bound=None,  # accepted for API familiarity (ranking-only)
    ):
        super().__init__(
            task, data_info, loss_type, embed_size, n_epochs, lr, lr_decay,
            epsilon, reg, batch_size, sampler, num_neg,
            dropout_rate=dropout_rate, margin=margin, amsgrad=amsgrad,
            remove_edges=remove_edges, num_layers=num_layers,
            num_neighbors=num_neighbors,
            max_stored_neighbors=max_stored_neighbors, paradigm=paradigm,
            num_walks=num_walks, sample_walk_len=sample_walk_len,
            start_node=start_node, focus_start=focus_start, seed=seed,
        )
        self.all_args.update(
            num_walks=num_walks, neighbor_walk_len=neighbor_walk_len,
            termination_prob=termination_prob,
        )
        self.neighbor_walk_len = neighbor_walk_len
        self.termination_prob = termination_prob
        self.item_item_nbr = None
        self.item_item_w = None

    def build_model(self):
        nbr, w = pinsage_neighbor_table(
            self.data_info.user_consumed,
            self.data_info.item_consumed,
            self.n_items,
            num_walks=self.num_walks,
            walk_len=self.neighbor_walk_len,
            top_t=self.num_neighbors,
            termination_prob=self.termination_prob,
            seed=self.seed,
        )
        self.item_item_nbr = jnp.asarray(nbr)
        self.item_item_w = jnp.asarray(w)
        super().build_model()

    def _propagate(self, params, rng, train):
        user_h = self._node_base(params, "user")
        item_h = self._node_base(params, "item")
        n_u, n_i = self.n_users, self.n_items
        u2i = self.graph_paradigm == "u2i"
        for l in range(self.num_layers):
            # items: importance-weighted mean over walk neighborhoods
            nbr_embeds = item_h[self.item_item_nbr]             # (n_i, T, D)
            i_nbr_mean = jnp.einsum(
                "ntd,nt->nd", nbr_embeds, self.item_item_w
            )
            # final layer linear — the reference's output head ends in a
            # linear G2 (pinsage_module.py:96), so final embeddings are
            # signed; relu-ing the last conv forces nonnegative dots
            act = (
                (lambda x: x) if l == self.num_layers - 1 else jax.nn.relu
            )
            i_new = act(
                dense(
                    params["item_w"][l],
                    jnp.concatenate([item_h[:n_i], i_nbr_mean], axis=1),
                )
            )
            if not u2i:
                rng, r1 = jax.random.split(rng)
                # users: uniform mean over consumed items
                u_nbr_mean = self._sample_neighbor_mean(
                    item_h, self.user_nbr, self.user_deg, r1, train
                )
                u_new = act(
                    dense(
                        params["user_w"][l],
                        jnp.concatenate([user_h[:n_u], u_nbr_mean], axis=1),
                    )
                )
            if train and self.dropout_rate > 0.0:
                rng, rd1, rd2 = jax.random.split(rng, 3)
                i_new = dropout(i_new, self.dropout_rate, rd2)
                if not u2i:
                    u_new = dropout(u_new, self.dropout_rate, rd1)
            if not u2i:
                user_h = jnp.zeros_like(user_h).at[:n_u].set(u_new)
            item_h = jnp.zeros_like(item_h).at[:n_i].set(i_new)
        # reference u2i: user side is the raw projected features
        # (sage_base.py:106), only items run the conv stack
        return user_h, item_h

    def post_load(self):
        nbr, w = pinsage_neighbor_table(
            self.data_info.user_consumed,
            self.data_info.item_consumed,
            self.n_items,
            num_walks=self.num_walks,
            walk_len=self.neighbor_walk_len,
            top_t=self.num_neighbors,
            termination_prob=self.termination_prob,
            seed=self.seed,
        )
        self.item_item_nbr = jnp.asarray(nbr)
        self.item_item_w = jnp.asarray(w)
        super().post_load()

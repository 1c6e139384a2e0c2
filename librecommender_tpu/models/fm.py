"""FM: factorization machine (NFM-style pairwise-interaction head).

Reference parity: libreco/algorithms/fm.py:18 — first-order linear term over
all features + the second-order pairwise-interaction *vector*
0.5 * ((sum_f v_f)^2 - sum_f v_f^2) projected by a linear head
(docs/md_doc/implementation_details.md:25 in the reference).
"""
import jax
import jax.numpy as jnp

from ..bases.feat_base import FeatBase
from ..ops.initializers import truncated_normal
from ..ops.nn import dropout, init_layer_norm, layer_norm
from ..parallel.mesh import aligned_rows


class FM(FeatBase):
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
        use_bn=True,
        dropout_rate=None,
        multi_sparse_combiner="sqrtn",
        seed=42,
        lower_upper_bound=None,
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        super().__init__(
            task, data_info, loss_type, embed_size, n_epochs, lr, lr_decay,
            epsilon, reg, batch_size, sampler, num_neg, seed,
            lower_upper_bound, multi_sparse_combiner,
        )
        # norm + dropout on the pairwise-interaction vector before the head
        # (reference fm.py:165-169 applies BN there; LN is the fusion-friendly
        # TPU analog used framework-wide)
        self.use_bn = use_bn
        self.dropout_rate = dropout_rate or 0.0

    def _init_params(self, rng):
        D = self.embed_size
        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        r = jax.random.split(rng, 5)
        params = {
            "user_embed": truncated_normal(r[0], (u_rows, D)),
            "item_embed": truncated_normal(r[1], (i_rows, D)),
            "pair_head": truncated_normal(r[2], (D,), scale=D ** -0.5),
        }
        if self.use_bn:
            params["pair_ln"] = init_layer_norm(D)
        params.update(self._init_linear(r[3], u_rows, i_rows))
        if self.feats.has_sparse:
            params["sparse_embed"] = truncated_normal(r[4], (self._sparse_rows(), D))
        if self.feats.has_dense:
            params["dense_embed"] = truncated_normal(
                jax.random.fold_in(rng, 7), (self.feats.n_dense_fields, D)
            )
        return params

    def _forward(self, params, inputs, train, rng):
        users, items = inputs["user"], inputs["item"]
        embeds, sparse_idx, dense_vals = self._field_embeds(params, inputs)
        linear = self._linear_term(params, users, items, sparse_idx, dense_vals)
        sum_sq = jnp.square(jnp.sum(embeds, axis=1))
        sq_sum = jnp.sum(jnp.square(embeds), axis=1)
        pairwise = 0.5 * (sum_sq - sq_sum)                      # (B, D)
        if self.use_bn:
            pairwise = layer_norm(params["pair_ln"], pairwise)
        if train and self.dropout_rate > 0.0:
            pairwise = dropout(pairwise, self.dropout_rate, rng)
        return linear + pairwise @ params["pair_head"]

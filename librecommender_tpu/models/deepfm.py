"""DeepFM: FM + deep MLP over the shared field embeddings.

Reference parity: libreco/algorithms/deepfm.py:19 — the FM first/second-order
parts and a DNN tower over the concatenated field embeddings, summed into one
logit.
"""
import jax
import jax.numpy as jnp

from ..bases.feat_base import FeatBase
from ..ops.initializers import truncated_normal
from ..ops.nn import dense, init_dense, init_mlp, mlp
from ..parallel.mesh import aligned_rows


class DeepFM(FeatBase):
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
        hidden_units=(128, 64, 32),
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
        self.hidden_units = tuple(hidden_units)
        self.use_bn = use_bn
        self.dropout_rate = dropout_rate or 0.0

    def _init_params(self, rng):
        D = self.embed_size
        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        r = jax.random.split(rng, 7)
        params = {
            "user_embed": truncated_normal(r[0], (u_rows, D)),
            "item_embed": truncated_normal(r[1], (i_rows, D)),
            "pair_head": truncated_normal(r[2], (D,), scale=D ** -0.5),
        }
        params.update(self._init_linear(r[3], u_rows, i_rows))
        if self.feats.has_sparse:
            params["sparse_embed"] = truncated_normal(r[4], (self._sparse_rows(), D))
        if self.feats.has_dense:
            params["dense_embed"] = truncated_normal(
                r[5], (self.feats.n_dense_fields, D)
            )
        deep_in = self.n_fields * D
        params["deep_mlp"] = init_mlp(r[6], deep_in, list(self.hidden_units),
                                      use_ln=self.use_bn)
        params["deep_out"] = init_dense(
            jax.random.fold_in(rng, 11), self.hidden_units[-1], 1
        )
        return params

    def _forward(self, params, inputs, train, rng):
        users, items = inputs["user"], inputs["item"]
        embeds, sparse_idx, dense_vals = self._field_embeds(params, inputs)
        linear = self._linear_term(params, users, items, sparse_idx, dense_vals)
        sum_sq = jnp.square(jnp.sum(embeds, axis=1))
        sq_sum = jnp.sum(jnp.square(embeds), axis=1)
        fm_part = 0.5 * (sum_sq - sq_sum) @ params["pair_head"]
        flat = embeds.reshape(embeds.shape[0], -1)
        h = mlp(params["deep_mlp"], flat, dropout_rate=self.dropout_rate,
                train=train, rng=rng)
        deep_part = dense(params["deep_out"], h)[:, 0]
        return linear + fm_part + deep_part

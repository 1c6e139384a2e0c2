"""Wide & Deep with dual optimizers (FTRL wide / Adam deep).

Reference parity: libreco/algorithms/wide_deep.py:19 and the WideDeepTrainer
variable partition (libreco/training/tf_trainer.py:248-311). The wide part is
the first-order linear term trained with FTRL-proximal; the deep part is an
MLP over the field embeddings trained with Adam. Implemented with
`optax.multi_transform` over a params-label pytree.
"""
import jax
import optax

from ..bases.feat_base import FeatBase
from ..ops.initializers import truncated_normal
from ..ops.nn import dense, init_dense, init_mlp, mlp
from ..parallel.mesh import aligned_rows
from ..training.optimizers import ftrl


class WideDeep(FeatBase):
    def __init__(
        self,
        task,
        data_info,
        loss_type="cross_entropy",
        embed_size=16,
        n_epochs=20,
        lr=None,
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
        # reference default: {"wide": 0.01, "deep": 1e-4}
        lr = lr if lr is not None else {"wide": 0.01, "deep": 1e-4}
        if not isinstance(lr, dict) or "wide" not in lr or "deep" not in lr:
            raise ValueError("`lr` for WideDeep must be dict {'wide': v, 'deep': v}")
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
        r = jax.random.split(rng, 6)
        params = {
            "user_embed": truncated_normal(r[0], (u_rows, D)),
            "item_embed": truncated_normal(r[1], (i_rows, D)),
        }
        params.update(self._init_linear(r[2], u_rows, i_rows))
        if self.feats.has_sparse:
            params["sparse_embed"] = truncated_normal(r[3], (self._sparse_rows(), D))
        if self.feats.has_dense:
            params["dense_embed"] = truncated_normal(
                r[4], (self.feats.n_dense_fields, D)
            )
        deep_in = self.n_fields * D
        params["deep_mlp"] = init_mlp(r[5], deep_in, list(self.hidden_units),
                                      use_ln=self.use_bn)
        params["deep_out"] = init_dense(
            jax.random.fold_in(rng, 11), self.hidden_units[-1], 1
        )
        return params

    def _forward(self, params, inputs, train, rng):
        users, items = inputs["user"], inputs["item"]
        embeds, sparse_idx, dense_vals = self._field_embeds(params, inputs)
        wide = self._linear_term(params, users, items, sparse_idx, dense_vals)
        flat = embeds.reshape(embeds.shape[0], -1)
        h = mlp(params["deep_mlp"], flat, dropout_rate=self.dropout_rate,
                train=train, rng=rng)
        deep = dense(params["deep_out"], h)[:, 0]
        return wide + deep

    def _custom_optimizer(self):
        """FTRL on wide (linear_*) params, Adam on everything else."""

        def label_fn(params):
            return {
                k: ("wide" if k.startswith("linear_") else "deep") for k in params
            }

        return optax.multi_transform(
            {
                "wide": ftrl(self.lr["wide"]),
                "deep": optax.adam(self.lr["deep"], eps=self.epsilon),
            },
            label_fn,
        )

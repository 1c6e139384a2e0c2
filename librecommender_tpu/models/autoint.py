"""AutoInt: automatic feature interaction via multi-head self-attention.

Reference parity: libreco/algorithms/autoint.py:17 — stacked interacting
layers (multi-head self-attention over the field axis with a residual
projection), flattened into a final linear head.
"""
import jax

from ..bases.feat_base import FeatBase
from ..ops.initializers import truncated_normal
from ..ops.nn import dense, init_dense, init_mha, mha
from ..parallel.mesh import aligned_rows


class AutoInt(FeatBase):
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
        dropout_rate=None,  # accepted but unused, as in the reference (autoint.py:125 stores, never applies)
        att_embed_size=(8, 8, 8),
        num_heads=2,
        use_residual=True,
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
        self.att_layer_dims = tuple(d * num_heads for d in att_embed_size)
        self.num_heads = num_heads
        self.use_residual = use_residual

    def _init_params(self, rng):
        D = self.embed_size
        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        r = jax.random.split(rng, 5 + 2 * len(self.att_layer_dims))
        params = {
            "user_embed": truncated_normal(r[0], (u_rows, D)),
            "item_embed": truncated_normal(r[1], (i_rows, D)),
        }
        if self.feats.has_sparse:
            params["sparse_embed"] = truncated_normal(r[2], (self._sparse_rows(), D))
        if self.feats.has_dense:
            params["dense_embed"] = truncated_normal(
                r[3], (self.feats.n_dense_fields, D)
            )
        layers = []
        dim_in = D
        for li, dim_out in enumerate(self.att_layer_dims):
            layer = {
                "mha": init_mha(
                    r[4 + 2 * li], dim_in, self.num_heads, dim_out // self.num_heads
                )
            }
            # mha projects back to dim_in via wo; re-project to dim_out
            layer["proj"] = init_dense(r[5 + 2 * li], dim_in, dim_out)
            layers.append(layer)
            dim_in = dim_out
        params["att_layers"] = layers
        params["head"] = init_dense(
            jax.random.fold_in(rng, 99), self.n_fields * dim_in, 1
        )
        return params

    def _forward(self, params, inputs, train, rng):
        x, _, _ = self._field_embeds(params, inputs)  # (B, F, D)
        B, F = x.shape[0], x.shape[1]
        for layer in params["att_layers"]:
            att = mha(layer["mha"], x, x, num_heads=self.num_heads)
            # residual/activation/projection on flat (B*F, dim) tokens —
            # the (B, F, dim) view pads to (B, 8, 128) tiles at F=5
            af = att.reshape(B * F, -1)
            if self.use_residual:
                af = af + x.reshape(B * F, -1)
            x = jax.nn.relu(dense(layer["proj"], af)).reshape(B, F, -1)
        flat = x.reshape(B, -1)
        return dense(params["head"], flat)[:, 0]

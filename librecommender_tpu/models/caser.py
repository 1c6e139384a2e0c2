"""Caser: convolutional sequence embedding (horizontal + vertical filters).

Reference parity: libreco/algorithms/caser.py:8 — horizontal convs of
heights 1..nh_span max-pooled over time, vertical convs over the time axis,
concatenated with the user latent vector and projected to the user embedding.
"""
import jax
import jax.numpy as jnp

from ..bases.dyn_embed_base import DynEmbedBase
from ..ops.initializers import truncated_normal
from ..ops.nn import conv1d, dense, init_conv1d, init_dense
from ..parallel.mesh import aligned_rows


class Caser(DynEmbedBase):
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
        use_bn=False,
        dropout_rate=None,  # accepted but unused, as in the reference (caser.py:129 stores, never applies)
        nh_filters=2,
        nv_filters=4,
        reg=None,
        batch_size=256,
        sampler="random",
        num_neg=1,
        recent_num=10,
        random_num=None,
        norm_embed=False,
        seed=42,
        lower_upper_bound=None,
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        super().__init__(
            task, data_info, loss_type, embed_size, norm_embed,
            recent_num, random_num, lower_upper_bound, seed,
        )
        self.nh_filters = nh_filters  # filters per horizontal height
        self.nv_filters = nv_filters
        self.n_epochs = n_epochs
        self.lr = lr
        self.lr_decay = lr_decay
        self.epsilon = epsilon
        self.reg = reg
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_neg = num_neg

    def _init_params(self, rng):
        D = self.embed_size
        L = self.max_seq_len
        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        r = jax.random.split(rng, 5 + L)
        params = {
            "user_embed": truncated_normal(r[0], (u_rows, D)),
            "item_embed_in": truncated_normal(r[1], (i_rows, D)),
            "item_embed": truncated_normal(r[2], (i_rows, D)),
            "item_bias": jnp.zeros((i_rows,)),
            # horizontal convs: heights 1..L, nh filters each
            "h_convs": [
                init_conv1d(r[3 + h], h + 1, D, self.nh_filters) for h in range(L)
            ],
            # vertical conv: combine across time per embedding dim
            "v_weight": truncated_normal(r[3 + L], (L, self.nv_filters)),
        }
        fc_in = L * self.nh_filters + self.nv_filters * D + D
        params["proj"] = init_dense(r[4 + L], fc_in, D)
        return params

    def _user_repr(self, params, users, seq, train, rng):
        embeds = params["item_embed_in"][seq]                   # (B, L, D)
        mask = (seq != self.pad_id).astype(embeds.dtype)
        embeds = embeds * mask[:, :, None]
        h_outs = []
        for conv in params["h_convs"]:
            out = jax.nn.relu(conv1d(conv, embeds))             # (B, L-h+1, nh)
            h_outs.append(jnp.max(out, axis=1))                 # (B, nh)
        h_cat = jnp.concatenate(h_outs, axis=1)
        v_out = jnp.einsum("bld,lf->bfd", embeds, params["v_weight"])
        v_cat = v_out.reshape(v_out.shape[0], -1)
        user_latent = params["user_embed"][users]
        out = dense(
            params["proj"], jnp.concatenate([h_cat, v_cat, user_latent], axis=1)
        )
        if self.norm_embed:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-8
            )
        return out

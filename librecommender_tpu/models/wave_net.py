"""WaveNet: dilated causal convolutions over the behavior sequence.

Reference parity: libreco/algorithms/wave_net.py:8 — stacked dilated causal
conv blocks (dilations 1,2,4,...) over item embeddings, a final 1x1 conv,
a global max-pool over time projected to embed_size, concatenated with a
static per-user embedding (wave_net.py:181-222).
"""
import jax
import jax.numpy as jnp

from ..bases.dyn_embed_base import DynEmbedBase
from ..ops.initializers import truncated_normal
from ..ops.nn import causal_conv1d, dense, init_conv1d, init_dense
from ..parallel.mesh import aligned_rows


class WaveNet(DynEmbedBase):
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
        n_blocks=1,
        n_layers_per_block=4,
        use_bn=False,
        dropout_rate=None,  # accepted but unused, as in the reference (wave_net.py:132 stores, never applies)
        n_filters=16,
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
        self.n_blocks = n_blocks
        self.n_layers_per_block = n_layers_per_block
        self.n_filters = n_filters
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
        u_rows = aligned_rows(self.n_users)
        i_rows = aligned_rows(self.n_items)
        n_convs = self.n_blocks * self.n_layers_per_block
        r = jax.random.split(rng, 6 + n_convs)
        convs = []
        in_ch = D
        for i in range(n_convs):
            convs.append(init_conv1d(r[3 + i], 2, in_ch, self.n_filters))
            in_ch = self.n_filters
        return {
            "item_embed_in": truncated_normal(r[0], (i_rows, D)),
            # the user side is concat(static user embed, conv summary) —
            # 2D wide, so item embeddings are 2D too (reference
            # wave_net.py:222 tf.concat([user_repr, convs_out]))
            "user_embed": truncated_normal(r[4], (u_rows, D)),
            "item_embed": truncated_normal(r[1], (i_rows, 2 * D)),
            "item_bias": jnp.zeros((i_rows,)),
            "convs": convs,
            # reference wave_net.py:210: a final kernel-size-1 conv (relu)
            # after the dilated stack, before the global max-pool
            "final_conv": init_conv1d(
                r[5], 1, self.n_filters, self.n_filters
            ),
            "proj": init_dense(r[2], self.n_filters, D),
        }

    def _user_repr(self, params, users, seq, train, rng):
        x = params["item_embed_in"][seq]                        # (B, L, D)
        for i, conv in enumerate(params["convs"]):
            dilation = 2 ** (i % self.n_layers_per_block)
            x = jax.nn.relu(causal_conv1d(conv, x, dilation=dilation))
        x = jax.nn.relu(causal_conv1d(params["final_conv"], x, dilation=1))
        # global max-pool over the sequence (reference wave_net.py:219),
        # not the last timestep
        x = jnp.max(x, axis=1)
        conv_out = dense(params["proj"], x)
        out = jnp.concatenate(
            [params["user_embed"][users], conv_out], axis=1
        )
        if self.norm_embed:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-8
            )
        return out

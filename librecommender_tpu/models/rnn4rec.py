"""RNN4Rec / GRU4Rec: recurrent user-state model.

Reference parity: libreco/algorithms/rnn4rec.py:9 — GRU (or LSTM) over the
behavior sequence; final hidden state projected to the user embedding;
scores = <user, item_out> + bias. Supports cross_entropy / focal / bpr
losses (bpr trains pairwise).
"""
import jax
import jax.numpy as jnp

from ..bases.dyn_embed_base import DynEmbedBase
from ..ops.initializers import truncated_normal
from ..ops.nn import (
    dense, dropout, gru, init_dense, init_gru, init_layer_norm, init_lstm,
    layer_norm, lstm,
)
from ..parallel.mesh import aligned_rows


class RNN4Rec(DynEmbedBase):
    def __init__(
        self,
        task,
        data_info,
        rnn_type="gru",
        loss_type="cross_entropy",
        embed_size=16,
        n_epochs=20,
        lr=0.001,
        lr_decay=False,
        epsilon=1e-5,
        hidden_units=(16,),
        reg=None,
        batch_size=256,
        sampler="random",
        num_neg=1,
        dropout_rate=None,
        use_layer_norm=False,
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
        assert rnn_type in ("gru", "lstm")
        super().__init__(
            task, data_info, loss_type, embed_size, norm_embed,
            recent_num, random_num, lower_upper_bound, seed,
        )
        self.rnn_type = rnn_type
        self.hidden_dim = tuple(hidden_units)[0]
        # input dropout on the sequence embeddings + LN on the final state
        # (reference layers/recurrent.py:36-43 applies keras dropout/LN per
        # rnn layer; the recurrent state path here is a fixed tanh cell)
        self.dropout_rate = dropout_rate or 0.0
        self.use_layer_norm = use_layer_norm
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
        i_rows = aligned_rows(self.n_items)
        r = jax.random.split(rng, 4)
        init_rnn = init_gru if self.rnn_type == "gru" else init_lstm
        return {
            "item_embed_in": truncated_normal(r[0], (i_rows, D)),
            "rnn": init_rnn(r[1], D, self.hidden_dim),
            **({"rnn_ln": init_layer_norm(self.hidden_dim)}
               if self.use_layer_norm else {}),
            "proj": init_dense(r[2], self.hidden_dim, D),
            "item_embed": truncated_normal(r[3], (i_rows, D)),
            "item_bias": jnp.zeros((i_rows,)),
        }

    def _user_repr(self, params, users, seq, train, rng):
        embeds = params["item_embed_in"][seq]                   # (B, L, D)
        if train and self.dropout_rate > 0.0:
            rng, sub = jax.random.split(rng)
            embeds = dropout(embeds, self.dropout_rate, sub)
        mask = seq != self.pad_id
        run = gru if self.rnn_type == "gru" else lstm
        h_final, _ = run(params["rnn"], embeds, mask=mask)
        if self.use_layer_norm:
            h_final = jnp.tanh(layer_norm(params["rnn_ln"], h_final))
        out = dense(params["proj"], h_final)
        if self.norm_embed:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-8
            )
        return out

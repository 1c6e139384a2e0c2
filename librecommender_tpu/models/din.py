"""DIN: Deep Interest Network — target attention over behavior history.

Reference parity: libreco/algorithms/din.py:24 with the paper-faithful MLP
local-activation unit (`din_attention`, libreco/layers/attention.py:28):
per history position, an MLP over [key, query, key-query, key*query]
produces attention logits; masked softmax weights pool the history.
"""
import jax
import jax.numpy as jnp

from ..bases.seq_base import SeqFeatBase
from ..ops.initializers import truncated_normal
from ..ops.nn import (
    dense,
    din_attention,
    init_dense,
    init_din_attention,
    init_mlp,
    mlp,
)
from ..parallel.mesh import aligned_rows


class DIN(SeqFeatBase):
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
        recent_num=10,
        random_num=None,
        use_tf_attention=False,  # accepted for API familiarity (TF-impl switch); ignored
        feat_agg_mode=None,
        multi_sparse_combiner="sqrtn",
        sparse_optimizer=False,
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
            recent_num=recent_num, random_num=random_num,
        )
        self.hidden_units = tuple(hidden_units)
        self.use_bn = use_bn
        self.dropout_rate = dropout_rate or 0.0
        self.sparse_optimizer = sparse_optimizer
        # the reference builds attention keys/targets from feature-augmented
        # tokens unconditionally (din.py:207 combine_seq_features "concat");
        # the default here keeps bare item tokens — the profiled-lean path —
        # with 'concat'/'elementwise' giving the reference construction
        if feat_agg_mode not in ("concat", "elementwise", None):
            raise ValueError("`feat_agg_mode` must be `concat`, `elementwise` or None")
        self.feat_agg_mode = feat_agg_mode
        if use_tf_attention:
            import warnings

            warnings.warn(
                "`use_tf_attention=True` is accepted for API familiarity "
                "but has no effect: this DIN always uses the paper-style "
                "attention (the reference's default use_tf_attention=False "
                "path, din.py:247)",
                UserWarning,
                stacklevel=2,
            )

    def _init_params(self, rng):
        D = self.embed_size
        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        r = jax.random.split(rng, 7)
        params = {
            "user_embed": truncated_normal(r[0], (u_rows, D)),
            "item_embed": truncated_normal(r[1], (i_rows, D)),
        }
        if self.feats.has_sparse:
            params["sparse_embed"] = truncated_normal(r[3], (self._sparse_rows(), D))
        if self.feats.has_dense:
            params["dense_embed"] = truncated_normal(
                r[4], (self.feats.n_dense_fields, D)
            )
        params["att"] = init_din_attention(r[2], self.token_dim)
        self._init_token_norms(params)
        in_dim = self.n_fields * D + self.token_dim  # fields + attended history
        params["mlp"] = init_mlp(r[5], in_dim, list(self.hidden_units),
                                 use_ln=self.use_bn)
        params["head"] = init_dense(r[6], self.hidden_units[-1], 1)
        return params

    shared_seq = True  # pos/neg targets share each row's history (loss_fn)

    def _score_catalog(self, params, users, n_users_call, overrides=None,
                       items=None):
        """Full-catalog scoring with per-user seq work shared across items:
        the catalog is the multi-target axis of din_attention, so the
        seq-token gather/embedding runs once per user instead of n_items
        times (the generic pair loop repeats it per item). ``overrides``:
        optional per-user (U, L) "seq" / (U, F) feature rows (dynamic
        online requests) — consumed at (U,)-width, never tiled to items.
        ``items``: optional (T,) item subset (tiled native serving)."""
        if items is None:
            items = jnp.arange(self.n_items, dtype=jnp.int32)
        n_items = items.shape[0]
        seq = self._catalog_seq(users, overrides)
        seq_emb = self._token_embeds(params, seq)           # (U, L, TD)
        mask = seq != self.pad_id
        target = self._token_embeds(params, items)          # (n_items, TD)
        tgt = jnp.broadcast_to(
            target[:, None, :], (n_items, n_users_call, target.shape[1])
        )
        att = din_attention(params["att"], tgt, seq_emb, mask)
        att_out = att.transpose(1, 0, 2).reshape(
            n_users_call * n_items, att.shape[-1]
        )
        embeds, _, _ = self._field_embeds(
            params,
            self._catalog_pair_inputs(users, n_users_call, overrides, items),
        )
        x = jnp.concatenate(
            [embeds.reshape(embeds.shape[0], -1), att_out], axis=1
        )
        h = mlp(params["mlp"], x, dropout_rate=0.0, train=False, rng=None)
        return dense(params["head"], h)[:, 0].reshape(n_users_call, n_items)

    def _forward(self, params, inputs, train, rng):
        users, items = inputs["user"], inputs["item"]
        embeds, _, _ = self._field_embeds(params, inputs)
        seq = self._seq_for(inputs)
        seq_emb = self._token_embeds(params, seq)               # (B, L, TD)
        mask = seq != self.pad_id
        target = self._token_embeds(params, items)              # (TB, TD)
        B = seq.shape[0]
        if target.shape[0] != B:
            # shared-seq training: attend all targets over the row's shared
            # keys in one (T, B, D) call, then restore the row order
            att = din_attention(
                params["att"], self._target_blocks(target, B), seq_emb, mask
            )
            att_out = self._blocks_to_rows(att)
        else:
            att_out = din_attention(params["att"], target, seq_emb, mask)
        x = jnp.concatenate([embeds.reshape(embeds.shape[0], -1), att_out], axis=1)
        h = mlp(params["mlp"], x, dropout_rate=self.dropout_rate, train=train, rng=rng)
        return dense(params["head"], h)[:, 0]

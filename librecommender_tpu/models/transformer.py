"""Transformer (BST): behavior-sequence transformer ranking model.

Reference parity: libreco/algorithms/transformer.py:35 — each sequence token
is the item embedding AGGREGATED WITH the item's unique features
(``feat_agg_mode``: 'concat' flattens item sparse/dense field embeddings
into the token, 'elementwise' sums layer-normed field embeddings into the
item embedding — tfops/features.py `combine_seq_features`), the target item
is appended to the behavior sequence, positions are added ('trainable' table
or 'sinusoidal' — transformer.py:88), a stack of encoder layers (optionally
causal-masked, transformer.py:90) attends over (seq + target), and the
output at the target position joins the other feature fields in an MLP head.

``feat_agg_mode=None`` is an extension: bare item-embedding tokens (skips
the per-token feature gathers; the lean high-throughput variant).
"""
import jax
import jax.numpy as jnp

from ..bases.seq_base import SeqFeatBase
from ..ops.initializers import truncated_normal
from ..ops.nn import (
    dense,
    init_dense,
    init_mlp,
    init_transformer_layer,
    mlp,
    positional_encoding,
    transformer_layer,
    transformer_target_out,
)
from ..parallel.mesh import aligned_rows


class Transformer(SeqFeatBase):
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
        num_heads=2,
        num_tfm_layers=1,
        positional_embedding="trainable",
        use_causal_mask=False,
        feat_agg_mode="concat",
        multi_sparse_combiner="sqrtn",
        compute_dtype="bf16",
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
        if compute_dtype not in ("bf16", "f32", None):
            raise ValueError("compute_dtype must be 'bf16', 'f32' or None")
        if positional_embedding not in ("trainable", "sinusoidal"):
            raise ValueError(
                "`positional_embedding` must be `trainable` or `sinusoidal`."
            )
        if feat_agg_mode not in ("concat", "elementwise", None):
            raise ValueError("`feat_agg_mode` must be `concat` or `elementwise`.")
        self.compute_dtype = compute_dtype
        self.use_bn = use_bn
        self.dropout_rate = dropout_rate or 0.0
        self.num_heads = num_heads
        self.num_tfm_layers = num_tfm_layers
        self.positional_embedding = positional_embedding
        self.use_causal_mask = use_causal_mask
        self.feat_agg_mode = feat_agg_mode

    def _init_params(self, rng):
        D, TD = self.embed_size, self.token_dim
        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        r = jax.random.split(rng, 7 + self.num_tfm_layers)
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
        self._init_token_norms(params)
        if self.positional_embedding == "trainable":
            params["pos_embed"] = truncated_normal(
                r[6], (self.max_seq_len + 1, TD), scale=0.02
            )
        params["tfm_layers"] = [
            init_transformer_layer(r[7 + li], TD, self.num_heads, 4 * TD)
            for li in range(self.num_tfm_layers)
        ]
        in_dim = self.n_fields * D + TD
        params["mlp"] = init_mlp(
            r[4], in_dim, list(self.hidden_units), use_ln=self.use_bn,
        )
        params["head"] = init_dense(r[5], self.hidden_units[-1], 1)
        return params

    shared_seq = True  # pos/neg targets share each row's history tokens

    def _forward(self, params, inputs, train, rng):
        users, items = inputs["user"], inputs["item"]
        embeds, _, _ = self._field_embeds(params, inputs)
        seq = self._seq_for(inputs)
        seq_emb = self._token_embeds(params, seq)               # (B, L, TD)
        mask = seq != self.pad_id
        target = self._token_embeds(params, items)              # (TB, TD)
        B, L, TD = seq_emb.shape
        shared = target.shape[0] != B
        if self.num_tfm_layers == 1 or self.use_causal_mask:
            # only the target position feeds the head, and seq-token
            # outputs are target-independent here (single layer, or causal
            # mask with the target last) — share the seq-token work across
            # targets instead of broadcasting the encoder over (T*B, L+1)
            target_out = self._encode_fast(params, seq_emb, mask, target, B)
        else:
            target_out = self._encode_broadcast(
                params, seq_emb, mask, target, B
            )
        flat = jnp.concatenate(
            [embeds.reshape(embeds.shape[0], -1), target_out], axis=1
        )
        h = mlp(params["mlp"], flat, dropout_rate=self.dropout_rate,
                train=train, rng=rng)
        return dense(params["head"], h)[:, 0]

    def _encode_fast(self, params, seq_emb, mask, target, B):
        """Shared-seq encoder: seq K/V once, per-target rows only."""
        L, TD = seq_emb.shape[1], seq_emb.shape[2]
        shared = target.shape[0] != B
        tgt = self._target_blocks(target, B) if shared else target[None]
        if self.positional_embedding == "trainable":
            pos = params["pos_embed"]
        else:
            pos = positional_encoding(L + 1, TD)
        seq_tok = seq_emb + pos[None, :L]
        tgt_tok = tgt + pos[L][None, None]
        tfm_layers = params["tfm_layers"]
        if self.compute_dtype == "bf16":
            seq_tok = seq_tok.astype(jnp.bfloat16)
            tgt_tok = tgt_tok.astype(jnp.bfloat16)
            tfm_layers = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16), tfm_layers
            )
        out = transformer_target_out(
            tfm_layers, seq_tok, mask, tgt_tok,
            num_heads=self.num_heads, causal=self.use_causal_mask,
        ).astype(jnp.float32)                                   # (T, B, TD)
        return self._blocks_to_rows(out) if shared else out[0]

    def _score_catalog(self, params, users, n_users_call, overrides=None,
                       items=None):
        """Full-catalog scoring with per-user seq work shared across items.

        The generic score_all repeats each user's (L,) history once per
        item, paying the seq-token gather + K/V projections n_items times;
        here the catalog is the target-block axis of the shared-seq encoder
        (T = n_items), so those run once per user. Exact under the same
        conditions as the training fast path; otherwise defers to the
        generic pair loop. ``overrides``: per-user (U, L) "seq" / (U, F)
        feature rows for dynamic requests. ``items``: optional (T,) item
        subset (tiled native serving).
        """
        if items is None:
            items = jnp.arange(self.n_items, dtype=jnp.int32)
        n_items = items.shape[0]
        if self.num_tfm_layers > 1 and not self.use_causal_mask:
            # general encoder path: every (target, seq) pair is distinct, so
            # the per-user rows genuinely fan out over items (device-side)
            inputs = self._catalog_pair_inputs(
                users, n_users_call, overrides, items
            )
            if overrides and overrides.get("seq") is not None:
                inputs["seq"] = jnp.repeat(overrides["seq"], n_items, axis=0)
            logits = self._forward(params, inputs, train=False, rng=None)
            return logits.reshape(n_users_call, n_items)
        seq = self._catalog_seq(users, overrides)
        seq_emb = self._token_embeds(params, seq)           # (U, L, TD)
        mask = seq != self.pad_id
        target = self._token_embeds(params, items)          # (n_items, TD)
        U, L, TD = seq_emb.shape
        if self.positional_embedding == "trainable":
            pos = params["pos_embed"]
        else:
            pos = positional_encoding(L + 1, TD)
        seq_tok = seq_emb + pos[None, :L]
        tgt_tok = jnp.broadcast_to(
            target[:, None, :], (n_items, U, TD)
        ) + pos[L][None, None]
        tfm_layers = params["tfm_layers"]
        if self.compute_dtype == "bf16":
            seq_tok = seq_tok.astype(jnp.bfloat16)
            tgt_tok = tgt_tok.astype(jnp.bfloat16)
            tfm_layers = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16), tfm_layers
            )
        out = transformer_target_out(
            tfm_layers, seq_tok, mask, tgt_tok,
            num_heads=self.num_heads, causal=self.use_causal_mask,
        ).astype(jnp.float32)                               # (n_items, U, TD)
        target_out = out.transpose(1, 0, 2).reshape(U * n_items, TD)
        embeds, _, _ = self._field_embeds(
            params,
            self._catalog_pair_inputs(users, n_users_call, overrides, items),
        )
        flat = jnp.concatenate(
            [embeds.reshape(embeds.shape[0], -1), target_out], axis=1
        )
        h = mlp(params["mlp"], flat, dropout_rate=0.0, train=False, rng=None)
        return dense(params["head"], h)[:, 0].reshape(n_users_call, n_items)

    def _encode_broadcast(self, params, seq_emb, mask, target, B):
        """Full encoder over every (target, seq) pair — the general path
        (multi-layer, non-causal stacks need true seq-token outputs)."""
        L, TD = seq_emb.shape[1], seq_emb.shape[2]
        shared = target.shape[0] != B
        if shared:
            # the encoder itself is target-dependent (target joins the
            # token sequence), but the seq token gather and its backward
            # scatter-add run once: the broadcast's backward is a cheap
            # cross-target sum into the shared (B, L, TD) embeddings
            tgt = self._target_blocks(target, B)                # (T, B, TD)
            T = tgt.shape[0]
            x = jnp.concatenate([
                jnp.broadcast_to(seq_emb[None], (T, B, L, TD)).reshape(T * B, L, TD),
                tgt.reshape(T * B, 1, TD),
            ], axis=1)                                          # (TB, L+1, TD)
            full_mask = jnp.concatenate([
                jnp.broadcast_to(mask[None], (T, B, L)).reshape(T * B, L),
                jnp.ones((T * B, 1), bool),
            ], axis=1)
        else:
            x = jnp.concatenate([seq_emb, target[:, None, :]], axis=1)
            full_mask = jnp.concatenate(
                [mask, jnp.ones((mask.shape[0], 1), bool)], axis=1
            )
        if self.positional_embedding == "trainable":
            x = x + params["pos_embed"][None, : x.shape[1]]
        else:
            x = x + positional_encoding(x.shape[1], TD)[None]
        # the encoder's cost is ~60 bandwidth passes over the (B, L+1, TD)
        # activations (no single op dominates — profiled); bf16 halves
        # every pass and doubles the MXU rate. Params stay f32 (cast per
        # use); the head MLP and loss stay f32.
        tfm_layers = params["tfm_layers"]
        if self.compute_dtype == "bf16":
            x = x.astype(jnp.bfloat16)
            tfm_layers = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16), tfm_layers
            )
        for layer in tfm_layers:
            x = transformer_layer(
                layer, x, mask=full_mask, causal=self.use_causal_mask,
                num_heads=self.num_heads,
            )
        target_out = x[:, -1, :].astype(jnp.float32)            # (TB, TD)
        if shared:
            target_out = self._blocks_to_rows(target_out.reshape(T, B, TD))
        return target_out

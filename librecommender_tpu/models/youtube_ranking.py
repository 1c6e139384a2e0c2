"""YouTubeRanking: deep ranking net with mean-pooled behavior sequence.

Reference parity: libreco/algorithms/youtube_ranking.py:21 — candidate item
fields + user fields + average-pooled watch history into an MLP.
"""
import jax
import jax.numpy as jnp

from ..bases.seq_base import SeqFeatBase
from ..ops.initializers import truncated_normal
from ..ops.nn import dense, init_dense, init_mlp, mlp
from ..parallel.mesh import aligned_rows


class YouTubeRanking(SeqFeatBase):
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
        multi_sparse_combiner="sqrtn",
        seed=42,
        lower_upper_bound=None,
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        if task == "rating":
            raise ValueError("YouTubeRanking is only suitable for ranking")
        super().__init__(
            task, data_info, loss_type, embed_size, n_epochs, lr, lr_decay,
            epsilon, reg, batch_size, sampler, num_neg, seed,
            lower_upper_bound, multi_sparse_combiner,
            recent_num=recent_num, random_num=random_num,
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
        if self.feats.has_sparse:
            params["sparse_embed"] = truncated_normal(r[2], (self._sparse_rows(), D))
        if self.feats.has_dense:
            params["dense_embed"] = truncated_normal(
                r[3], (self.feats.n_dense_fields, D)
            )
        in_dim = self.n_fields * D + D  # fields + pooled seq
        params["mlp"] = init_mlp(r[4], in_dim, list(self.hidden_units),
                                 use_ln=self.use_bn)
        params["head"] = init_dense(r[5], self.hidden_units[-1], 1)
        return params

    shared_seq = True  # pooling is target-independent: pool once per row

    def _score_catalog(self, params, users, n_users_call, overrides=None,
                       items=None):
        """Full-catalog scoring: pooling is target-independent, so the
        (L,)-history gather + mean-pool run once per user and the pooled
        vector repeats across the catalog (the generic pair loop re-pools
        per item). ``overrides``: per-user (U, L) "seq" / (U, F) feature
        rows for dynamic requests. ``items``: optional (T,) item subset
        (tiled native serving)."""
        n_items = self.n_items if items is None else items.shape[0]
        seq = self._catalog_seq(users, overrides)
        seq_emb, mask = self._seq_item_embeds(params, seq)
        maskf = mask.astype(seq_emb.dtype)[:, :, None]
        pooled = jnp.sum(seq_emb * maskf, axis=1) / jnp.maximum(
            jnp.sum(maskf, axis=1), 1.0
        )                                                    # (U, D)
        pooled = jnp.repeat(pooled, n_items, axis=0)
        embeds, _, _ = self._field_embeds(
            params,
            self._catalog_pair_inputs(users, n_users_call, overrides, items),
        )
        x = jnp.concatenate(
            [embeds.reshape(embeds.shape[0], -1), pooled], axis=1
        )
        h = mlp(params["mlp"], x, dropout_rate=0.0, train=False, rng=None)
        return dense(params["head"], h)[:, 0].reshape(n_users_call, n_items)

    def _forward(self, params, inputs, train, rng):
        users, items = inputs["user"], inputs["item"]
        embeds, _, _ = self._field_embeds(params, inputs)
        seq = self._seq_for(inputs)
        seq_emb, mask = self._seq_item_embeds(params, seq)
        maskf = mask.astype(seq_emb.dtype)[:, :, None]
        pooled = jnp.sum(seq_emb * maskf, axis=1) / jnp.maximum(
            jnp.sum(maskf, axis=1), 1.0
        )
        B = seq.shape[0]
        if users.shape[0] != B:
            # [B positives; B*S interleaved negatives] share each row's
            # pooled history — tile instead of re-gathering/re-pooling
            S = users.shape[0] // B - 1
            pooled = jnp.concatenate([pooled, jnp.repeat(pooled, S, axis=0)])
        x = jnp.concatenate([embeds.reshape(embeds.shape[0], -1), pooled], axis=1)
        h = mlp(params["mlp"], x, dropout_rate=self.dropout_rate, train=train, rng=rng)
        return dense(params["head"], h)[:, 0]

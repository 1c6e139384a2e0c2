"""YouTubeRetrieval: candidate-generation tower with sampled-softmax / NCE.

Reference parity: libreco/algorithms/youtube_retrieval.py:26 and the
YoutubeRetrievalTrainer (libreco/training/tf_trainer.py:133-235): user vector
= MLP over [mean-pooled watch history, user features]; training scores
against the item output matrix with `num_sampled_per_batch` uniform shared
candidates (tf.nn.sampled_softmax_loss / nce_loss semantics, fused in-step
via jax.random — no host round trip).
"""
import jax
import jax.numpy as jnp

from ..bases.dyn_embed_base import DynEmbedBase
from ..ops.features import FeatureTables
from ..ops.initializers import truncated_normal
from ..ops.losses import nce_loss, sampled_softmax_loss
from ..ops.nn import init_mlp, l2_normalize, mlp
from ..parallel.mesh import aligned_rows


class YouTubeRetrieval(DynEmbedBase):
    paradigm = "listwise"

    def __init__(
        self,
        task,
        data_info,
        loss_type="sampled_softmax",
        embed_size=16,
        norm_embed=False,
        n_epochs=20,
        lr=0.001,
        lr_decay=False,
        epsilon=1e-5,
        reg=None,
        batch_size=256,
        num_sampled_per_batch=None,
        use_bn=True,
        dropout_rate=None,
        hidden_units=(128, 64, 32),
        recent_num=10,
        random_num=None,
        multi_sparse_combiner="sqrtn",
        sampler="uniform",
        seed=42,
        lower_upper_bound=None,  # accepted for API familiarity (ranking-only)
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        if task != "ranking":
            raise ValueError("YouTubeRetrieval is only suitable for ranking")
        assert loss_type in ("nce", "sampled_softmax")
        super().__init__(
            task, data_info, loss_type, embed_size, norm_embed,
            recent_num, random_num, None, seed,
        )
        self.n_epochs = n_epochs
        self.lr = lr
        self.lr_decay = lr_decay
        self.epsilon = epsilon
        self.reg = reg
        self.batch_size = batch_size
        self.num_sampled_per_batch = num_sampled_per_batch
        self.use_bn = use_bn
        self.dropout_rate = dropout_rate or 0.0
        self.hidden_units = tuple(hidden_units)
        self.multi_sparse_combiner = multi_sparse_combiner
        self.sampler = "random"  # listwise samples in-step; generator unused
        self.num_neg = 1
        self.feats = None

    def build_model(self):
        self.feats = FeatureTables(self.data_info)
        super().build_model()

    def _init_params(self, rng):
        D = self.embed_size
        i_rows = aligned_rows(self.n_items)
        r = jax.random.split(rng, 5)
        params = {
            "item_embed_in": truncated_normal(r[0], (i_rows, D)),
            "item_embed": truncated_normal(r[1], (i_rows, D)),  # output matrix
            "item_bias": jnp.zeros((i_rows,)),
        }
        in_dim = D
        if self.feats.user_sparse is not None:
            sp_rows = aligned_rows(self.feats.sparse_vocab - 1)
            params["sparse_embed"] = truncated_normal(r[2], (sp_rows, D))
            in_dim += len(self.feats.user_sparse_pos) * D
        if self.feats.user_dense is not None:
            params["dense_embed"] = truncated_normal(
                r[3], (self.feats.n_dense_fields, D)
            )
            in_dim += len(self.feats.user_dense_pos) * D
        params["mlp"] = init_mlp(
            r[4], in_dim, list(self.hidden_units) + [D], use_ln=self.use_bn
        )
        return params

    def _user_repr(self, params, users, seq, train, rng):
        embeds = params["item_embed_in"][seq]
        maskf = (seq != self.pad_id).astype(embeds.dtype)[:, :, None]
        pooled = jnp.sum(embeds * maskf, axis=1) / jnp.maximum(
            jnp.sum(maskf, axis=1), 1.0
        )
        pieces = [pooled]
        if self.feats.user_sparse is not None:
            idx = self.feats.user_sparse[users]
            pieces.append(params["sparse_embed"][idx].reshape(idx.shape[0], -1))
        if self.feats.user_dense is not None:
            vals = self.feats.user_dense[users]
            emb = params["dense_embed"][jnp.asarray(self.feats.user_dense_pos)]
            pieces.append((vals[:, :, None] * emb[None]).reshape(vals.shape[0], -1))
        out = mlp(params["mlp"], jnp.concatenate(pieces, axis=1),
                  dropout_rate=self.dropout_rate, train=train, rng=rng,
                  final_activation=False)
        return l2_normalize(out) if self.norm_embed else out

    def loss_fn(self, params, batch, rng):
        users, items, weight = batch["user"], batch["item"], batch["weight"]
        r1, r2 = jax.random.split(rng)
        user_repr = self._user_repr(params, users, batch["seq"], True, r1)
        num_sampled = self.num_sampled_per_batch or users.shape[0]
        neg = jax.random.randint(
            r2, (num_sampled,), 0, self.n_items, dtype=jnp.int32
        )
        loss_impl = (
            sampled_softmax_loss if self.loss_type == "sampled_softmax" else nce_loss
        )
        return loss_impl(
            user_repr,
            params["item_embed"],
            params["item_bias"],
            items,
            neg,
            weight=weight,
        )

    def post_load(self):
        self.feats = FeatureTables(self.data_info)
        super().post_load()

"""Word2Vec-style base: skip-gram with negative sampling (SGNS) on TPU.

Replaces the reference's gensim backend (libreco/bases/gensim_base.py:15-96,
used by Item2Vec and DeepWalk) with a jitted SGNS train step: (center,
context) pairs are generated host-side from the corpus once per fit;
negatives are drawn in-step from a frequency^0.75 table resident on device
(alias-free: inverse-CDF over the cumulative distribution). User embeddings
are the average of consumed item vectors, as in the reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .embed_base import EmbedBase
from ..ops.initializers import truncated_normal
from ..parallel.mesh import aligned_rows
from ..utils.misc import time_block
from ..utils.validate import check_fitting


class W2VBase(EmbedBase):
    def __init__(
        self,
        task,
        data_info,
        embed_size=16,
        norm_embed=False,
        window_size=5,
        n_epochs=5,
        learning_rate=0.005,
        batch_size=10000,
        num_neg=5,
        seed=42,
    ):
        if task != "ranking":
            raise ValueError(f"{self.__class__.__name__} is only suitable for ranking")
        super().__init__(task, data_info, embed_size, None, seed)
        self.norm_embed = norm_embed
        self.window_size = window_size
        self.n_epochs = n_epochs
        self.lr = learning_rate
        self.batch_size = batch_size
        self.num_neg = num_neg

    # ------------------------------------------------------------- corpus
    def _corpus(self):
        """List of item-id sequences (consumption lists or walks)."""
        raise NotImplementedError

    def _skipgram_pairs(self, corpus, rng, max_pairs=20_000_000):
        from ..sampling.skipgram import skipgram_pairs

        return skipgram_pairs(corpus, self.window_size, rng, max_pairs)

    def build_model(self):
        rng = jax.random.PRNGKey(self.seed)
        r1, r2 = jax.random.split(rng)
        rows = aligned_rows(self.n_items)
        self.params = {
            "item_embed": truncated_normal(r1, (rows, self.embed_size)),
            "context_embed": truncated_normal(r2, (rows, self.embed_size)),
        }
        # negative-sampling distribution: freq^0.75 inverse-CDF table
        counts = np.ones(self.n_items, np.float64)
        for i, users in self.data_info.item_consumed.items():
            counts[int(i)] += len(users)
        probs = counts ** 0.75
        self._neg_cdf = jnp.asarray(
            np.cumsum(probs / probs.sum()), jnp.float32
        )

    def loss_fn(self, params, batch, rng):
        centers, contexts = batch["center"], batch["context"]
        B = centers.shape[0]
        u = jax.random.uniform(rng, (B, self.num_neg))
        neg = jnp.searchsorted(self._neg_cdf, u).astype(jnp.int32)
        c_emb = params["item_embed"][centers]                  # (B, D)
        pos_emb = params["context_embed"][contexts]
        neg_emb = params["context_embed"][neg]                 # (B, S, D)
        pos_logit = jnp.sum(c_emb * pos_emb, axis=1)
        neg_logit = jnp.einsum("bd,bsd->bs", c_emb, neg_emb)
        loss = -jnp.mean(
            jax.nn.log_sigmoid(pos_logit)
            + jnp.sum(jax.nn.log_sigmoid(-neg_logit), axis=1)
        )
        return loss

    def fit(
        self,
        train_data,
        neg_sampling,
        verbose=1,
        shuffle=True,
        eval_data=None,
        metrics=None,
        k=10,
        eval_batch_size=8192,
        eval_user_num=None,
        **kwargs,
    ):
        check_fitting(self, train_data, eval_data, neg_sampling, k)
        if self.params is None:
            self.build_model()
        np_rng = np.random.default_rng(self.seed)
        corpus = self._corpus()
        centers, contexts = self._skipgram_pairs(corpus, np_rng)
        optimizer = optax.adam(self.lr, eps=1e-8)
        opt_state = optimizer.init(self.params)

        @jax.jit
        def step(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(self.loss_fn)(params, batch, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        params = self.params
        base_rng = jax.random.PRNGKey(self.seed)
        bs = self.batch_size
        step_idx = 0
        for epoch in range(1, self.n_epochs + 1):
            perm = np_rng.permutation(len(centers))
            with time_block(f"Epoch {epoch}", verbose):
                losses = []
                for start in range(0, len(perm), bs):
                    take = perm[start : start + bs]
                    if len(take) < bs:  # keep static shapes
                        take = np.pad(take, (0, bs - len(take)), mode="wrap")
                    batch = {"center": centers[take], "context": contexts[take]}
                    params, opt_state, loss = step(
                        params, opt_state, batch,
                        jax.random.fold_in(base_rng, step_idx),
                    )
                    losses.append(loss)
                    step_idx += 1
                if verbose > 0 and losses:
                    print(f"\t train_loss: {float(np.mean(jax.device_get(jnp.stack(losses)))):.4f}")
        self.params = params
        self.post_fit()

    def set_embeddings(self):
        p = jax.device_get(self.params)
        item = np.asarray(p["item_embed"])[: self.n_items]
        if self.norm_embed:
            item = item / np.maximum(
                np.linalg.norm(item, axis=1, keepdims=True), 1e-8
            )
        # user embedding = mean of consumed item vectors (gensim_base.py:96)
        user = np.zeros((self.n_users, item.shape[1]), np.float32)
        for u in range(self.n_users):
            consumed = self.data_info.user_consumed.get(u, [])
            if consumed:
                user[u] = item[np.asarray(consumed, np.int64)].mean(axis=0)
        self.user_embeds_np = self._append_oov(user)
        self.item_embeds_np = self._append_oov(item)

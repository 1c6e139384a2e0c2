"""Base for models whose user embedding is computed dynamically from the
behavior sequence (RNN4Rec / Caser / WaveNet; TwoTower and YouTubeRetrieval
extend this further).

Reference parity: libreco/bases/dyn_embed_base.py:17 — post-fit the recent-
history user embeddings are cached like EmbedBase, but ``predict`` /
``recommend_user`` accept an explicit ``seq`` (raw item ids) to embed an
arbitrary state at request time (dyn_embed_base.py:74, ~:200).
"""
import jax
import jax.numpy as jnp
import numpy as np

from .embed_base import EmbedBase
from ..batch.sequence import build_train_seqs, get_recent_seqs
from ..ops.losses import bce_loss, bpr_loss, focal_loss, max_margin_loss
from ..ops.topk import topk_from_embeddings
from ..utils.validate import check_seq_mode

_EMBED_CHUNK = 1024


class DynEmbedBase(EmbedBase):
    def __init__(
        self,
        task,
        data_info,
        loss_type,
        embed_size,
        norm_embed=False,
        recent_num=10,
        random_num=None,
        lower_upper_bound=None,
        seed=42,
    ):
        super().__init__(task, data_info, embed_size, lower_upper_bound, seed)
        if loss_type not in ("cross_entropy", "focal", "bpr", "max_margin",
                             "nce", "sampled_softmax"):
            raise ValueError(f"unknown loss_type: {loss_type}")
        self.loss_type = loss_type
        self.norm_embed = norm_embed
        self.seq_mode, self.max_seq_len = check_seq_mode(recent_num, random_num)
        self.recent_seq_table = None
        self._user_repr_fn = None
        if loss_type in ("bpr", "max_margin"):
            self.paradigm = "pairwise"

    @property
    def pad_id(self):
        return self.n_items

    # ------------------------------------------------------------- contract
    def _user_repr(self, params, users, seq, train, rng):
        """(B,) users + (B, L) seqs -> (B, D) user representations."""
        raise NotImplementedError

    def _item_repr(self, params):
        """Full item output matrix (rows >= n_items, D) used for scoring."""
        return params["item_embed"]

    def _item_bias(self, params):
        return params.get("item_bias")

    # ------------------------------------------------------------- training
    def build_model(self):
        seqs, _ = get_recent_seqs(
            self.n_users, self.user_consumed, self.n_items, self.max_seq_len
        )
        self.recent_seq_table = jnp.asarray(seqs)
        rng = jax.random.PRNGKey(self.seed)
        self.params = self._init_params(rng)

    def _init_params(self, rng):
        raise NotImplementedError

    def batch_extras(self, train_data):
        seqs, _ = build_train_seqs(
            np.asarray(train_data.user_indices),
            np.asarray(train_data.item_indices),
            self.n_items,
            self.max_seq_len,
            mode=self.seq_mode,
            seed=self.seed,
        )
        return {"seq": seqs}

    def _scores_from_repr(self, params, user_repr, items):
        item_repr = self._item_repr(params)[items]
        scores = jnp.sum(user_repr * item_repr, axis=-1)
        bias = self._item_bias(params)
        if bias is not None:
            scores += bias[items]
        return scores

    def loss_fn(self, params, batch, rng):
        users, items, labels, weight = (
            batch["user"], batch["item"], batch["label"], batch["weight"],
        )
        rng, r1 = jax.random.split(rng)
        user_repr = self._user_repr(params, users, batch["seq"], True, r1)
        if self.paradigm == "pairwise":
            neg = batch["item_neg"]                              # (B, S)
            S = neg.shape[1]
            pos_scores = self._scores_from_repr(params, user_repr, items)
            item_repr = self._item_repr(params)[neg]             # (B, S, D)
            neg_scores = jnp.einsum("bd,bsd->bs", user_repr, item_repr)
            bias = self._item_bias(params)
            if bias is not None:
                neg_scores += bias[neg]
            pair_loss = bpr_loss if self.loss_type == "bpr" else max_margin_loss
            return pair_loss(
                jnp.repeat(pos_scores[:, None], S, axis=1).reshape(-1),
                neg_scores.reshape(-1),
                jnp.repeat(weight[:, None], S, axis=1).reshape(-1),
            )
        # pointwise
        if "item_neg" in batch:
            neg = batch["item_neg"]
            S = neg.shape[1]
            repr_all = jnp.concatenate(
                [user_repr, jnp.repeat(user_repr, S, axis=0)]
            )
            items_all = jnp.concatenate([items, neg.reshape(-1)])
            labels_all = jnp.concatenate(
                [jnp.ones_like(labels), jnp.zeros(neg.size, labels.dtype)]
            )
            weight_all = jnp.concatenate([weight, jnp.repeat(weight, S)])
        else:
            repr_all, items_all, labels_all, weight_all = (
                user_repr, items, labels, weight,
            )
        logits = self._scores_from_repr(params, repr_all, items_all)
        if self.task == "rating":
            from ..ops.losses import mse_loss

            return mse_loss(logits, labels_all, weight_all)
        point_loss = bce_loss if self.loss_type == "cross_entropy" else focal_loss
        return point_loss(logits, labels_all, weight_all)

    # ----------------------------------------------------------- embeddings
    def _ensure_repr_fn(self):
        if self._user_repr_fn is None:
            def repr_fn(params, users, seqs):
                return self._user_repr(params, users, seqs, False, None)

            self._user_repr_fn = jax.jit(repr_fn)

    def _sync_feature_tables(self):
        """Refresh HBM feature tables + cached embeddings after
        DataInfo.assign_user/item_features (see FeatBase counterpart)."""
        feats = getattr(self, "feats", None)
        v = getattr(self.data_info, "feature_version", 0)
        if feats is not None and getattr(feats, "version", 0) != v:
            from ..ops.features import FeatureTables

            self.feats = FeatureTables(self.data_info)
            self._user_repr_fn = None
            self.set_embeddings()

    def dyn_user_embedding(self, user, seq=None, inner_id=False):
        """Embed one user's (possibly request-provided) sequence."""
        self._sync_feature_tables()
        self._ensure_repr_fn()
        uid = self._to_inner_user(user, inner_id)
        if seq is not None:
            seq_arr = self._convert_seq(seq, inner_id)
        else:
            seq_arr = np.asarray(self.recent_seq_table[uid])
        users = np.full((1,), uid, np.int32)
        repr_ = np.asarray(
            self._user_repr_fn(self.params, users, seq_arr[None, :].astype(np.int32))
        )[0]
        return repr_

    def _to_inner_user(self, user, inner_id):
        if inner_id:
            return int(user) if 0 <= int(user) < self.n_users else self.n_users
        return self.data_info.user2id.get(user, self.n_users)

    def _convert_seq(self, seq, inner_id):
        """Raw item list -> right-aligned padded inner-id array (L,)."""
        L = self.max_seq_len
        if inner_id:
            ids = [int(i) for i in seq if 0 <= int(i) < self.n_items]
        else:
            ids = [
                self.data_info.item2id[i] for i in seq if i in self.data_info.item2id
            ]
        ids = ids[-L:]
        out = np.full(L, self.pad_id, np.int64)
        if ids:
            out[L - len(ids):] = ids
        return out

    def set_embeddings(self):
        """Cache user embeddings from each user's recent history + item
        matrix with bias folded, like the reference's post-fit export."""
        self._ensure_repr_fn()
        reprs = []
        all_users = np.arange(self.n_users + 1, dtype=np.int32)
        seq_table = np.asarray(self.recent_seq_table)
        for start in range(0, len(all_users), _EMBED_CHUNK):
            users = all_users[start : start + _EMBED_CHUNK]
            pad = _EMBED_CHUNK - len(users)
            users_p = np.pad(users, (0, pad))
            seqs = seq_table[users_p]
            out = np.asarray(self._user_repr_fn(self.params, users_p, seqs))
            reprs.append(out[: len(users)])
        user_repr = np.concatenate(reprs)                       # (n_users+1, D)
        params = jax.device_get(self.params)
        item_repr = np.asarray(self._item_repr(params))[: self.n_items]
        bias = self._item_bias(params)
        if bias is not None:
            user_repr = np.hstack([user_repr, np.ones((len(user_repr), 1), np.float32)])
            item_repr = np.hstack([item_repr, np.asarray(bias)[: self.n_items, None]])
        # the OOV/cold row comes from the model itself (empty-seq forward),
        # not a mean of trained rows
        self.user_embeds_np = user_repr.astype(np.float32)
        self.item_embeds_np = self._append_oov(item_repr)

    # ------------------------------------------------------------- inference
    def recommend_user(
        self,
        user,
        n_rec,
        inner_id=False,
        cold_start="average",
        filter_consumed=True,
        random_rec=False,
        seq=None,
        user_feats=None,
    ):
        self._sync_feature_tables()
        if seq is not None:
            users = np.atleast_1d(np.asarray(user))
            assert len(users) == 1, "`seq` recommendation supports one user"
            embed = self.dyn_user_embedding(users[0], seq=seq, inner_id=inner_id)
            if self.item_embeds_np.shape[1] == embed.shape[0] + 1:
                embed = np.concatenate([embed, np.ones(1, np.float32)])
            uid = self._to_inner_user(users[0], inner_id)
            ids, _ = topk_from_embeddings(
                embed,
                self.item_embeds_np[:-1],
                n_rec,
                user_consumed=self.user_consumed if filter_consumed else None,
                user_ids=[uid],
                filter_consumed=filter_consumed,
            )
            key = users[0].item() if isinstance(users[0], np.generic) else users[0]
            return self.finalize_rec({key: ids[0]}, users, inner_id)
        return super().recommend_user(
            user, n_rec, inner_id, cold_start, filter_consumed, random_rec
        )

    def post_load(self):
        seqs, _ = get_recent_seqs(
            self.n_users, self.user_consumed, self.n_items, self.max_seq_len
        )
        self.recent_seq_table = jnp.asarray(seqs)
        if self.params is not None:
            self.set_embeddings()

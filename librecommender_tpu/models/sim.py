"""SIM: two-stage long-sequence interest modeling (GSU + ESU).

Reference parity: libreco/algorithms/sim.py:29,150-209 and the dual-sequence
extraction (libreco/batch/sequence.py:94): the General Search Unit soft-
searches the top-`search_topk` items from a `long_max_len` history by
embedding similarity with the target (lax.top_k — static shapes, TPU-exact),
then the Exact Search Unit runs multi-head attention over the selected items;
a DIN-style attention covers the short recent window.

Dual-stage output (libreco/algorithms/sim.py:193-209): the first stage is a
cheap MLP over the sum-pooled long history + target, the second stage is the
full GSU->ESU + short-DIN + feature-field MLP; training optimizes
``alpha * first + beta * second`` while inference (predict / recommend /
serving top-k) scores with the second stage alone -- mirroring the
reference's separate ``inference_output``.
"""
import jax
import jax.numpy as jnp

from ..bases.seq_base import SeqFeatBase
from ..batch.sequence import build_train_seqs, get_recent_seqs
from ..ops.initializers import truncated_normal
from ..ops.topk import topk_lastdim_small_onehot
from ..ops.nn import (
    dense,
    din_attention,
    init_dense,
    init_din_attention,
    init_mha,
    init_mlp,
    mha,
    mlp,
)
from ..parallel.mesh import aligned_rows

import numpy as np


class SIM(SeqFeatBase):
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
        alpha=1.0,
        beta=1.0,
        recent_num=10,
        random_num=None,
        long_max_len=100,
        short_max_len=None,  # reference name for the short window (sim.py:131); overrides recent_num
        long_history_grad=True,
        search_topk=10,
        num_heads=2,
        feat_agg_mode=None,
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
            recent_num=recent_num if short_max_len is None else short_max_len,
            random_num=random_num,
        )
        # reference SIM builds all seq tokens from feature-augmented items
        # (sim.py:198 combine_seq_features "concat"); default here keeps the
        # profiled-lean bare-token path, 'concat'/'elementwise' opt in
        if feat_agg_mode not in ("concat", "elementwise", None):
            raise ValueError("`feat_agg_mode` must be `concat`, `elementwise` or None")
        self.feat_agg_mode = feat_agg_mode
        assert search_topk <= long_max_len
        assert 0.0 <= alpha <= 1.0 and 0.0 <= beta <= 1.0
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.hidden_units = tuple(hidden_units)
        self.use_bn = use_bn
        self.dropout_rate = dropout_rate or 0.0
        self.long_max_len = long_max_len
        self.long_history_grad = bool(long_history_grad)
        self.search_topk = search_topk
        self.num_heads = num_heads
        self.recent_long_table = None

    def build_model(self):
        seqs, _ = get_recent_seqs(
            self.n_users, self.user_consumed, self.n_items, self.long_max_len
        )
        self.recent_long_table = jnp.asarray(seqs)
        super().build_model()

    def build_model_shell(self):
        super().build_model_shell()
        seqs, _ = get_recent_seqs(
            self.n_users, self.user_consumed, self.n_items, self.long_max_len
        )
        self.recent_long_table = jnp.asarray(seqs)

    def batch_extras(self, train_data):
        users = np.asarray(train_data.user_indices)
        items = np.asarray(train_data.item_indices)
        short, _ = build_train_seqs(
            users, items, self.n_items, self.max_seq_len,
            mode=self.seq_mode, seed=self.seed,
        )
        long, _ = build_train_seqs(
            users, items, self.n_items, self.long_max_len, seed=self.seed
        )
        return {"seq": short, "seq_long": long}

    def _init_params(self, rng):
        D = self.embed_size
        u_rows, i_rows = aligned_rows(self.n_users), aligned_rows(self.n_items)
        r = jax.random.split(rng, 10)
        params = {
            "user_embed": truncated_normal(r[0], (u_rows, D)),
            "item_embed": truncated_normal(r[1], (i_rows, D)),
        }
        if self.feats.has_sparse:
            params["sparse_embed"] = truncated_normal(r[4], (self._sparse_rows(), D))
        if self.feats.has_dense:
            params["dense_embed"] = truncated_normal(
                r[5], (self.feats.n_dense_fields, D)
            )
        TD = self.token_dim
        params["short_att"] = init_din_attention(r[2], TD)
        params["esu_mha"] = init_mha(r[3], TD, self.num_heads)
        self._init_token_norms(params)
        # first stage: target + sum-pooled long history (sim.py:229-247)
        params["first_mlp"] = init_mlp(r[6], 2 * TD, list(self.hidden_units),
                                       use_ln=self.use_bn)
        params["first_head"] = init_dense(r[7], self.hidden_units[-1], 1)
        # second stage: feature fields + ESU + short DIN (sim.py:249-262)
        in_dim = self.n_fields * D + 2 * TD
        params["mlp"] = init_mlp(r[8], in_dim, list(self.hidden_units),
                                 use_ln=self.use_bn)
        params["head"] = init_dense(r[9], self.hidden_units[-1], 1)
        return params

    def _long_seq_for(self, inputs):
        if "seq_long" in inputs:
            return inputs["seq_long"]
        return self.recent_long_table[inputs["user"]]

    def _request_seq_overrides(self, uids, seq_list, inner_id):
        """Dual-seq request override: the short window is the request seq's
        last ``max_seq_len`` items, the long window its last ``long_max_len``
        (matching our training layout, where the short window is a suffix of
        the long one — the reference instead splits them disjointly,
        recommendation/preprocess.py:49 build_dual_seq). Users without a
        request seq keep their stored histories."""
        import numpy as np

        short_rows, long_rows = [], []
        short_tab = long_tab = None
        for i, s in enumerate(seq_list):
            if s is None:
                if short_tab is None:
                    short_tab = np.asarray(self.recent_seq_table)
                    long_tab = np.asarray(self.recent_long_table)
                short_rows.append(short_tab[int(uids[i])])
                long_rows.append(long_tab[int(uids[i])])
            else:
                short_rows.append(self._convert_request_seq(s, inner_id))
                long_rows.append(
                    self._convert_request_seq(s, inner_id,
                                              max_len=self.long_max_len)
                )
        return {
            "seq": np.stack(short_rows).astype(np.int32),
            "seq_long": np.stack(long_rows).astype(np.int32),
        }

    shared_seq = True  # pos/neg targets share each row's (long) history

    def _second_stage(self, params, tgt, long_emb, long_mask, short_emb,
                      short_mask, want_pool=False):
        """GSU soft-search + ESU attention + short-window attention for
        (T, B) target blocks over shared per-row histories; also the whole
        inference output (sim.py:206-209).

        ``want_pool=True`` additionally returns the masked sum-pool of the
        long history for the first stage — folded into the SAME batched
        one-hot GEMM as the top-k selection (the mask is one more selector
        row), so ``long_emb`` has a single heavy consumer and XLA keeps
        ONE layout for it. Measured on a v5e at bench geometry: the
        separate-pool form spent 3.3 ms/step relaying the (B, L, D)
        history through layout copies (reshape/copy pairs at ~250 GB/s);
        this form removes them (13.3 -> ~10.9 ms/step)."""
        T, B, D = tgt.shape
        K = self.search_topk
        # GSU: soft search over the long history
        sims = jnp.einsum("tbd,bld->tbl", tgt, long_emb)
        sims = jnp.where(long_mask[None], sims, -jnp.inf)
        # GSU top-k over the short last axis via the rank-matrix form
        # (lax.top_k's sort lowering and argmax extraction both cost
        # ~6 ms/step here); the returned one-hot expresses the row
        # selection as an einsum, so the backward is an einsum too
        # instead of a (T*B*K)-row scatter-add into the long history
        top_sims, top_idx, sel_onehot = topk_lastdim_small_onehot(
            sims, self.search_topk
        )                                                       # (T, B, K, L)
        # (B, T*K(+1), L) batched-GEMM form: one b-batch dot_general over
        # every selector row instead of the tbkl,bld->tbkd convolution
        # lowering XLA picks for the 4D einsum
        ohm = (
            sel_onehot.astype(long_emb.dtype)
            .transpose(1, 0, 2, 3).reshape(B, T * K, -1)
        )
        if want_pool:
            ohm = jnp.concatenate(
                [ohm, long_mask.astype(long_emb.dtype)[:, None, :]], axis=1
            )
        out = jnp.einsum("bml,bld->bmd", ohm, long_emb)
        sel_emb = (
            out[:, : T * K].reshape(B, T, K, D).transpose(1, 0, 2, 3)
        )                                                       # (T, B, K, D)
        pooled = out[:, T * K] if want_pool else None           # (B, D)
        sel_mask = jnp.isfinite(top_sims)

        # ESU: exact multi-head attention over the selected items
        esu_out = mha(
            params["esu_mha"], tgt.reshape(T * B, 1, D),
            sel_emb.reshape(T * B, K, D),
            mask=sel_mask.reshape(T * B, K), num_heads=self.num_heads,
        )[:, 0, :].reshape(T, B, D)

        # short recent window: DIN-style target attention (multi-target form)
        short_out = din_attention(
            params["short_att"], tgt, short_emb, short_mask
        )
        return esu_out, short_out, pooled

    def _score_catalog(self, params, users, n_users_call, overrides=None,
                       items=None):
        """Full-catalog scoring with the (long_max_len,) history gathered
        ONCE per user: the catalog is the target-block axis of the
        GSU/ESU/short-attention stack, where the generic pair loop would
        re-gather the long history per item (the dominant inference cost
        at the per-index-row floor). ``overrides``: per-user (U, L) "seq" /
        (U, long_L) "seq_long" / (U, F) feature rows for dynamic requests.
        ``items``: optional (T,) item subset (tiled native serving)."""
        if items is None:
            items = jnp.arange(self.n_items, dtype=jnp.int32)
        n_items = items.shape[0]
        long_seq = self._catalog_seq(users, overrides, key="seq_long")
        long_emb = self._token_embeds(params, long_seq)
        long_mask = long_seq != self.pad_id
        short_seq = self._catalog_seq(users, overrides)
        short_emb = self._token_embeds(params, short_seq)
        short_mask = short_seq != self.pad_id
        target = self._token_embeds(params, items)          # (n_items, TD)
        tgt = jnp.broadcast_to(
            target[:, None, :], (n_items, n_users_call, target.shape[1])
        )
        esu_out, short_out, _ = self._second_stage(
            params, tgt, long_emb, long_mask, short_emb, short_mask
        )
        D = esu_out.shape[-1]
        esu_rows = esu_out.transpose(1, 0, 2).reshape(-1, D)
        short_rows = short_out.transpose(1, 0, 2).reshape(-1, D)
        embeds, _, _ = self._field_embeds(
            params,
            self._catalog_pair_inputs(users, n_users_call, overrides, items),
        )
        x = jnp.concatenate(
            [embeds.reshape(embeds.shape[0], -1), esu_rows, short_rows],
            axis=1,
        )
        h = mlp(params["mlp"], x, dropout_rate=0.0, train=False, rng=None)
        return dense(params["head"], h)[:, 0].reshape(n_users_call, n_items)

    def _forward(self, params, inputs, train, rng):
        users, items = inputs["user"], inputs["item"]
        embeds, _, _ = self._field_embeds(params, inputs)
        target = self._token_embeds(params, items)              # (TB, TD)

        long_seq = self._long_seq_for(inputs)
        long_emb = self._token_embeds(params, long_seq)
        if train and not self.long_history_grad:
            # SIM-paper two-stage practice: the GSU/long branch trains on a
            # frozen view of the token table (the paper trains GSU
            # separately; arXiv:2006.05639 §3.2). This removes the
            # B*long_max_len-row backward scatter-add — the measured
            # per-step dominant op at reference-faithful gradients
            # (docs/tpu_performance.md "SIM long-history floor"). The
            # token table still trains through targets + the short window.
            long_emb = jax.lax.stop_gradient(long_emb)
        long_mask = long_seq != self.pad_id
        short_seq = self._seq_for(inputs)
        short_emb = self._token_embeds(params, short_seq)
        short_mask = short_seq != self.pad_id

        # shared-seq: the LONG history gather and its backward scatter-add
        # (B*long_max_len index rows — the dominant seq cost) run once per
        # row; every target block attends over the shared embeddings
        B = long_seq.shape[0]
        shared = target.shape[0] != B
        tgt = self._target_blocks(target, B) if shared else target[None]
        T, _, D = tgt.shape

        esu_out, short_out, pooled = self._second_stage(
            params, tgt, long_emb, long_mask, short_emb, short_mask,
            want_pool=train,
        )

        if shared:
            esu_rows = self._blocks_to_rows(esu_out)
            short_rows = self._blocks_to_rows(short_out)
        else:
            esu_rows, short_rows = esu_out[0], short_out[0]

        x = jnp.concatenate(
            [embeds.reshape(embeds.shape[0], -1), esu_rows, short_rows], axis=1
        )
        h = mlp(params["mlp"], x, dropout_rate=self.dropout_rate, train=train, rng=rng)
        second = dense(params["head"], h)[:, 0]
        if not train:
            return second

        # ---- first stage: sum-pooled long history + target (sim.py:229-247);
        # training output = alpha*first + beta*second (sim.py:206);
        # the pool itself comes out of _second_stage's selector GEMM
        if shared:
            pooled = self._blocks_to_rows(
                jnp.broadcast_to(pooled[None], (T, B, D))
            )
        x1 = jnp.concatenate([target, pooled], axis=1)
        h1 = mlp(params["first_mlp"], x1, dropout_rate=self.dropout_rate,
                 train=train, rng=rng)
        first = dense(params["first_head"], h1)[:, 0]
        return self.alpha * first + self.beta * second

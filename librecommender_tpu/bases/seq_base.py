"""Base for sequence-aware CTR models (DIN / YouTubeRanking / Transformer /
SIM).

Extends FeatBase with behavior sequences: training rows carry the history
*before* the target position (built once, host-side, vectorized —
``batch/sequence.py``); inference gathers each user's cached recent history
from a device-resident table inside the jitted forward, so predict/recommend
programs need no host-side sequence assembly.

Reference parity: libreco/bases/tf_base.py + batch/sequence.py:33,75 and the
``recent_num``/``random_num`` seq-mode contract (utils/validate.py:48).
"""
import jax.numpy as jnp
import numpy as np

from .feat_base import FeatBase
from ..batch.sequence import build_train_seqs, get_recent_seqs
from ..utils.validate import check_seq_mode


class SeqFeatBase(FeatBase):
    def __init__(self, *args, recent_num=10, random_num=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.seq_mode, self.max_seq_len = check_seq_mode(recent_num, random_num)
        self.recent_seq_table = None  # (n_users + 1, L) device array

    @property
    def pad_id(self):
        return self.n_items

    def build_model(self):
        seqs, _ = get_recent_seqs(
            self.n_users, self.user_consumed, self.n_items, self.max_seq_len
        )
        self.recent_seq_table = jnp.asarray(seqs)
        super().build_model()

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

    def touched_indices(self, batch):
        out = super().touched_indices(batch)
        for key in batch:
            # history positions also touch the item table (pad positions
            # index the item-OOV row, which exists in the aligned table)
            if key.startswith("seq"):
                out["item_embed"] = jnp.concatenate(
                    [out["item_embed"], batch[key].reshape(-1)]
                )
                if self.feat_agg_mode is not None and self.feats.has_sparse \
                        and self.feats.item_sparse is not None:
                    # feature-augmented tokens also gradient the seq items'
                    # sparse feature rows
                    out["sparse_embed"] = jnp.concatenate([
                        out["sparse_embed"],
                        self.feats.item_sparse[batch[key]].reshape(-1),
                    ])
        return out

    # ------------------------------------------------- seq token construction
    # feature-aggregated sequence tokens (reference tfops/features.py
    # `combine_seq_features`): 'concat' flattens each item's sparse/dense
    # field embeddings into its token, 'elementwise' adds layer-normed field
    # sums, None keeps bare item embeddings (the lean extension).
    feat_agg_mode = None

    def _token_field_counts(self):
        if self.feat_agg_mode is None or self.feats is None:
            return 0, 0
        f_s = len(self.feats.item_sparse_pos) if self.feats.has_sparse else 0
        f_d = len(self.feats.item_dense_pos) if self.feats.has_dense else 0
        return f_s, f_d

    @property
    def token_dim(self):
        f_s, f_d = self._token_field_counts()
        if self.feat_agg_mode == "concat":
            return self.embed_size * (1 + f_s + f_d)
        return self.embed_size

    def _init_token_norms(self, params):
        """Add the elementwise-mode LN params (no-op otherwise)."""
        from ..ops.nn import init_layer_norm

        f_s, f_d = self._token_field_counts()
        if self.feat_agg_mode == "elementwise":
            if f_s:
                params["tok_ln_sparse"] = init_layer_norm(self.embed_size)
            if f_d:
                params["tok_ln_dense"] = init_layer_norm(self.embed_size)
        return params

    # catalogs up to this size get the packed token table (below); beyond
    # it the per-id assembly is cheaper than materializing all tokens
    token_pack_max_items = 65536

    def _token_pack_ok(self):
        f_s, f_d = self._token_field_counts()
        return (f_s or f_d) and (self.n_items + 1) <= self.token_pack_max_items

    def _token_embeds(self, params, ids):
        """Item ids (any shape) -> feature-aggregated tokens (..., token_dim).
        Pad/OOV ids index the OOV row of each table.

        For catalogs under ``token_pack_max_items`` the token vectors are
        assembled for ALL items once per step and looked up with ONE
        gather. A token is a pure function of the item id, so assembling
        it per sequence position pays the per-index-row gather/scatter
        cost (and the concat's layout copies) once per position per field
        — B*L rows each — where the packed form pays it once per CATALOG
        row. Measured on a v5e (Transformer bench geometry, xplane): the
        per-position form spent 0.67 ms/step re-gathering sparse rows and
        0.5 ms/step in concat layout copies; packing removed both. XLA
        CSE merges the table builds across the step's _token_embeds calls."""
        f_s, f_d = self._token_field_counts()
        if (f_s or f_d) and self._token_pack_ok():
            n = self.n_items + 1
            all_ids = jnp.arange(n, dtype=jnp.int32)
            table = self._token_embeds_raw(params, all_ids)
            # sublane-align the table rows: gathers from a non-8-multiple
            # row count lower to a slow path (measured 50 vs ~2 ns/row)
            pad = (-n) % 8
            if pad:
                table = jnp.pad(table, ((0, pad), (0, 0)))
            return self._grad_aware_gather(table, ids)
        return self._token_embeds_raw(params, ids)

    def _grad_aware_gather(self, table, ids):
        """Gather with a swappable backward scatter. Default is XLA's
        autodiff scatter: the round-5 A/B (docs/tpu_performance.md "SIM
        long-history floor — Mosaic A/B") measured the Pallas
        VMEM-accumulator kernel at 15.9 ns/row vs XLA's 4.6 — per-row
        dynamic VMEM accumulation serializes at ~14 cycles/row in Mosaic,
        so XLA's dynamic-update-slice loop remains the fastest available
        form on this hardware. ``pallas_grad_scatter=True`` opts a model
        into the kernel (kept for future hardware/Mosaic revisions)."""
        mode = getattr(self, "pallas_grad_scatter", False)
        if mode is True and not getattr(self, "_under_mesh", False):
            from ..ops.pallas_scatter import gather_rows

            return gather_rows(table, ids)
        return table[ids]

    def _token_embeds_raw(self, params, ids):
        from ..ops.nn import layer_norm

        base = self._grad_aware_gather(params["item_embed"], ids)
        f_s, f_d = self._token_field_counts()
        if not (f_s or f_d):
            return base
        parts = [base]
        if f_s:
            rows = self.feats.item_sparse[ids]            # (..., F_s)
            se = self._train_lookup(params["sparse_embed"], rows)  # (..., F_s, D)
            if self.feat_agg_mode == "concat":
                parts.append(se.reshape(*se.shape[:-2], -1))
            else:
                parts.append(
                    jnp.sum(layer_norm(params["tok_ln_sparse"], se), axis=-2)
                )
        if f_d:
            vals = self.feats.item_dense[ids]             # (..., F_d)
            dvecs = params["dense_embed"][
                jnp.asarray(self.feats.item_dense_pos)
            ]                                             # (F_d, D)
            de = vals[..., None] * dvecs                  # (..., F_d, D)
            if self.feat_agg_mode == "concat":
                parts.append(de.reshape(*de.shape[:-2], -1))
            else:
                parts.append(
                    jnp.sum(layer_norm(params["tok_ln_dense"], de), axis=-2)
                )
        if self.feat_agg_mode == "concat":
            return jnp.concatenate(parts, axis=-1)
        return sum(parts)

    @staticmethod
    def _target_blocks(target, n_seq_rows):
        """Map (T*B, D) training rows — laid out [B positives; B*S
        negatives interleaved per row by loss_fn's jnp.repeat] — to
        (T, B, D) blocks aligned with the (B, ...) shared-seq tensors."""
        B = n_seq_rows
        S = target.shape[0] // B - 1
        q_pos = target[:B][None]
        q_neg = target[B:].reshape(B, S, -1).transpose(1, 0, 2)
        return jnp.concatenate([q_pos, q_neg], axis=0)          # (S+1, B, D)

    @staticmethod
    def _blocks_to_rows(out):
        """Inverse of _target_blocks on the output side: (T, B, D) ->
        (T*B, D) restoring the [positives; interleaved negatives] order."""
        B = out.shape[1]
        S = out.shape[0] - 1
        return jnp.concatenate(
            [out[0], out[1:].transpose(1, 0, 2).reshape(B * S, -1)]
        )

    def _seq_for(self, inputs):
        """Sequence from the batch if present, else the user's cached recent
        history gathered on device."""
        if "seq" in inputs:
            return inputs["seq"]
        return self.recent_seq_table[inputs["user"]]

    def _seq_item_embeds(self, params, seq):
        """(B, L) -> (B, L, D) item embeddings + (B, L) valid mask.

        Pad positions index the item-OOV row; masking excludes them from
        pooling/attention.
        """
        embeds = params["item_embed"][seq]
        mask = seq != self.pad_id
        return embeds, mask

    def build_model_shell(self):
        super().build_model_shell()
        seqs, _ = get_recent_seqs(
            self.n_users, self.user_consumed, self.n_items, self.max_seq_len
        )
        self.recent_seq_table = jnp.asarray(seqs)

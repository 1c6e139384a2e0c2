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
        return out

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

"""Item2Vec: SGNS over user consumption lists.

Reference parity: libreco/algorithms/item2vec.py:8 (gensim Word2Vec replaced
by the native JAX SGNS core in bases/w2v_base.py).
"""
from ..bases.w2v_base import W2VBase


class Item2Vec(W2VBase):
    def __init__(
        self,
        task,
        data_info,
        embed_size=16,
        norm_embed=False,
        window_size=None,
        n_epochs=5,
        learning_rate=0.005,
        batch_size=10000,
        num_neg=5,
        n_threads=0,  # accepted for API familiarity (gensim workers); ignored
        seed=42,
        lower_upper_bound=None,  # accepted for API familiarity (ranking-only)
    ):
        self.all_args = {
            k: v for k, v in locals().items()
            if k not in ("self", "__class__", "data_info")
        }
        # reference: default window = whole consumption list (item2vec.py:45)
        super().__init__(
            task, data_info, embed_size, norm_embed,
            window_size if window_size is not None else 9999,
            n_epochs, learning_rate, batch_size, num_neg, seed,
        )

    def _corpus(self):
        return [
            list(items) for items in self.data_info.user_consumed.values() if items
        ]

"""Shared skip-gram (center, context) pair generation.

Used by the SGNS trainers in bases/w2v_base.py (Item2Vec / DeepWalk over
item sequences, replacing the reference's gensim backend,
libreco/bases/gensim_base.py:15) and offline/pipeline.py (word vectors
over title tokens, replacing the Spark pipeline's Word2Vec stage,
distributed/spark/.../feature/FeatureEngineering.scala:49).
"""
import numpy as np


def skipgram_pairs(corpus, window, rng, max_pairs=None):
    """Sequences -> (centers, contexts) int32 arrays with word2vec's
    per-position dynamic window reduction."""
    centers, contexts = [], []
    for sent in corpus:
        sent = np.asarray(sent, dtype=np.int32)
        n = len(sent)
        if n < 2:
            continue
        # dynamic window like word2vec: per-position reduced window
        reduced = rng.integers(1, window + 1, n)
        for pos in range(n):
            lo = max(0, pos - reduced[pos])
            hi = min(n, pos + reduced[pos] + 1)
            for ctx in range(lo, hi):
                if ctx != pos:
                    centers.append(sent[pos])
                    contexts.append(sent[ctx])
    centers = np.asarray(centers, np.int32)
    contexts = np.asarray(contexts, np.int32)
    if max_pairs is not None and len(centers) > max_pairs:
        # whole-list windows (Item2Vec) are O(len^2) per user; cap the
        # epoch size for power users
        take = rng.choice(len(centers), max_pairs, replace=False)
        centers, contexts = centers[take], contexts[take]
    return centers, contexts

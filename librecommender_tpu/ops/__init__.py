"""Pure-JAX compute ops: initializers, losses, layers, feature embedding,
on-device sampling and top-k retrieval.

This is the single compute layer replacing the reference's three backends
(TF1 graphs in libreco/tfops + libreco/layers, torch in libreco/torchops,
Cython kernels). Everything is a pure function over pytrees, jit/pjit
friendly, with static shapes.
"""

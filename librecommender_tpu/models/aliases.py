"""Reference-name aliases.

The reference ships DGL variants (GraphSageDGL / PinSageDGL) and Rust-
backed CF (RsUserCF / RsItemCF) as separate classes; here each pair
collapses into one TPU/native implementation, and these aliases keep the
reference's import surface working:

- GraphSageDGL/PinSageDGL -> the native graph implementations
  (libreco/algorithms/graphsage_dgl.py:16, pinsage_dgl.py:11)
- RsUserCF/RsItemCF -> UserCF/ItemCF, whose similarity kernels ARE the
  native (C++/OpenMP) path (libreco/algorithms/user_cf_rs.py:5,
  item_cf_rs.py:5 — recfarm replacement)
"""
from .graphsage import GraphSage
from .item_cf import ItemCF
from .pinsage import PinSage
from .user_cf import UserCF


class GraphSageDGL(GraphSage):
    pass


class PinSageDGL(PinSage):
    pass


class RsUserCF(UserCF):
    pass


class RsItemCF(ItemCF):
    pass

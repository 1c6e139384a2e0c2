from .column_mapping import col_name2index
from .sparse import (
    column_sparse_indices,
    get_id_indices,
    get_last_offset,
    get_oov_pos,
    merge_offset,
    merge_sparse_col,
    merge_sparse_indices,
)
from .unique import construct_unique_feat

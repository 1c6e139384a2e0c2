from .export_model import (
    load_exported,
    load_exported_dyn,
    save_exported,
    save_exported_dyn,
)
from .serialization import save_embed, save_ivf_index, save_knn, save_online
from .store import DictStore, RedisStore, embed2store, knn2store, online2store

__all__ = [
    "save_knn", "save_embed", "save_online", "save_ivf_index",
    "save_exported", "load_exported",
    "save_exported_dyn", "load_exported_dyn",
    "DictStore", "RedisStore", "knn2store", "embed2store", "online2store",
]

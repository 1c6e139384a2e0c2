from .svd import SVD
from .bpr import BPR
from .fm import FM
from .deepfm import DeepFM
from .wide_deep import WideDeep
from .autoint import AutoInt
from .ncf import NCF

__all__ = ["SVD", "BPR", "FM", "DeepFM", "WideDeep", "AutoInt", "NCF"]

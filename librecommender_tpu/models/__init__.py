from .svd import SVD
from .bpr import BPR

__all__ = ["SVD", "BPR"]

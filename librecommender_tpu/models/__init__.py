from .svd import SVD
from .svdpp import SVDpp
from .bpr import BPR
from .fm import FM
from .deepfm import DeepFM
from .wide_deep import WideDeep
from .autoint import AutoInt
from .ncf import NCF
from .youtube_ranking import YouTubeRanking
from .din import DIN
from .transformer import Transformer
from .sim import SIM
from .rnn4rec import RNN4Rec
from .caser import Caser
from .wave_net import WaveNet
from .two_tower import TwoTower
from .youtube_retrieval import YouTubeRetrieval
from .lightgcn import LightGCN
from .ngcf import NGCF
from .graphsage import GraphSage
from .pinsage import PinSage
from .als import ALS
from .item2vec import Item2Vec
from .deepwalk import DeepWalk
from .user_cf import UserCF
from .item_cf import ItemCF
from .swing import Swing
from .aliases import GraphSageDGL, PinSageDGL, RsItemCF, RsUserCF

__all__ = [
    "SVD", "SVDpp", "BPR", "FM", "DeepFM", "WideDeep", "AutoInt", "NCF",
    "YouTubeRanking", "DIN", "Transformer", "SIM",
    "RNN4Rec", "Caser", "WaveNet", "TwoTower", "YouTubeRetrieval",
    "LightGCN", "NGCF", "GraphSage", "PinSage",
    "ALS", "Item2Vec", "DeepWalk", "UserCF", "ItemCF", "Swing",
    "GraphSageDGL", "PinSageDGL", "RsUserCF", "RsItemCF",
]

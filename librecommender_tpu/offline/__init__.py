"""Offline batch tier: the reference's Spark pipeline, TPU-native.

The reference runs its offline big-data workflow on a Spark cluster
(distributed/spark/src/main/scala/com/libreco/): feature engineering
(FeatureEngineering.scala), an implicit-ALS batch recommender
(model/Recommender.scala), MLP / random-forest classification
(model/Classifier.scala), GBT / generalized-linear regression
(model/Regressor.scala), and grid-search evaluators (evaluate/).

Here the cluster's role is split by what the work actually is: learned
stages (ALS, word2vec, MLP) train as jitted loops on the TPU; columnar
transforms are vectorized numpy, chunkable for out-of-core frames
(``Pipeline.transform_chunks``); tree ensembles — which don't map to the
MXU — run host-side via vectorized histogram growers, as they do on
Spark's CPU executors.
"""
from .evaluate import (
    EvalClassifier,
    EvalRecommender,
    EvalRegressor,
    stratified_chrono_split,
)
from .pipeline import (
    FeatureAssembler,
    MultiHotEncoder,
    OneHotEncoder,
    Pipeline,
    StandardScaler,
    StringIndexer,
    Tokenizer,
    WordVectors,
    preprocess_pipeline,
)
from .recommender import Recommender, load_item_names
from .supervised import Classifier, Regressor, map_rating_label
from .trees import GradientBoostedTrees, RandomForest

__all__ = [
    "Classifier",
    "EvalClassifier",
    "EvalRecommender",
    "EvalRegressor",
    "FeatureAssembler",
    "GradientBoostedTrees",
    "MultiHotEncoder",
    "OneHotEncoder",
    "Pipeline",
    "RandomForest",
    "Recommender",
    "Regressor",
    "StandardScaler",
    "StringIndexer",
    "Tokenizer",
    "WordVectors",
    "load_item_names",
    "map_rating_label",
    "preprocess_pipeline",
    "stratified_chrono_split",
]

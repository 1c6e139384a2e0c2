"""LibRecommender-TPU: a TPU-native recommender system framework.

A from-scratch re-design of the capabilities of LibRecommender
(https://github.com/massquantity/LibRecommender) built on JAX / XLA / Pallas:

- data ingestion & feature transformation (host-side numpy/pandas)
- a single functional training core (jitted train steps, optax optimizers,
  on-device negative sampling and feature gathering)
- 25+ recommendation algorithms spanning MF / CTR / sequence / retrieval /
  graph / classical-CF families
- evaluation (rating / pointwise / listwise metrics)
- cold-start & online recommendation, model persistence & retraining
- multi-device scaling via ``jax.sharding.Mesh`` (data-parallel dense towers,
  row-sharded embedding tables, distributed top-k)
"""

__version__ = "0.1.0"

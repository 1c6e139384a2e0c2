"""Parameter initializers.

Reference parity: libreco/utils/initializers.py:4-35 (truncated normal,
xavier, he). Implemented with `jax.random`; all return device arrays.
"""
import jax
import jax.numpy as jnp


def truncated_normal(rng, shape, mean=0.0, scale=0.05, dtype=jnp.float32):
    """Normal(mean, scale) truncated to +/- 2 scale."""
    x = jax.random.truncated_normal(rng, -2.0, 2.0, shape, dtype)
    return x * scale + mean


def xavier_init(rng, shape, fan_in, fan_out, dtype=jnp.float32):
    scale = jnp.sqrt(2.0 / (fan_in + fan_out))
    return truncated_normal(rng, shape, 0.0, scale, dtype)


def he_init(rng, shape, fan_in, dtype=jnp.float32):
    scale = jnp.sqrt(2.0 / fan_in)
    return truncated_normal(rng, shape, 0.0, scale, dtype)


def glorot_uniform(rng, shape, fan_in, fan_out, dtype=jnp.float32):
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)

"""Initializer distribution battery (reference tests/test_initializers.py).

The reference checks every initializer's samples stay within 3 sigma of
the formula's std; ours are truncated at +/-2 sigma by construction, so
the bound here is exact rather than statistical.
"""
import jax
import jax.numpy as jnp
import numpy as np

from librecommender_tpu.ops.initializers import (
    glorot_uniform,
    he_init,
    truncated_normal,
    xavier_init,
    zeros,
)


def test_truncated_normal_bounds_and_moments():
    rng = jax.random.PRNGKey(42)
    mean, scale = 0.1, 0.01
    v = np.asarray(truncated_normal(rng, (2000, 8), mean=mean, scale=scale))
    assert v.shape == (2000, 8)
    assert (v > mean - 2 * scale - 1e-7).all()
    assert (v < mean + 2 * scale + 1e-7).all()
    assert abs(float(v.mean()) - mean) < 3 * scale / np.sqrt(v.size)
    # truncation shrinks the std below the nominal scale, but not to zero
    assert 0.5 * scale < float(v.std()) < scale


def test_xavier_he_scales():
    rng = jax.random.PRNGKey(0)
    fan_in, fan_out = 4, 2
    v = np.asarray(xavier_init(rng, (fan_in, fan_out), fan_in, fan_out))
    bound = 2 * np.sqrt(2.0 / (fan_in + fan_out))
    assert (np.abs(v) <= bound + 1e-7).all()

    v = np.asarray(he_init(rng, (fan_in, fan_out), fan_in))
    bound = 2 * np.sqrt(2.0 / fan_in)
    assert (np.abs(v) <= bound + 1e-7).all()


def test_glorot_uniform_limit():
    rng = jax.random.PRNGKey(7)
    fan_in, fan_out = 6, 3
    v = np.asarray(glorot_uniform(rng, (500, 9), fan_in, fan_out))
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    assert (np.abs(v) <= limit + 1e-7).all()
    # fills the range, not clustered at zero
    assert float(np.abs(v).max()) > 0.9 * limit


def test_zeros():
    v = np.asarray(zeros((3, 2)))
    assert v.shape == (3, 2) and (v == 0).all()
    assert v.dtype == np.float32


def test_initializers_deterministic_per_key():
    a = np.asarray(truncated_normal(jax.random.PRNGKey(5), (4, 4)))
    b = np.asarray(truncated_normal(jax.random.PRNGKey(5), (4, 4)))
    c = np.asarray(truncated_normal(jax.random.PRNGKey(6), (4, 4)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)

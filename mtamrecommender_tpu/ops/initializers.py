"""Parameter initializers matching the reference's TF-1.14 defaults."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def glorot_uniform(rng: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """tf.get_variable / tf.layers.dense default initializer.

    TF computes (fan_in, fan_out) from the shape; for 1-D shapes both fans
    equal shape[0].
    """
    if len(shape) >= 2:
        fan_in, fan_out = shape[-2], shape[-1]
    else:
        fan_in = fan_out = shape[0] if shape else 1
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, minval=-limit, maxval=limit)


def embedding_uniform(rng: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Lookup-table init U(-r, r), r = sqrt(6 / embedding_dim)
    (Embedding/base_embedding.py:46-60)."""
    r = math.sqrt(6.0 / shape[-1])
    return jax.random.uniform(rng, shape, dtype, minval=-r, maxval=r)


def zeros(_rng: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(shape, dtype)


def ones(_rng: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    return jnp.ones(shape, dtype)

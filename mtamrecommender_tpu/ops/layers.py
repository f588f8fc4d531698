"""Small neural-net building blocks (jnp reference path).

Ports of `/root/reference/Model/Modules/net_utils.py` plus the dense /
layer-norm helpers the models share.  Everything is a pure function over
explicit parameter dicts so models compose into a single jit region.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from mtamrecommender_tpu.ops import initializers as init

Params = Dict[str, jax.Array]


# ---- dense ----

def init_dense(rng: jax.Array, in_dim: int, out_dim: int,
               use_bias: bool = True, dtype=jnp.float32) -> Params:
    kw, _ = jax.random.split(rng)
    params: Params = {"w": init.glorot_uniform(kw, (in_dim, out_dim), dtype)}
    if use_bias:
        params["b"] = jnp.zeros((out_dim,), dtype)
    return params


def dense(params: Params, x: jax.Array,
          activation: Optional[Callable[[jax.Array], jax.Array]] = None
          ) -> jax.Array:
    y = jnp.matmul(x, params["w"], preferred_element_type=x.dtype)
    if "b" in params:
        y = y + params["b"]
    if activation is not None:
        y = activation(y)
    return y


# ---- normalization ----

def init_layer_norm(dim: int, dtype=jnp.float32) -> Params:
    return {"gamma": jnp.ones((dim,), dtype), "beta": jnp.zeros((dim,), dtype)}


def layer_norm(params: Params, x: jax.Array, epsilon: float = 1e-12) -> jax.Array:
    """tf.contrib.layers.layer_norm over the last axis
    (net_utils.layer_norm:229-232); TF's variance_epsilon is 1e-12."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + epsilon)
    return params["gamma"] * normed + params["beta"]


def normalize(params: Params, x: jax.Array, epsilon: float = 1e-8) -> jax.Array:
    """The attention modules' in-house layer norm
    (multihead_attention.py:5-32): (x-mean)/(var+eps)**0.5 * gamma + beta."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    normed = (x - mean) / jnp.sqrt(var + epsilon)
    return params["gamma"] * normed + params["beta"]


# ---- sequence utilities ----

def sequence_mask(lengths: jax.Array, maxlen: int) -> jax.Array:
    """tf.sequence_mask: [B, maxlen] boolean."""
    pos = jnp.arange(maxlen, dtype=lengths.dtype)[None, :]
    return pos < lengths[:, None]


def gather_positions(sequence: jax.Array, positions: jax.Array) -> jax.Array:
    """Vector at a per-row position (net_utils.gather_indexes:82-92,
    done with take_along_axis instead of flat offsets + gather).

    sequence: [B, L, D]; positions: [B] -> [B, D]
    """
    idx = positions[:, None, None].astype(jnp.int32)
    return jnp.take_along_axis(sequence, idx, axis=1)[:, 0, :]


def sequential_average_pooling(sequence: jax.Array, lengths: jax.Array) -> jax.Array:
    """Masked mean over time (net_utils.py:94-100 — note the reference
    divides by the padded length L via reduce_mean; we reproduce that)."""
    mask = sequence_mask(lengths, sequence.shape[1]).astype(sequence.dtype)
    return jnp.mean(sequence * mask[:, :, None], axis=1)


def sequential_max_pooling(sequence: jax.Array, lengths: jax.Array) -> jax.Array:
    """Masked max over time (net_utils.sequential_max_pooling:102-110);
    padded positions are -inf so they never win."""
    mask = sequence_mask(lengths, sequence.shape[1])[:, :, None]
    neg = jnp.full_like(sequence, -(2.0 ** 32) + 1.0)
    return jnp.max(jnp.where(mask, sequence, neg), axis=1)


def dropout(rng: Optional[jax.Array], x: jax.Array, rate: float,
            train: bool) -> jax.Array:
    """tf.layers.dropout semantics (inverted dropout)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---- activations (net_utils.py:8-61,131-144) ----

def prelu(x: jax.Array, alpha: jax.Array) -> jax.Array:
    return jnp.maximum(0.0, x) + alpha * jnp.minimum(0.0, x)


def dice(x: jax.Array, alpha: jax.Array, axis: int = -1,
         epsilon: float = 1e-9) -> jax.Array:
    axes = tuple(i for i in range(x.ndim) if i != (axis % x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    std = jnp.sqrt(jnp.mean(jnp.square(x - mean) + epsilon, axis=axes,
                            keepdims=True))
    x_p = jax.nn.sigmoid((x - mean) / (std + epsilon))
    return alpha * (1.0 - x_p) * x + x_p * x


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


def l2_loss(x: jax.Array) -> jax.Array:
    """tf.nn.l2_loss: sum(x**2) / 2."""
    return jnp.sum(jnp.square(x)) / 2.0

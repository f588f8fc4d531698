"""Key-axis context parallelism for the time-aware attention (SP/CP).

SURVEY.md §5.7: the reference caps histories at L=50 and its
position-indexed [Tq,Tk] gate parameters actively prevent length scaling
(`/root/reference/Model/Modules/time_aware_attention.py:295-312`).  With
the scalar-Δt gate (ModelConfig.time_gate_mode='scalar') the gate is a
pointwise function of (q, k, Δt), so the KEY axis can shard over a mesh
axis: each shard projects and scores only its own key block — including
its slice of the decay gate — and the softmax is assembled exactly with
a blockwise online-softmax exchange (pmax of block maxima + psum of
rescaled numerators/denominators), the flash-attention identity over
devices.

Per-device memory is O(Tk / shards): histories of thousands of events
fit without ever materializing a [Tq,Tk] score tensor (or key/value
projection) on one device.

Wiring mirrors the embedding-engine scope: dist_trainer enters
`cp_scope` while TRACING a sharded step when MeshConfig.context_parallel
is set, and ops.attention.time_aware_multihead_attention routes here.
"""

from __future__ import annotations

from contextlib import contextmanager
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

NEG_FILL = -(2.0 ** 32) + 1.0

_GATE_KEYS = ("time_input_w", "time_input_w1", "time_input_b1",
              "time_output_w1", "time_output_w2", "time_output_b")

_ACTIVE: list = []


@contextmanager
def cp_scope(mesh: Mesh, key_axis: str = "model", data_axis: str = "data"):
    """Route time-aware attention through the key-axis-sharded path for
    everything traced inside the scope (no-op on a 1-wide key axis)."""
    if mesh.shape[key_axis] <= 1:
        yield
        return
    _ACTIVE.append((mesh, key_axis, data_axis))
    try:
        yield
    finally:
        _ACTIVE.pop()


def active_cp() -> Optional[Tuple[Mesh, str, str]]:
    return _ACTIVE[-1] if _ACTIVE else None


def _heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, t, d = x.shape
    return jnp.transpose(x.reshape(b, t, num_heads, d // num_heads),
                         (0, 2, 1, 3))


def _local_block(params, queries, k_raw, key_len, t_q, t_k,
                 num_heads: int, key_axis: str):
    """Project + score ONE key shard and assemble the exact softmax with
    the other shards.  queries [B,Tq,d] replicated over the key axis;
    k_raw [B,Tkl,d] / t_k [B,Tkl] this shard's key block.  Returns the
    softmax-weighted value sum [B,h,Tq,dh] (identical on every shard
    after the psums)."""
    from mtamrecommender_tpu.ops import layers

    tk_local = k_raw.shape[1]
    shard = jax.lax.axis_index(key_axis)
    offset = shard * tk_local
    # relu projections, LOCAL key block only (:249-253)
    q = _heads(layers.dense(params["q"], queries, jax.nn.relu), num_heads)
    k = _heads(layers.dense(params["k"], k_raw, jax.nn.relu), num_heads)
    v = _heads(layers.dense(params["v"], k_raw, jax.nn.relu), num_heads)
    # content-time kernel on RAW q/k (time_aware_attention.py:320-323)
    time_qk = jnp.tanh(jnp.einsum(
        "bqd,de,bke->bqk", queries, params["time_input_w"], k_raw))
    delta = jnp.abs(t_q[:, :, None] - t_k[:, None, :])
    decay = jnp.tanh(jnp.log1p(delta) * params["time_input_w1"]
                     + params["time_input_b1"])
    gate = (params["time_output_w1"] * decay
            + params["time_output_w2"] * time_qk
            + params["time_output_b"])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    scores = scores * jax.nn.sigmoid(gate)[:, None, :, :]
    scores = scores / (k.shape[-1] ** 0.5)
    # key mask against GLOBAL positions (tf.sequence_mask semantics)
    j = offset + jnp.arange(tk_local)
    mask = j[None, :] < key_len[:, None]                      # [B,Tkl]
    scores = jnp.where(mask[:, None, None, :], scores, NEG_FILL)
    # blockwise online softmax (exact): rescale by the GLOBAL max.  The
    # max is a pure numerical-stability shift (softmax is shift-invariant,
    # so gradients are unchanged) — stop_gradient keeps it out of AD,
    # which pmax does not support.
    m = jax.lax.pmax(jax.lax.stop_gradient(jnp.max(scores, axis=-1)),
                     key_axis)                                # [B,h,Tq]
    p = jnp.exp(scores - m[..., None])
    s = jax.lax.psum(jnp.sum(p, axis=-1), key_axis)
    o = jax.lax.psum(jnp.einsum("bhqk,bhkd->bhqd", p, v), key_axis)
    return o / s[..., None]


def cp_time_attention(params, queries: jax.Array, keys: jax.Array,
                      key_len: jax.Array, t_queries: jax.Array,
                      t_keys: jax.Array, *, num_heads: int) -> jax.Array:
    """Exact time-aware attention with keys sharded over the active CP
    axis.  Returns the pre-tail output [B,Tq,d] (softmax-weighted sum,
    heads restored); the caller applies query mask + residual + norm.
    """
    mesh, key_axis, data_axis = active_cp()
    if getattr(params["time_input_w1"], "ndim", 0) != 0:
        raise ValueError(
            "context_parallel requires model.time_gate_mode='scalar': the "
            "positional [Tq,Tk] gate parameters cannot shard over the key "
            "axis (SURVEY.md §5.7)")
    n_shards = mesh.shape[key_axis]
    tk = keys.shape[1]
    if tk % n_shards != 0:
        raise ValueError(f"key length {tk} not divisible by the "
                         f"{key_axis} axis ({n_shards}); pad max_seq_len")
    block_params = {k: params[k] for k in _GATE_KEYS}
    block_params.update({k: params[k] for k in ("q", "k", "v")})
    fn = shard_map(
        partial(_local_block, num_heads=num_heads, key_axis=key_axis),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), block_params),
                  P(data_axis, None, None),             # queries
                  P(data_axis, key_axis, None),         # raw key block
                  P(data_axis),                         # key_len
                  P(data_axis, None),                   # t_q
                  P(data_axis, key_axis)),              # t_k
        out_specs=P(data_axis, None, None, None),
        check_vma=False,   # psum/pmax make the result key-axis-invariant
    )
    out = fn(block_params, queries, keys, key_len, t_queries, t_keys)
    b, h, tq, dh = out.shape
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, tq, h * dh)

"""Explicit row-sharded embedding engine (EP) via shard_map.

Two implementations of the north-star sharded-lookup exchange
(BASELINE.json: "row-sharded across a pod slice with all-to-all ID-lookup
exchange"), both exact wrt the replicated path:

  * `sharded_gather` (default): every model-axis shard holds a contiguous
    row range [s*rows, (s+1)*rows); each shard gathers the ids it owns
    (out-of-range ids produce zero rows) and one `psum` over the model
    axis assembles the result.  One collective, regular traffic, and the
    backward pass is pure local scatter-add — gradients never cross the
    axis (each shard's rows are touched only by its own masked gather).

  * `sharded_gather_a2a`: the literal all-to-all form — ids are bucketed
    by owner, exchanged with `all_to_all`, resolved locally, and the rows
    are returned with the inverse `all_to_all`.  Moves O(ids*d/S) per
    link instead of psum's O(ids*d), at the cost of a fixed per-shard
    bucket capacity (ids are distributed ~uniformly after label
    encoding).  Exposed for benchmarking on real slices.

GSPMD reaches similar code paths implicitly from sharding annotations
(parallel/sharding.py); this module is the hand-held version for when the
partitioner's choice must be pinned, and the unit that proves lookup
exactness shard-vs-replicated (tests/test_parallel.py).

The table's physical row count must divide by the axis size — use
ops.embedding.pad_vocab / ModelConfig.vocab_pad_multiple.
"""

from __future__ import annotations

from contextlib import contextmanager
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

ENGINES = ("gspmd", "a2a", "psum")


def _local_lookup(table_shard: jax.Array, ids: jax.Array,
                  axis_name: str) -> jax.Array:
    """Gather the ids this shard owns; zeros elsewhere; psum assembles."""
    rows = table_shard.shape[0]
    shard = jax.lax.axis_index(axis_name)
    offset = shard * rows
    local = ids - offset
    mine = (local >= 0) & (local < rows)
    safe = jnp.clip(local, 0, rows - 1)
    gathered = jnp.take(table_shard, safe, axis=0)
    gathered = jnp.where(mine[..., None], gathered, 0.0)
    return jax.lax.psum(gathered, axis_name)


def sharded_gather(mesh: Mesh, table: jax.Array, ids: jax.Array,
                   model_axis: str = "model",
                   data_axis: str = "data") -> jax.Array:
    """ids [...]-shaped int32 -> [..., d], table row-sharded over
    ``model_axis`` and ids/results batch-sharded over ``data_axis``."""
    fn = shard_map(
        partial(_local_lookup, axis_name=model_axis),
        mesh=mesh,
        in_specs=(P(model_axis, None), P(data_axis)),
        out_specs=P(data_axis),
        check_vma=False,   # psum makes the result model-invariant
    )
    return fn(table, ids)


# ------------------------------------------------------- all-to-all form

def _a2a_lookup(table_shard: jax.Array, ids: jax.Array, axis_name: str,
                num_shards: int, bucket: int) -> jax.Array:
    """Bucket ids by owner shard -> all_to_all -> local resolve ->
    inverse all_to_all -> un-bucket."""
    rows = table_shard.shape[0]
    n = ids.shape[0]
    owner = jnp.clip(ids // rows, 0, num_shards - 1)

    # stable bucketing: position of each id within its owner's bucket
    onehot = jax.nn.one_hot(owner, num_shards, dtype=jnp.int32)  # [n, S]
    pos_in_bucket = jnp.cumsum(onehot, axis=0) - onehot          # [n, S]
    slot = jnp.sum(pos_in_bucket * onehot, axis=1)               # [n]

    send_ids = jnp.zeros((num_shards, bucket), ids.dtype)
    send_ids = send_ids.at[owner, slot].set(ids, mode="drop")
    sent_mask = jnp.zeros((num_shards, bucket), jnp.bool_)
    sent_mask = sent_mask.at[owner, slot].set(True, mode="drop")

    # exchange request buckets: shard s receives the ids everyone wants
    # from s
    req = jax.lax.all_to_all(send_ids, axis_name, 0, 0, tiled=False)
    local = jnp.clip(req - jax.lax.axis_index(axis_name) * rows, 0, rows - 1)
    resolved = jnp.take(table_shard, local, axis=0)   # [S, bucket, d]

    # return rows to the requesters
    back = jax.lax.all_to_all(resolved, axis_name, 0, 0, tiled=False)

    out = back[owner, slot]                            # [n, d]
    ok = sent_mask[owner, slot]
    return jnp.where(ok[..., None], out, 0.0)


def sharded_gather_a2a(mesh: Mesh, table: jax.Array, ids: jax.Array,
                       model_axis: str = "model", data_axis: str = "data",
                       bucket: int | None = None) -> jax.Array:
    """All-to-all ID-exchange lookup.  ``bucket`` is the per-owner-shard
    request capacity per device (default: all local ids, always enough)."""
    num_shards = mesh.shape[model_axis]
    flat = ids.reshape(-1)
    data_size = mesh.shape[data_axis]
    local_n = flat.shape[0] // data_size
    cap = bucket or local_n
    fn = shard_map(
        partial(_a2a_lookup, axis_name=model_axis, num_shards=num_shards,
                bucket=cap),
        mesh=mesh,
        in_specs=(P(model_axis, None), P(data_axis)),
        out_specs=P(data_axis),
        check_vma=False,   # symmetric exchange: identical on every shard
    )
    out = fn(table, flat)
    return out.reshape(*ids.shape, table.shape[1])


# ------------------------------------------- trace-time engine routing

# Active explicit-engine scope.  dist_trainer enters this WHILE TRACING a
# sharded step so ops/embedding.gather_rows routes every table lookup
# through the selected shard_map engine instead of jnp.take + GSPMD; the
# choice is baked into the compiled executable (the scope only exists at
# trace time).  A plain list, not a threading.local: tracing happens on
# the caller's thread.
_ACTIVE: list = []


@contextmanager
def engine_scope(mesh: Mesh, engine: str, model_axis: str = "model",
                 data_axis: str = "data"):
    """Route `ops.embedding.gather_rows` through an explicit EP engine
    for everything traced inside the scope.  'gspmd' (or a 1-sized model
    axis) is a no-op: lookups stay jnp.take and the partitioner chooses
    the collectives from the sharding annotations."""
    if engine not in ENGINES:
        raise ValueError(f"unknown embedding_engine {engine!r}; "
                         f"known: {ENGINES}")
    if engine == "gspmd" or mesh.shape[model_axis] <= 1:
        yield
        return
    _ACTIVE.append((mesh, engine, model_axis, data_axis))
    try:
        yield
    finally:
        _ACTIVE.pop()


def active_gather() -> Optional[Callable[[jax.Array, jax.Array], jax.Array]]:
    """The gather(table, ids) callable for the innermost engine_scope, or
    None when no explicit engine is active."""
    if not _ACTIVE:
        return None
    mesh, engine, model_axis, data_axis = _ACTIVE[-1]
    fn = sharded_gather_a2a if engine == "a2a" else sharded_gather

    def gather(table: jax.Array, ids: jax.Array) -> jax.Array:
        return fn(mesh, table, ids, model_axis=model_axis,
                  data_axis=data_axis)

    return gather

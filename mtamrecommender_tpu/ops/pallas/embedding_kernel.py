"""Embedding gather / scatter-add-grad kernels (Pallas TPU).

The north-star sharded-embedding engine names these two primitives
(BASELINE.json: "Fused Pallas kernels cover embedding gather/scatter-grad").
The lookup walks one id per grid step with the row address computed from a
scalar-prefetched id vector (`PrefetchScalarGridSpec`), so the row DMA for
step i+1 is issued while step i computes — the table itself never leaves
HBM.  The gradient kernel exploits the TPU grid's sequential execution
order to accumulate duplicate ids without atomics.

These are correctness-complete and flag-guarded; XLA's native gather /
scatter-add remains the default path (`ops.embedding.gather_rows`) — at
d=128 XLA's fused gather is already near HBM roofline, and the sharded
(EP) path goes through GSPMD sharding of the same ops
(parallel/sharding.py).

Gradient contract: `gather(table, ids)` has a custom VJP whose backward
is the scatter-add kernel, so `jax.grad` through a pallas gather produces
the pallas scatter — the full fwd/bwd pair stays native.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(ids_ref, table_row_ref, out_ref):
    del ids_ref
    out_ref[...] = table_row_ref[...]


@jax.jit
def _gather_impl(table: jax.Array, flat_ids: jax.Array) -> jax.Array:
    n = flat_ids.shape[0]
    d = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, d), lambda i, ids: (ids[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d), lambda i, ids: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
        interpret=jax.default_backend() != "tpu",
    )(flat_ids.astype(jnp.int32), table)


def _scatter_kernel(ids_ref, grad_ref, zeros_ref, out_ref):
    del ids_ref, zeros_ref
    # the grid runs sequentially on a TensorCore: read-modify-write per id
    # is race-free (duplicate ids accumulate across steps)
    out_ref[...] += grad_ref[...]


@functools.partial(jax.jit, static_argnames=("vocab",))
def _scatter_add_impl(grad: jax.Array, flat_ids: jax.Array,
                      vocab: int) -> jax.Array:
    n, d = grad.shape
    zeros = jnp.zeros((vocab, d), grad.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, d), lambda i, ids: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, d), lambda i, ids: (ids[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((vocab, d), grad.dtype),
        input_output_aliases={2: 0},   # zeros buffer -> accumulated output
        interpret=jax.default_backend() != "tpu",
    )(flat_ids.astype(jnp.int32), grad, zeros)


@jax.custom_vjp
def gather(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table: [V, d]; ids: any int shape -> [*ids.shape, d]."""
    flat = ids.reshape(-1)
    out = _gather_impl(table, flat)
    return out.reshape(*ids.shape, table.shape[1])


def _gather_fwd(table, ids):
    return gather(table, ids), (ids, table.shape[0])


def _gather_bwd(residuals, g):
    ids, vocab = residuals
    d = g.shape[-1]
    dtable = _scatter_add_impl(g.reshape(-1, d), ids.reshape(-1),
                               vocab=vocab)
    return dtable, None


gather.defvjp(_gather_fwd, _gather_bwd)

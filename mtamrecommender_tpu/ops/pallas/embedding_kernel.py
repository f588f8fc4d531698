"""Embedding gather / scatter-add-grad kernels (Pallas TPU).

The north-star sharded-embedding engine names these two primitives
(BASELINE.json: "Fused Pallas kernels cover embedding gather/scatter-grad").
Rows live in HBM and move by explicit per-row async DMA with the row
address taken from a scalar-prefetched id vector — the table never
streams through VMEM, and consecutive grid steps overlap DMA issue with
the previous row's completion (2-deep rotation).  The gradient kernel
exploits the TPU grid's sequential execution order to accumulate
duplicate ids without atomics (read row, add, write back).

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


def _gather_kernel(ids_ref, table_ref, out_ref, sems):
    """Grid step i: DMA table[ids[i]] -> out[i], double-buffered."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def dma(step, s):
        return pltpu.make_async_copy(table_ref.at[ids_ref[step]],
                                     out_ref.at[step], sems.at[s])

    @pl.when(i == 0)
    def _warmup():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _issue_next():
        dma(i + 1, 1 - slot).start()

    dma(i, slot).wait()


@jax.jit
def _gather_impl(table: jax.Array, flat_ids: jax.Array) -> jax.Array:
    n = flat_ids.shape[0]
    d = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() != "tpu",
    )(flat_ids.astype(jnp.int32), table)


def _scatter_kernel(ids_ref, grad_ref, zeros_ref, out_ref, row_vmem,
                    grad_vmem, sems):
    """Grid step i (sequential): out[ids[i]] += grad[i] via
    DMA-in / add / DMA-out."""
    del zeros_ref
    i = pl.program_id(0)
    row_id = ids_ref[i]
    in_dma = pltpu.make_async_copy(out_ref.at[row_id], row_vmem, sems.at[0])
    g_dma = pltpu.make_async_copy(grad_ref.at[i], grad_vmem, sems.at[1])
    in_dma.start()
    g_dma.start()
    in_dma.wait()
    g_dma.wait()
    row_vmem[...] = row_vmem[...] + grad_vmem[...]
    out_dma = pltpu.make_async_copy(row_vmem, out_ref.at[row_id], sems.at[2])
    out_dma.start()
    out_dma.wait()


@functools.partial(jax.jit, static_argnames=("vocab",))
def _scatter_add_impl(grad: jax.Array, flat_ids: jax.Array,
                      vocab: int) -> jax.Array:
    n, d = grad.shape
    zeros = jnp.zeros((vocab, d), grad.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((d,), grad.dtype),
            pltpu.VMEM((d,), grad.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((vocab, d), grad.dtype),
        input_output_aliases={2: 0},   # zeros buffer -> accumulated output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
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


# ------------------------------------------------------- dtable (fused bwd)
#
# dtable[v, :] = sum_n [ids[n] == v] * ct[n, :] — the embedding-table
# backward.  XLA's scatter-add lowers to a SERIAL per-index loop on TPU
# (measured as ~half the STAMP framework floor,
# benchmarks/results/floor_r5.json); the jnp one-hot^T @ ct rewrite
# (ops/embedding._take_onehot_bwd) fixes that but must MATERIALIZE the
# [n, V] one-hot in HBM because XLA cannot fuse producers into dot
# operands (~98 MB round-trip at the headline shapes).  This kernel
# builds the one-hot TILES in VMEM instead: grid over [TILE_V]-row
# output tiles x [CHUNK_N]-id chunks, each step comparing the chunk's
# ids against the tile's row range (VPU) and contracting on the MXU with
# f32 accumulation.  The cotangent chunk stays VMEM-resident; nothing
# [n, V]-sized ever exists.

TILE_V = 128     # output rows per grid step (lane-dim aligned)
CHUNK_N = 2048   # ids per grid step (bounds VMEM at long history lengths)
# hold the WHOLE id set as one chunk when its cotangent block fits this
# VMEM budget: the grid shrinks from (V/128)*(n/CHUNK_N) steps to V/128,
# cutting the per-grid-step overhead that dominates at small n
_ONE_CHUNK_BYTES = 4 * 1024 * 1024


def _chunk_for(n: int, d: int, itemsize: int) -> int:
    if n * d * itemsize <= _ONE_CHUNK_BYTES:
        return -(-n // 8) * 8          # one sublane-aligned chunk
    return CHUNK_N


def _dtable_kernel(ids_ref, ct_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        # zero-init in EVERY mode: hardware gives uninitialized output
        # blocks (interpret mode zero-fills — do not rely on it)
        out_ref[...] = jnp.zeros_like(out_ref)

    t = pl.program_id(0)
    rows = t * TILE_V + jax.lax.broadcasted_iota(jnp.int32, (1, TILE_V), 1)
    onehot = (ids_ref[...] == rows).astype(ct_ref.dtype)     # [CHUNK_N, TILE_V]
    # f32 cotangents: force HIGHEST or the MXU rounds them to bf16 in a
    # single pass (measured 1.8e-3 rel grad drift vs scatter); the
    # one-hot operand is exact either way.  bf16 cotangents single-pass.
    precision = (jax.lax.Precision.HIGHEST
                 if ct_ref.dtype == jnp.float32 else None)
    out_ref[...] += jax.lax.dot_general(
        onehot, ct_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("vocab",))
def _dtable_impl(ct: jax.Array, flat_ids: jax.Array, vocab: int) -> jax.Array:
    n, d = ct.shape
    v_pad = -(-vocab // TILE_V) * TILE_V
    chunk = _chunk_for(n, d, ct.dtype.itemsize)
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        # pad ids with -1 (matches no tile row) and cts with zeros
        flat_ids = jnp.concatenate(
            [flat_ids, jnp.full((n_pad - n,), -1, jnp.int32)])
        ct = jnp.concatenate([ct, jnp.zeros((n_pad - n, d), ct.dtype)])
    out = pl.pallas_call(
        _dtable_kernel,
        grid=(v_pad // TILE_V, n_pad // chunk),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda t, k: (k, 0)),
            pl.BlockSpec((chunk, d), lambda t, k: (k, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_V, d), lambda t, k: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((v_pad, d), ct.dtype),
        interpret=jax.default_backend() != "tpu",
    )(flat_ids.astype(jnp.int32)[:, None], ct)
    return out[:vocab] if v_pad != vocab else out


@jax.custom_vjp
def take_dtable(table: jax.Array, ids: jax.Array) -> jax.Array:
    """jnp.take forward (XLA's fused gather is near HBM roofline);
    backward = the tiled one-hot dtable kernel above."""
    return jnp.take(table, ids, axis=0)


def _take_dtable_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (ids, table.shape[0])


def _take_dtable_bwd(res, ct):
    ids, vocab = res
    d = ct.shape[-1]
    return _dtable_impl(ct.reshape(-1, d), ids.reshape(-1), vocab), None


take_dtable.defvjp(_take_dtable_fwd, _take_dtable_bwd)

"""Behavior-sequence embedding layer.

Port of `/root/reference/Embedding/Behavior_embedding_time_aware_attention.py`:
four lookup tables (user/item/category/position, each with +3 vocab slack
rows) and the fused behavior embedding
``ReLU(Dense_d(concat(item_emb, cat_emb))) + position_emb`` (:93-104,
bias-free dense).  Lookups go through a pluggable gather so the
row-sharded (EP) and Pallas paths can swap in without touching models.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from mtamrecommender_tpu.ops import initializers as init
from mtamrecommender_tpu.types import Batch, DatasetMeta

Params = Dict[str, jax.Array]


class EmbeddedBatch(NamedTuple):
    user_emb: jax.Array       # [B, d]
    behavior_emb: jax.Array   # [B, L, d]
    item_emb: jax.Array       # [B, L, d]
    cat_emb: jax.Array        # [B, L, d]
    pos_emb: jax.Array        # [B, L, d]


def pad_vocab(count: int, multiple: int) -> int:
    """Round a vocab size up so tables row-shard evenly and tile onto the
    TPU lane dimension.  Padded rows are PHYSICAL only: logits for ids >=
    the logical vocab are masked to the reference's -2**32 fill in
    models/base.item_logits, so ranking/CE semantics are unchanged."""
    if multiple <= 1:
        return count
    return ((count + multiple - 1) // multiple) * multiple


def init_behavior_embedding(rng: jax.Array, meta: DatasetMeta, num_units: int,
                            dtype=jnp.float32, vocab_pad_multiple: int = 1
                            ) -> Params:
    ku, ki, kc, kp, kd = jax.random.split(rng, 5)
    pad = lambda n: pad_vocab(n, vocab_pad_multiple)  # noqa: E731
    return {
        "user_table": init.embedding_uniform(ku, (pad(meta.user_vocab), num_units), dtype),
        "item_table": init.embedding_uniform(ki, (pad(meta.item_vocab), num_units), dtype),
        "cat_table": init.embedding_uniform(kc, (pad(meta.category_vocab), num_units), dtype),
        "pos_table": init.embedding_uniform(kp, (pad(meta.position_vocab), num_units), dtype),
        # dense4emb (:98-101): relu dense, use_bias=False
        "dense_w": init.glorot_uniform(kd, (2 * num_units, num_units), dtype),
    }


# Backward-pass routing for table lookups.  XLA lowers scatter-add to a
# SERIAL per-index loop on TPU; at the headline shapes (12.8k ids/step
# into each of 4 tables) that loop IS the framework floor: the measured
# STAMP decomposition (benchmarks/results/floor_r5.json) pins the 4
# scatter backwards at ~33 of the 62 ms/100-step floor, while expressing
# the same reduction as one-hot^T @ ct on the MXU runs the identical
# step at 44.5 ms.  'auto' (default) uses the one-hot-matmul backward
# for tables up to ONEHOT_BWD_MAX_VOCAB rows — the one-hot cost scales
# with n_ids * vocab, so huge catalogs (which should be EP-sharded
# anyway) keep the scatter.  Same math up to float-summation order
# (one-hot accumulates in f32 and rounds once; scatter rounds per add) —
# parity pinned in tests/test_ops.py.
ONEHOT_BWD_MAX_VOCAB = 4096
# materialization budget for the jnp one-hot (n_ids * vocab elements):
# at the headline shapes 12.8k x 3840 = 49M (~98 MB bf16) still wins; a
# long-history step (131k ids) would build a ~1 GB one-hot — beyond
# this, route the pallas dtable kernel (which builds tiles in VMEM) or
# fall back to scatter
ONEHOT_BWD_MAX_ELEMS = 1 << 26
_GRAD_MODE = "auto"     # auto | scatter | onehot (trace-time knob)


def set_grad_mode(mode: str) -> None:
    global _GRAD_MODE
    if mode not in ("auto", "scatter", "onehot"):
        raise ValueError(f"unknown embedding_grad_mode {mode!r}")
    _GRAD_MODE = mode


@jax.custom_vjp
def _take_onehot_bwd(table: jax.Array, ids: jax.Array) -> jax.Array:
    return jnp.take(table, ids, axis=0)


def _take_oh_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (ids, table.shape[0])


def _take_oh_bwd(res, ct):
    ids, vocab = res
    flat_ct = ct.reshape(-1, ct.shape[-1])
    oh = jax.nn.one_hot(ids.reshape(-1), vocab, dtype=flat_ct.dtype)
    # f32 cotangents: HIGHEST, or the TPU MXU rounds them to bf16 in a
    # single pass (~2e-3 rel grad drift vs scatter-add — measured on the
    # dtable kernel, same mechanism); the one-hot operand is exact.
    precision = (jax.lax.Precision.HIGHEST
                 if flat_ct.dtype == jnp.float32 else None)
    dtable = jnp.matmul(oh.T, flat_ct,
                        preferred_element_type=jnp.float32,
                        precision=precision).astype(flat_ct.dtype)
    return dtable, None


_take_onehot_bwd.defvjp(_take_oh_fwd, _take_oh_bwd)


def gather_rows(table: jax.Array, ids: jax.Array,
                use_pallas: bool = False) -> jax.Array:
    """Table lookup.  Inside a `parallel.embedding_shard.engine_scope`
    (entered by dist_trainer while tracing a sharded step with
    MeshConfig.embedding_engine != 'gspmd') the lookup routes through the
    explicit shard_map engine; otherwise jnp.take — with the backward
    routed per _GRAD_MODE (see above).  With ``use_pallas`` (and the
    'embedding' pallas scope) the backward upgrades from the jnp one-hot
    matmul to the tiled-one-hot pallas kernel
    (ops/pallas/embedding_kernel.take_dtable), which never materializes
    the [n, V] one-hot in HBM."""
    from mtamrecommender_tpu.parallel import embedding_shard as es
    engine = es.active_gather()
    if engine is not None:
        return engine(table, ids)
    vocab = table.shape[0]
    if _GRAD_MODE == "onehot":
        # explicit forcing bypasses the size budget: the user asked for
        # the MXU backward; a silent scatter fallback would make
        # 'onehot' vs 'scatter' A/Bs measure the same thing (ADVICE r5)
        return _take_onehot_bwd(table, ids)
    if _GRAD_MODE == "auto" and vocab <= ONEHOT_BWD_MAX_VOCAB:
        if ids.size * vocab <= ONEHOT_BWD_MAX_ELEMS:
            # the jnp one-hot beats BOTH scatter and the pallas kernel
            # wherever its materialization fits (floor_r5 / steps_r5dtable
            # / long_history_r5*512 measurements)
            return _take_onehot_bwd(table, ids)
        if use_pallas:
            from mtamrecommender_tpu.ops.pallas import flags as pallas_flags
            if pallas_flags.enabled("embedding"):
                from mtamrecommender_tpu.ops.pallas import embedding_kernel
                return embedding_kernel.take_dtable(table, ids)
    return jnp.take(table, ids, axis=0)


def behavior_embedding(params: Params, batch: Batch,
                       gather=None,
                       use_pallas: bool = False) -> EmbeddedBatch:
    # NOTE: use_pallas routes the lookup BACKWARD through the tiled
    # dtable kernel (see gather_rows); the forward stays XLA's fused
    # gather, which is already at HBM roofline for d=128 rows (the
    # per-row-DMA demonstration kernel ops/pallas/embedding_kernel.gather
    # is not a win at these shapes — pass gather=embedding_kernel.gather
    # explicitly to use it).
    if gather is None:
        gather = lambda t, i: gather_rows(t, i, use_pallas=use_pallas)  # noqa: E731
    user_emb = gather(params["user_table"], batch.user_id)
    item_emb = gather(params["item_table"], batch.items)
    cat_emb = gather(params["cat_table"], batch.cats)
    pos_emb = gather(params["pos_table"], batch.positions)
    concat = jnp.concatenate([item_emb, cat_emb], axis=-1)
    dense = jax.nn.relu(jnp.matmul(concat, params["dense_w"],
                                   preferred_element_type=concat.dtype))
    behavior = dense + pos_emb
    return EmbeddedBatch(user_emb=user_emb, behavior_emb=behavior,
                         item_emb=item_emb, cat_emb=cat_emb, pos_emb=pos_emb)

"""Shared model contract: embedding trunk, losses, scoring.

Port of the shared surface of `/root/reference/Model/base_model.py`:
  * output():        full-catalog softmax CE + L2 over looked-up
                     embeddings (base_model.py:300-328)
  * output_concat(): extra [2d, d] projection before the shared item
                     table (base_model.py:329-357)
  * scoring for eval: predict_emb @ item_table^T (metrics_topK:188-213)

Models here are functional: ``init(rng, cfg, meta) -> params`` and
``apply(params, cfg, batch, train, rng) -> ModelOutput``; the trainer
jit-compiles one loss step over any registry entry.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mtamrecommender_tpu.config import ModelConfig
from mtamrecommender_tpu.ops import embedding as emb_ops
from mtamrecommender_tpu.ops import layers
from mtamrecommender_tpu.types import Batch, DatasetMeta

Params = Dict[str, Any]


class ModelOutput(NamedTuple):
    predict_emb: jax.Array            # [B, d] (or [B, 2d] for concat models)
    embedded: emb_ops.EmbeddedBatch   # residuals for the L2 term


class ModelDef(NamedTuple):
    name: str
    init: Callable[..., Params]       # (rng, cfg, meta) -> params
    apply: Callable[..., ModelOutput]  # (params, cfg, batch, train, rng)
    output_mode: str = "plain"        # plain | concat | bpr


def mask_index(batch: Batch) -> jax.Array:
    """seq_length - 1: the mask-token slot (MTAMRec_model.py:34)."""
    return batch.seq_len - 1


def embed(params: Params, batch: Batch,
          use_pallas: bool = False) -> emb_ops.EmbeddedBatch:
    return emb_ops.behavior_embedding(params["embedding"], batch,
                                      use_pallas=use_pallas)


def l2_of_lookups(embedded: emb_ops.EmbeddedBatch, valid: jax.Array) -> jax.Array:
    """tf.nn.l2_loss over the looked-up item/category/position/user
    embeddings (base_model.py:302-307) — a SUM over the batch, so padded
    filler rows are zeroed via ``valid``."""
    v_seq = valid[:, None, None]
    v_row = valid[:, None]
    return 0.5 * (jnp.sum(jnp.square(embedded.item_emb) * v_seq)
                  + jnp.sum(jnp.square(embedded.cat_emb) * v_seq)
                  + jnp.sum(jnp.square(embedded.pos_emb) * v_seq)
                  + jnp.sum(jnp.square(embedded.user_emb) * v_row))


def project_concat(params: Params, predict_emb: jax.Array) -> jax.Array:
    """output_w projection for the concat-output family (base_model.py:340-345)."""
    return jnp.matmul(predict_emb, params["output_w"],
                      preferred_element_type=predict_emb.dtype)


NEG_FILL = -(2.0 ** 32) + 1.0  # reference key-mask fill (multihead_attention.py:131)


def item_logits(params: Params, predict_emb: jax.Array, output_mode: str,
                valid_vocab: Optional[int] = None) -> jax.Array:
    """Full-catalog logits against the shared item table.

    ``valid_vocab`` is the logical vocab (item_count+3); when the table is
    physically padded for sharding/lane alignment (ops/embedding.pad_vocab)
    the padded columns are masked so they can never win a rank or absorb
    softmax mass."""
    if output_mode == "concat":
        predict_emb = project_concat(params, predict_emb)
    table = params["embedding"]["item_table"]
    logits = jnp.matmul(predict_emb, table.T,
                        preferred_element_type=predict_emb.dtype)
    if valid_vocab is not None and valid_vocab < table.shape[0]:
        col = jnp.arange(table.shape[0])[None, :]
        logits = jnp.where(col < valid_vocab, logits, NEG_FILL)
    return logits


def softmax_ce_loss(params: Params, out: ModelOutput, batch: Batch,
                    cfg: ModelConfig, output_mode: str,
                    valid_vocab: Optional[int] = None) -> Dict[str, jax.Array]:
    """output() / output_concat() (base_model.py:300-357): full-softmax
    cross-entropy on the target item + scaled L2."""
    logits = item_logits(params, out.predict_emb, output_mode, valid_vocab)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, batch.target_id[:, None], axis=1)[:, 0]
    n_valid = jnp.maximum(jnp.sum(batch.valid), 1.0)
    ce_mean = jnp.sum(ce * batch.valid) / n_valid
    l2 = l2_of_lookups(out.embedded, batch.valid)
    loss = cfg.regulation_rate * l2 + ce_mean
    return {"loss": loss, "ce": ce_mean, "l2": l2}


def bpr_loss(params: Params, out: ModelOutput, batch: Batch,
             cfg: ModelConfig, rng: Optional[jax.Array],
             valid_vocab: Optional[int] = None) -> Dict[str, jax.Array]:
    """BPRMF loss (Model/BPRMF.py:41-61): ONE shared random negative per
    step (tf.random_uniform([1]) at :43), item bias table, L2 on the
    user/pos/neg embeddings, 5e-5 regularization."""
    item_table = params["embedding"]["item_table"]
    item_bias = params["item_bias"]
    vocab = valid_vocab if valid_vocab is not None else item_table.shape[0]
    item_count = vocab - 3
    neg_id = jax.random.randint(rng, (1,), 0, item_count)
    u = out.embedded.user_emb
    pos = jnp.take(item_table, batch.target_id, axis=0)
    neg = jnp.take(item_table, neg_id, axis=0)
    pos_b = jnp.take(item_bias, batch.target_id, axis=0)[:, 0]
    neg_b = jnp.take(item_bias, neg_id, axis=0)[:, 0]
    x = pos_b - neg_b + jnp.sum(u * (pos - neg), axis=1)
    l2 = 0.5 * (jnp.sum(jnp.square(u) * batch.valid[:, None])
                + jnp.sum(jnp.square(pos) * batch.valid[:, None])
                + jnp.sum(jnp.square(neg)))
    n_valid = jnp.maximum(jnp.sum(batch.valid), 1.0)
    # DIVERGENCE (documented in README): the reference computes
    # tf.log(tf.sigmoid(x)) (BPRMF.py:57), which underflows to -inf for
    # x <~ -88; log_sigmoid is the numerically exact same function and
    # keeps a legitimate run from tripping the non-finite-loss guard.
    rank_term = jnp.sum(jax.nn.log_sigmoid(x) * batch.valid) / n_valid
    loss = 5e-5 * l2 - rank_term
    return {"loss": loss, "ce": -rank_term, "l2": l2}


def cast_floats(tree: Any, dtype) -> Any:
    """Cast floating leaves of a pytree (mixed-precision helper)."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def _apply_trace_knobs(cfg: ModelConfig) -> None:
    """Trace-time op knobs that would otherwise need threading through
    every model signature."""
    from mtamrecommender_tpu.ops import time_gru
    from mtamrecommender_tpu.ops.pallas import flags as pallas_flags
    time_gru.set_scan_unroll(cfg.scan_unroll)
    pallas_flags.set_scope(cfg.pallas_scope)
    emb_ops.set_grad_mode(cfg.embedding_grad_mode)


def _compute_cast(cfg: ModelConfig, params: Params, batch: Batch):
    """bfloat16 compute path: fp32 master params, bf16 activations and
    matmuls (MXU-native), fp32 loss/softmax.  The reference is fp32-only
    (TF 1.14); this is a TPU-native addition behind
    ModelConfig.compute_dtype."""
    if cfg.compute_dtype == "bfloat16":
        return cast_floats(params, jnp.bfloat16), \
            cast_floats(batch, jnp.bfloat16)
    return params, batch


def compute_loss(model: ModelDef, params: Params, cfg: ModelConfig,
                 batch: Batch, train: bool, rng: Optional[jax.Array],
                 valid_vocab: Optional[int] = None) -> Dict[str, jax.Array]:
    apply_rng, loss_rng = (jax.random.split(rng) if rng is not None
                           else (None, None))
    _apply_trace_knobs(cfg)
    params_c, batch_c = _compute_cast(cfg, params, batch)
    out = model.apply(params_c, cfg, batch_c, train=train, rng=apply_rng)
    if cfg.compute_dtype == "bfloat16":
        # loss math in fp32: upcast predictions, lookups and the logits
        # table; batch.valid/targets come from the ORIGINAL batch
        out = ModelOutput(out.predict_emb.astype(jnp.float32),
                          cast_floats(out.embedded, jnp.float32))
        params_loss = dict(params_c)
        params_loss["embedding"] = cast_floats(params_c["embedding"],
                                                jnp.float32)
        if "output_w" in params_loss:
            params_loss["output_w"] = params_loss["output_w"].astype(
                jnp.float32)
    else:
        params_loss = params
    if model.output_mode == "bpr":
        return bpr_loss(params_loss, out, batch, cfg, loss_rng, valid_vocab)
    return softmax_ce_loss(params_loss, out, batch, cfg, model.output_mode,
                           valid_vocab)


def scores_for_eval(model: ModelDef, params: Params, cfg: ModelConfig,
                    batch: Batch, valid_vocab: Optional[int] = None
                    ) -> jax.Array:
    """Full-catalog ranking scores (metrics_topK / metrics_topK_concat)."""
    _apply_trace_knobs(cfg)
    params_c, batch_c = _compute_cast(cfg, params, batch)
    out = model.apply(params_c, cfg, batch_c, train=False, rng=None)
    mode = "concat" if model.output_mode == "concat" else "plain"
    predict = out.predict_emb.astype(jnp.float32)
    params_s = params
    if cfg.compute_dtype == "bfloat16":
        params_s = dict(params_c)
        params_s["embedding"] = cast_floats(params_c["embedding"],
                                             jnp.float32)
        if "output_w" in params_s:
            params_s["output_w"] = params_s["output_w"].astype(jnp.float32)
    return item_logits(params_s, predict, mode, valid_vocab)

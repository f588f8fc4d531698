"""Full-catalog top-K evaluation: HR@k (recall) and NDCG@k.

Vectorized port of `metrics_topK` + `calculate_topK`
(`/root/reference/Model/base_model.py:188-242`): rank the target item
against the entire catalog (predict_emb @ item_table^T, no sampled
negatives), HR@k = P(rank < k), NDCG@k = log 2 / log(rank+2) for hits.
Rank ties break toward the lower item index, matching tf.nn.top_k's
ordering.  Per-batch means are then averaged across batches with equal
weight, as the reference's eval loop does (train_process.py:237-277).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterable, Sequence, Tuple

import jax
import jax.numpy as jnp

from mtamrecommender_tpu.config import ModelConfig
from mtamrecommender_tpu.models.base import ModelDef, scores_for_eval
from mtamrecommender_tpu.types import Batch

TOPK: Tuple[int, ...] = (1, 5, 10, 30, 50)


def ranks_from_scores(scores: jax.Array, targets: jax.Array) -> jax.Array:
    """0-based rank of the target under descending score, ties broken by
    lower index first (tf.nn.top_k order)."""
    target_score = jnp.take_along_axis(scores, targets[:, None], axis=1)
    greater = jnp.sum(scores > target_score, axis=1)
    idx = jnp.arange(scores.shape[1])[None, :]
    tie_before = jnp.sum((scores == target_score) & (idx < targets[:, None]),
                         axis=1)
    return greater + tie_before


def topk_metrics(scores: jax.Array, targets: jax.Array, valid: jax.Array,
                 ks: Sequence[int] = TOPK) -> Dict[str, jax.Array]:
    rank = ranks_from_scores(scores, targets)
    n = jnp.maximum(jnp.sum(valid), 1.0)
    out: Dict[str, jax.Array] = {}
    for k in ks:
        hit = (rank < k).astype(jnp.float32) * valid
        out[f"hr@{k}"] = jnp.sum(hit) / n
        ndcg = jnp.where(rank < k,
                         jnp.log(2.0) / jnp.log(rank.astype(jnp.float32) + 2.0),
                         0.0) * valid
        out[f"ndcg@{k}"] = jnp.sum(ndcg) / n
    return out


def auc(scores: jax.Array, targets: jax.Array, valid: jax.Array,
        rng: jax.Array, num_negatives: int = 1) -> jax.Array:
    """Pairwise AUC against sampled negatives — the reference's disabled
    AUC path (Model/base_model.py:171-182, train_process.py:114-130)
    made usable: P(score[target] > score[random negative])."""
    b, v = scores.shape
    neg = jax.random.randint(rng, (b, num_negatives), 0, v)
    pos_s = jnp.take_along_axis(scores, targets[:, None], axis=1)
    neg_s = jnp.take_along_axis(scores, neg, axis=1)
    wins = (pos_s > neg_s).astype(jnp.float32) \
        + 0.5 * (pos_s == neg_s).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(jnp.mean(wins, axis=1) * valid) / n


def make_eval_step(model: ModelDef, cfg: ModelConfig,
                   ks: Sequence[int] = TOPK, valid_vocab: int = None):
    """One jit-compiled eval step: batch -> per-batch metric dict."""

    @jax.jit
    def eval_step(params, batch: Batch) -> Dict[str, jax.Array]:
        scores = scores_for_eval(model, params, cfg, batch, valid_vocab)
        return topk_metrics(scores, batch.target_id, batch.valid, ks)

    return eval_step


def evaluate_dataset(eval_step, params, batches: Iterable[Tuple[int, Batch]]
                     ) -> Dict[str, float]:
    """Average per-batch metrics across batches (equal weight per batch,
    mirroring train_process.py:268-277)."""
    sums: Dict[str, float] = {}
    n_batches = 0
    for _, batch in batches:
        metrics = eval_step(params, batch)
        n_batches += 1
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(v)
    if n_batches == 0:
        return {}
    return {k: v / n_batches for k, v in sums.items()}

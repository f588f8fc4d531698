"""Self-attention baselines: SASRec, time-aware SA, TiSASRec.

Port of `/root/reference/Model/attention_baseline_models.py`.  These
gather at mask_index (== seq_len - 1, the mask-token slot), unlike the
RNN family which gathers at mask_index - 1.
"""

from __future__ import annotations

import jax

from mtamrecommender_tpu.models import base
from mtamrecommender_tpu.ops import attention, layers
from mtamrecommender_tpu.ops.embedding import init_behavior_embedding


def _init(rng, cfg, meta, kind):
    d = cfg.num_units
    ke, ka = jax.random.split(rng)
    return {
        "embedding": init_behavior_embedding(ke, meta, d, vocab_pad_multiple=cfg.vocab_pad_multiple),
        "att": attention.init_attention_stack(
            ka, cfg.num_blocks, d, kind=kind,
            t_q_len=meta.max_seq_len, t_k_len=meta.max_seq_len,
            gate_mode=cfg.time_gate_mode),
        "ln_out": layers.init_layer_norm(d),
    }


def _apply(params, cfg, batch, kind, train, rng):
    e = base.embed(params, batch, cfg.use_pallas)
    enc, _ = attention.self_attention_stack(
        params["att"], e.behavior_emb, key_len=batch.seq_len,
        query_len=batch.seq_len, kind=kind, num_heads=cfg.num_heads,
        dropout_rate=cfg.dropout, train=train, rng=rng,
        t_queries=batch.times, t_keys=batch.times,
        use_pallas=cfg.use_pallas)
    pred = layers.gather_positions(enc, batch.seq_len - 1)
    return base.ModelOutput(layers.layer_norm(params["ln_out"], pred), e)


def init_sasrec(rng, cfg, meta):
    return _init(rng, cfg, meta, "plain")


def apply_sasrec(params, cfg, batch, *, train, rng):
    """Self_Attention_Model (attention_baseline_models.py:33-46)."""
    return _apply(params, cfg, batch, "plain", train, rng)


def init_time_aware_sa(rng, cfg, meta):
    return _init(rng, cfg, meta, "time")


def apply_time_aware_sa(params, cfg, batch, *, train, rng):
    """Time_Aware_Self_Attention_Model (attention_baseline_models.py:47-65):
    multiplicative decay-gated self-attention (PISTRec-style encoder)."""
    return _apply(params, cfg, batch, "time", train, rng)


def init_tisas(rng, cfg, meta):
    return _init(rng, cfg, meta, "tisas")


def apply_tisas(params, cfg, batch, *, train, rng):
    """Ti_Self_Attention_Model / TiSASRec (attention_baseline_models.py:66-84):
    additive log-interval attention bias."""
    return _apply(params, cfg, batch, "tisas", train, rng)

"""MTAM and its ablation family.

Port of `/root/reference/Model/MTAMRec_model.py` (8 model classes).  All
share: a short-term-intent encoder (some GRU variant over the behavior
sequence), a gather at the last valid history position, and a multi-hop
(num_blocks) single-query attention readout over a memory.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mtamrecommender_tpu.config import ModelConfig
from mtamrecommender_tpu.models import base
from mtamrecommender_tpu.ops import attention, layers, time_gru
from mtamrecommender_tpu.ops.embedding import init_behavior_embedding
from mtamrecommender_tpu.types import Batch, DatasetMeta

Params = Dict[str, Any]


def _init_common(rng: jax.Array, cfg: ModelConfig, meta: DatasetMeta,
                 *, rnn: Optional[str], att_kind: Optional[str],
                 concat_output: bool = False) -> Params:
    d = cfg.num_units
    ke, kr, ka, kw = jax.random.split(rng, 4)
    params: Params = {"embedding": init_behavior_embedding(ke, meta, d, vocab_pad_multiple=cfg.vocab_pad_multiple),
                      "ln_out": layers.init_layer_norm(d)}
    if rnn == "plain":
        params["rnn"] = time_gru.init_gru(kr, d, d)
    elif rnn is not None:
        params["rnn"] = time_gru.init_time_aware_gru(kr, rnn, d, d)
    if att_kind is not None:
        params["att"] = attention.init_attention_stack(
            ka, cfg.num_blocks, d, kind=att_kind,
            t_q_len=1, t_k_len=meta.max_seq_len,
            gate_mode=cfg.time_gate_mode)
    if concat_output:
        params["output_w"] = jax.random.uniform(
            kw, (2 * d, d), jnp.float32,
            minval=-(6.0 / (3 * d)) ** 0.5, maxval=(6.0 / (3 * d)) ** 0.5)
    return params


def _intent(params: Params, cfg: ModelConfig, batch: Batch,
            embedded, rnn: str) -> jax.Array:
    """Short-term intent: GRU over the behavior sequence, gathered at
    mask_index - 1 (MTAMRec_model.py:67-80).  input_length = seq_len - 1
    (the history without the mask slot)."""
    lengths = batch.seq_len - 1
    if rnn == "plain":
        out = time_gru.gru_net(params["rnn"], embedded.behavior_emb, lengths,
                               use_pallas=cfg.use_pallas)
    else:
        out = time_gru.time_aware_gru_net(
            params["rnn"], rnn, embedded.behavior_emb, batch.time_last,
            batch.time_now, lengths, use_pallas=cfg.use_pallas)
    intent = layers.gather_positions(out, batch.seq_len - 2)
    return out, intent


def _readout(params: Params, cfg: ModelConfig, batch: Batch, memory,
             intent, att_kind: str, train: bool,
             rng: Optional[jax.Array], num_blocks: Optional[int] = None,
             num_heads: Optional[int] = None) -> jax.Array:
    """Multi-hop single-query attention over the memory
    (NextItemDecoder, MTAMRec_model.py:84-91)."""
    blocks = params["att"][:num_blocks] if num_blocks else params["att"]
    dec = intent[:, None, :]
    ones = jnp.ones_like(batch.seq_len)
    return attention.vanilla_attention_stack(
        blocks, memory, dec, key_len=batch.seq_len, query_len=ones,
        kind=att_kind, num_heads=num_heads or cfg.num_heads,
        dropout_rate=cfg.dropout, train=train, rng=rng,
        t_queries=batch.target_time[:, None], t_keys=batch.times,
        use_pallas=cfg.use_pallas)


# ------------------------------------------------------------ the family

def init_mtam(rng, cfg, meta):
    return _init_common(rng, cfg, meta, rnn="new", att_kind="time")


def apply_mtam(params, cfg, batch, *, train, rng):
    """MTAM (MTAMRec_model.py:61-92): T-GRU intent -> time-aware
    multi-hop attention over raw behavior embeddings -> layer norm."""
    e = base.embed(params, batch, cfg.use_pallas)
    _, intent = _intent(params, cfg, batch, e, "new")
    hybrid = _readout(params, cfg, batch, e.behavior_emb, intent, "time",
                      train, rng)
    pred = layers.layer_norm(params["ln_out"], hybrid)
    return base.ModelOutput(pred, e)


def init_t_gru(rng, cfg, meta):
    return _init_common(rng, cfg, meta, rnn="T-SeqRec", att_kind=None)


def apply_t_gru(params, cfg, batch, *, train, rng):
    """MTAM_only_time_aware_RNN (MTAMRec_model.py:40-59)."""
    e = base.embed(params, batch, cfg.use_pallas)
    _, intent = _intent(params, cfg, batch, e, "T-SeqRec")
    pred = layers.layer_norm(params["ln_out"], intent)
    return base.ModelOutput(pred, e)


def init_mtam_no_time_rnn(rng, cfg, meta):
    return _init_common(rng, cfg, meta, rnn="plain", att_kind="time")


def apply_mtam_no_time_rnn(params, cfg, batch, *, train, rng):
    """MTAM_no_time_aware_rnn (MTAMRec_model.py:93-127)."""
    e = base.embed(params, batch, cfg.use_pallas)
    _, intent = _intent(params, cfg, batch, e, "plain")
    hybrid = _readout(params, cfg, batch, e.behavior_emb, intent, "time",
                      train, rng)
    pred = layers.layer_norm(params["ln_out"], hybrid)
    return base.ModelOutput(pred, e)


def init_mtam_no_time_att(rng, cfg, meta):
    return _init_common(rng, cfg, meta, rnn="new", att_kind="plain")


def apply_mtam_no_time_att(params, cfg, batch, *, train, rng):
    """MTAM_no_time_aware_att (MTAMRec_model.py:128-164).  NOTE the
    reference does NOT layer-norm the readout here (:158)."""
    e = base.embed(params, batch, cfg.use_pallas)
    _, intent = _intent(params, cfg, batch, e, "new")
    hybrid = _readout(params, cfg, batch, e.behavior_emb, intent, "plain",
                      train, rng)
    return base.ModelOutput(hybrid, e)


def _init_via(rng, cfg, meta, rnn):
    params = _init_common(rng, cfg, meta, rnn=rnn, att_kind="time")
    params["ln_intent"] = layers.init_layer_norm(cfg.num_units)
    return params


def init_mtam_via_t_gru(rng, cfg, meta):
    return _init_via(rng, cfg, meta, "new")


def apply_mtam_via_t_gru(params, cfg, batch, *, train, rng):
    """MTAM_via_T_GRU (MTAMRec_model.py:167-205): memory = T-GRU hidden
    states; intent layer-normed before attention."""
    e = base.embed(params, batch, cfg.use_pallas)
    states, intent = _intent(params, cfg, batch, e, "new")
    intent = layers.layer_norm(params["ln_intent"], intent)
    hybrid = _readout(params, cfg, batch, states, intent, "time", train, rng)
    pred = layers.layer_norm(params["ln_out"], hybrid)
    return base.ModelOutput(pred, e)


def init_mtam_via_rnn(rng, cfg, meta):
    return _init_via(rng, cfg, meta, "plain")


def apply_mtam_via_rnn(params, cfg, batch, *, train, rng):
    """MTAM_via_rnn (MTAMRec_model.py:206-239): memory = plain-GRU states."""
    e = base.embed(params, batch, cfg.use_pallas)
    states, intent = _intent(params, cfg, batch, e, "plain")
    intent = layers.layer_norm(params["ln_intent"], intent)
    hybrid = _readout(params, cfg, batch, states, intent, "time", train, rng)
    pred = layers.layer_norm(params["ln_out"], hybrid)
    return base.ModelOutput(pred, e)


def init_mtam_hybird(rng, cfg, meta):
    return _init_common(rng, cfg, meta, rnn="new", att_kind="time",
                        concat_output=True)


def apply_mtam_hybird(params, cfg, batch, *, train, rng):
    """MTAM_hybird (MTAMRec_model.py:240-273): concat(intent,
    ln(attention)) -> output_concat."""
    e = base.embed(params, batch, cfg.use_pallas)
    _, intent = _intent(params, cfg, batch, e, "new")
    hybrid = _readout(params, cfg, batch, e.behavior_emb, intent, "time",
                      train, rng)
    pred = jnp.concatenate(
        [intent, layers.layer_norm(params["ln_out"], hybrid)], axis=1)
    return base.ModelOutput(pred, e)


def init_mtam_with_t_seqrec(rng, cfg, meta):
    return _init_common(rng, cfg, meta, rnn="T-SeqRec", att_kind="time")


def apply_mtam_with_t_seqrec(params, cfg, batch, *, train, rng):
    """MTAM_with_T_SeqRec (MTAMRec_model.py:275-306)."""
    e = base.embed(params, batch, cfg.use_pallas)
    _, intent = _intent(params, cfg, batch, e, "T-SeqRec")
    hybrid = _readout(params, cfg, batch, e.behavior_emb, intent, "time",
                      train, rng)
    pred = layers.layer_norm(params["ln_out"], hybrid)
    return base.ModelOutput(pred, e)

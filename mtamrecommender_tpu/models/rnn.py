"""RNN baselines: Gru4Rec, Vallina_Gru4Rec, T_SeqRec.

Port of `/root/reference/Model/RNN_baesline_models.py`.
"""

from __future__ import annotations

import jax

from mtamrecommender_tpu.models import base
from mtamrecommender_tpu.ops import layers, time_gru
from mtamrecommender_tpu.ops.embedding import init_behavior_embedding


def _init(rng, cfg, meta, rnn):
    d = cfg.num_units
    ke, kr = jax.random.split(rng)
    params = {"embedding": init_behavior_embedding(ke, meta, d, vocab_pad_multiple=cfg.vocab_pad_multiple),
              "ln_out": layers.init_layer_norm(d)}
    if rnn == "plain":
        params["rnn"] = time_gru.init_gru(kr, d, d)
    else:
        params["rnn"] = time_gru.init_time_aware_gru(kr, rnn, d, d)
    return params


def init_gru4rec(rng, cfg, meta):
    return _init(rng, cfg, meta, "plain")


def apply_gru4rec(params, cfg, batch, *, train, rng):
    """Gru4Rec (RNN_baesline_models.py:55-70): plain GRU over the fused
    behavior embedding, last valid state, layer norm."""
    e = base.embed(params, batch, cfg.use_pallas)
    out = time_gru.gru_net(params["rnn"], e.behavior_emb, batch.seq_len - 1,
                           use_pallas=cfg.use_pallas)
    intent = layers.gather_positions(out, batch.seq_len - 2)
    return base.ModelOutput(layers.layer_norm(params["ln_out"], intent), e)


def init_vallina_gru4rec(rng, cfg, meta):
    return _init(rng, cfg, meta, "plain")


def apply_vallina_gru4rec(params, cfg, batch, *, train, rng):
    """Vallina_Gru4Rec (RNN_baesline_models.py:72-87): GRU over the raw
    item embeddings only."""
    e = base.embed(params, batch, cfg.use_pallas)
    out = time_gru.gru_net(params["rnn"], e.item_emb, batch.seq_len - 1,
                           use_pallas=cfg.use_pallas)
    intent = layers.gather_positions(out, batch.seq_len - 2)
    return base.ModelOutput(layers.layer_norm(params["ln_out"], intent), e)


def init_t_seqrec(rng, cfg, meta):
    return _init(rng, cfg, meta, "T-SeqRec")


def apply_t_seqrec(params, cfg, batch, *, train, rng):
    """T_SeqRec (RNN_baesline_models.py:33-53): SLi-Rec style time-aware
    GRU over [behavior_emb ; timelast ; timenow]."""
    e = base.embed(params, batch, cfg.use_pallas)
    out = time_gru.tseqrec_net(params["rnn"], e.behavior_emb,
                               batch.time_last, batch.time_now,
                               batch.seq_len - 1,
                               use_pallas=cfg.use_pallas)
    intent = layers.gather_positions(out, batch.seq_len - 2)
    return base.ModelOutput(layers.layer_norm(params["ln_out"], intent), e)

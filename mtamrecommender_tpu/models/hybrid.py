"""Hybrid baselines: NARM family, LSTUR family, STAMP.

Port of `/root/reference/Model/hybird_baseline_models.py`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from mtamrecommender_tpu.config import ModelConfig
from mtamrecommender_tpu.models import base
from mtamrecommender_tpu.ops import attention, initializers as init, layers, time_gru
from mtamrecommender_tpu.ops.embedding import init_behavior_embedding
from mtamrecommender_tpu.types import Batch, DatasetMeta

Params = Dict[str, Any]


# ---------------------------------------------------------------- NARM family

def _init_narm(rng, cfg, meta, *, rnn: str, att_kind: str) -> Params:
    d = cfg.num_units
    ke, kr, ka, kw = jax.random.split(rng, 4)
    params: Params = {
        "embedding": init_behavior_embedding(ke, meta, d, vocab_pad_multiple=cfg.vocab_pad_multiple),
        "ln_intent": layers.init_layer_norm(d),
        "ln_out": layers.init_layer_norm(2 * d),
        # NARM runs exactly 1 block / 1 head (hybird_baseline_models.py:99,129,159)
        "att": attention.init_attention_stack(
            ka, 1, d, kind=att_kind, t_q_len=1, t_k_len=meta.max_seq_len,
            gate_mode=cfg.time_gate_mode),
        "output_w": init.glorot_uniform(kw, (2 * d, d)),
    }
    if rnn == "plain":
        params["rnn"] = time_gru.init_gru(kr, d, d)
    else:
        params["rnn"] = time_gru.init_time_aware_gru(kr, rnn, d, d)
    return params


def _apply_narm(params, cfg, batch, *, rnn: str, att_kind: str, train, rng):
    e = base.embed(params, batch, cfg.use_pallas)
    lengths = batch.seq_len - 1
    if rnn == "plain":
        states = time_gru.gru_net(params["rnn"], e.behavior_emb, lengths,
                                  use_pallas=cfg.use_pallas)
    else:
        states = time_gru.time_aware_gru_net(
            params["rnn"], rnn, e.behavior_emb, batch.time_last,
            batch.time_now, lengths, use_pallas=cfg.use_pallas)
    intent = layers.layer_norm(params["ln_intent"],
                               layers.gather_positions(states, batch.seq_len - 2))
    ones = jnp.ones_like(batch.seq_len)
    hybrid = attention.vanilla_attention_stack(
        params["att"], states, intent[:, None, :], key_len=batch.seq_len,
        query_len=ones, kind=att_kind, num_heads=1,
        dropout_rate=cfg.dropout, train=train, rng=rng,
        t_queries=batch.target_time[:, None], t_keys=batch.times,
        use_pallas=cfg.use_pallas)
    pred = layers.layer_norm(params["ln_out"],
                             jnp.concatenate([intent, hybrid], axis=1))
    return base.ModelOutput(pred, e)


def init_narm(rng, cfg, meta):
    return _init_narm(rng, cfg, meta, rnn="plain", att_kind="plain")


def apply_narm(params, cfg, batch, *, train, rng):
    """NARM (hybird_baseline_models.py:137-164): GRU encoder, plain
    1-block cross attention, concat -> output_concat."""
    return _apply_narm(params, cfg, batch, rnn="plain", att_kind="plain",
                       train=train, rng=rng)


def init_narm_time_att(rng, cfg, meta):
    return _init_narm(rng, cfg, meta, rnn="plain", att_kind="time")


def apply_narm_time_att(params, cfg, batch, *, train, rng):
    """NARM+ (hybird_baseline_models.py:107-136): time-aware attention."""
    return _apply_narm(params, cfg, batch, rnn="plain", att_kind="time",
                       train=train, rng=rng)


def init_narm_time_att_time_rnn(rng, cfg, meta):
    return _init_narm(rng, cfg, meta, rnn="new", att_kind="time")


def apply_narm_time_att_time_rnn(params, cfg, batch, *, train, rng):
    """NARM++ (hybird_baseline_models.py:73-106): T-GRU encoder +
    time-aware attention."""
    return _apply_narm(params, cfg, batch, rnn="new", att_kind="time",
                       train=train, rng=rng)


# ---------------------------------------------------------------- LSTUR family

def init_lstur(rng, cfg, meta):
    d = cfg.num_units
    ke, kr = jax.random.split(rng)
    return {"embedding": init_behavior_embedding(ke, meta, d, vocab_pad_multiple=cfg.vocab_pad_multiple),
            "rnn": time_gru.init_gru(kr, d, d),
            "ln_out": layers.init_layer_norm(d)}


def apply_lstur(params, cfg, batch, *, train, rng):
    """LSTUR (hybird_baseline_models.py:40-54): GRU seeded with the user
    embedding as initial state."""
    e = base.embed(params, batch, cfg.use_pallas)
    out = time_gru.gru_net(params["rnn"], e.behavior_emb, batch.seq_len - 1,
                           initial_state=e.user_emb,
                           use_pallas=cfg.use_pallas)
    intent = layers.gather_positions(out, batch.seq_len - 2)
    return base.ModelOutput(layers.layer_norm(params["ln_out"], intent), e)


def init_lstur_time_rnn(rng, cfg, meta):
    d = cfg.num_units
    ke, kr = jax.random.split(rng)
    # input_dim = d-2: see apply_lstur_time_rnn docstring
    return {"embedding": init_behavior_embedding(ke, meta, d, vocab_pad_multiple=cfg.vocab_pad_multiple),
            "rnn": time_gru.init_tseqrec(kr, d - 2, d),
            "ln_out": layers.init_layer_norm(d)}


def apply_lstur_time_rnn(params, cfg, batch, *, train, rng):
    """LSTUR_time_rnn (hybird_baseline_models.py:55-72).

    Faithfulness note: the reference feeds the PLAIN behavior embedding
    (not the [emb;timelast;timenow] concat) into the T-SeqRec cell, whose
    call() strips the last two input dims as 'time scores'
    (time_aware_rnn.py:73-75).  The cell therefore consumes behavior dims
    0..d-3 as content and dims d-2/d-1 as the time signals.  We reproduce
    that behavior exactly rather than 'fixing' it.
    """
    e = base.embed(params, batch, cfg.use_pallas)
    content = e.behavior_emb[:, :, :-2]
    t_last = e.behavior_emb[:, :, -2]
    t_now = e.behavior_emb[:, :, -1]
    out = time_gru.tseqrec_net(params["rnn"], content, t_last, t_now,
                               batch.seq_len - 1, initial_state=e.user_emb,
                               use_pallas=cfg.use_pallas)
    intent = layers.gather_positions(out, batch.seq_len - 2)
    return base.ModelOutput(layers.layer_norm(params["ln_out"], intent), e)


# ---------------------------------------------------------------- STAMP

def init_stamp(rng, cfg, meta):
    d = cfg.num_units
    ks = jax.random.split(rng, 8)
    return {
        "embedding": init_behavior_embedding(ks[0], meta, d, vocab_pad_multiple=cfg.vocab_pad_multiple),
        "att_w0": init.glorot_uniform(ks[1], (d, 1)),
        "att_w1": init.glorot_uniform(ks[2], (d, d)),
        "att_w2": init.glorot_uniform(ks[3], (d, d)),
        "att_w3": init.glorot_uniform(ks[4], (d, d)),
        "mlp_a": layers.init_dense(ks[5], d, d, use_bias=False),
        "mlp_b": layers.init_dense(ks[6], d, d, use_bias=False),
        "ln_mem": layers.init_layer_norm(d),
        "ln_out": layers.init_layer_norm(d),
    }


def apply_stamp(params, cfg, batch, *, train, rng):
    """STAMP (hybird_baseline_models.py:165-213): tri-linear attention over
    history with external-memory (sum) and last-click signals, two MLP
    cells, elementwise product.

    Divergence note: the reference's `ms = tf.matmul(att, user_history)`
    followed by `reduce_sum(ms, 1)` only type-checks if `att` is treated
    as [B,1,T]; we implement that evident intent as a weighted sum over
    time (einsum('bt,btd->bd')).  `att_b` is declared but unused in the
    reference's live path (:193-195); we match.
    """
    e = base.embed(params, batch, cfg.use_pallas)
    history = e.behavior_emb
    external_memory = layers.layer_norm(params["ln_mem"],
                                        jnp.sum(history, axis=1))
    last_click = layers.gather_positions(history, batch.seq_len - 2)
    a_hist = jnp.einsum("btd,de->bte", history, params["att_w1"])
    a_mem = jnp.matmul(external_memory, params["att_w2"])
    a_last = jnp.matmul(last_click, params["att_w3"])
    att = jax.nn.sigmoid(a_hist + a_mem[:, None, :] + a_last[:, None, :])
    att = jnp.einsum("btd,do->bt", att, params["att_w0"])
    ms = jnp.einsum("bt,btd->bd", att, history)
    hs = layers.dense(params["mlp_a"], ms, jax.nn.relu)
    ht = layers.dense(params["mlp_b"], last_click, jax.nn.relu)
    pred = layers.layer_norm(params["ln_out"], hs * ht)
    return base.ModelOutput(pred, e)

"""PISTRec family: time-aware self-attention encoder + long/short/hybrid
switch network.

Port of `/root/reference/Model/PISTRec_model.py`.  The reference file is
partially bit-rotted (its `PISTRec_type` flag is undefined in the config
and two classes call `time_aware_gru_net` without the required `type`
argument — SURVEY.md section 2.4); we implement the evident design:

  * long-term preference  = time-aware self-attention over history,
    gathered at the mask position;
  * short-term intent     = time-aware GRU (T-SeqRec cell, the default of
    the reference's `build_time_aware_gru_cell`, gru.py:89-100) gathered
    at mask-1;
  * hybrid preference     = single-query time-aware cross attention from
    the intent over the self-attended history;
  * switch gate z         = softmax(dense_3(concat(long, short, hybrid)))
    combining the branches per `pistrec_type`
    (hard|soft|short|long|hybird, PISTRec_model.py:149-177).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mtamrecommender_tpu.models import base
from mtamrecommender_tpu.ops import attention, layers, time_gru
from mtamrecommender_tpu.ops.embedding import init_behavior_embedding


def init_pistrec(rng, cfg, meta):
    d = cfg.num_units
    ks = jax.random.split(rng, 5)
    return {
        "embedding": init_behavior_embedding(ks[0], meta, d, vocab_pad_multiple=cfg.vocab_pad_multiple),
        "self_att": attention.init_attention_stack(
            ks[1], cfg.num_blocks, d, kind="time",
            t_q_len=meta.max_seq_len, t_k_len=meta.max_seq_len,
            gate_mode=cfg.time_gate_mode),
        "rnn": time_gru.init_tseqrec(ks[2], d, d),
        "cross_att": attention.init_attention_stack(
            ks[3], cfg.num_blocks, d, kind="time", t_q_len=1,
            t_k_len=meta.max_seq_len, gate_mode=cfg.time_gate_mode),
        "switch": layers.init_dense(ks[4], 3 * d, 3),
        "ln_out": layers.init_layer_norm(d),
    }


def apply_pistrec(params, cfg, batch, *, train, rng):
    e = base.embed(params, batch, cfg.use_pallas)
    enc, _ = attention.self_attention_stack(
        params["self_att"], e.behavior_emb, key_len=batch.seq_len,
        query_len=batch.seq_len, kind="time", num_heads=cfg.num_heads,
        dropout_rate=cfg.dropout, train=train, rng=rng,
        t_queries=batch.times, t_keys=batch.times,
        use_pallas=cfg.use_pallas)
    long_term = layers.gather_positions(enc, batch.seq_len - 1)

    states = time_gru.tseqrec_net(params["rnn"], e.behavior_emb,
                                  batch.time_last, batch.time_now,
                                  batch.seq_len - 1,
                                  use_pallas=cfg.use_pallas)
    short_term = layers.gather_positions(states, batch.seq_len - 2)

    ones = jnp.ones_like(batch.seq_len)
    hybrid = attention.vanilla_attention_stack(
        params["cross_att"], enc, short_term[:, None, :],
        key_len=batch.seq_len, query_len=ones, kind="time",
        num_heads=cfg.num_heads, dropout_rate=cfg.dropout, train=train,
        rng=rng, t_queries=batch.target_time[:, None], t_keys=batch.times,
        use_pallas=cfg.use_pallas)

    z = jax.nn.softmax(layers.dense(
        params["switch"], jnp.concatenate([long_term, short_term, hybrid], 1)))
    kind = cfg.pistrec_type
    if kind == "soft":
        pred = (z[:, 0:1] * long_term + z[:, 1:2] * short_term
                + z[:, 2:3] * hybrid)
    elif kind == "hard":
        # per-row argmax selection (the reference's python-if on a tensor
        # at PISTRec_model.py:158-164 never type-checked; this is the intent)
        choice = jnp.argmax(z, axis=1)
        stacked = jnp.stack([long_term, short_term, hybrid], axis=1)
        pred = jnp.take_along_axis(stacked, choice[:, None, None], axis=1)[:, 0]
    elif kind == "short":
        pred = short_term
    elif kind == "long":
        pred = long_term
    elif kind == "hybird":
        pred = hybrid
    else:
        raise ValueError(f"unknown pistrec_type {kind!r}")
    return base.ModelOutput(layers.layer_norm(params["ln_out"], pred), e)

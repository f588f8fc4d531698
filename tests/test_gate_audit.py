"""Numerical audit of the MTAM decay gate (VERDICT.md r2 item 1).

`_reference_time_attention_np` is a LITERAL numpy transcription of the
reference TF-1.14 graph `/root/reference/Model/Modules/
time_aware_attention.py:215-456` — every step follows the tf op sequence
(dense+relu projections :249-253, content-time kernel :320-323, stacked
Δt + log decay :330-343, combined gate :350, head split/concat :365-371,
multiplicative sigmoid gate :380-381, scale :384, −2³² key fill :391-397,
softmax :402, query-mask multiply :429-433, weighted sum :442, head
restore :446, residual :451, layer-norm eps 1e-8 :7-45) — written
independently of ops/attention.py so agreement between the two is
evidence the port is faithful, not a tautology.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtamrecommender_tpu.ops import attention as att


def _np_dense_relu(p, x):
    # tf.layers.dense(x, units, activation=tf.nn.relu): x @ W + b, relu
    return np.maximum(x @ np.asarray(p["w"]) + np.asarray(p["b"]), 0.0)


def _np_sequence_mask(lengths, maxlen):
    # tf.sequence_mask semantics: True where j < length
    return np.arange(maxlen)[None, :] < np.asarray(lengths)[:, None]


def _reference_time_attention_np(params, queries, keys, key_len, query_len,
                                 t_q, t_k, num_heads):
    p = {k: np.asarray(v) for k, v in params.items()
         if not isinstance(v, dict)}
    B, Tq, C = queries.shape
    Tk = keys.shape[1]
    # :249-253 — relu projections
    Q = _np_dense_relu(params["q"], queries)
    K = _np_dense_relu(params["k"], keys)
    V = _np_dense_relu(params["v"], keys)
    # :320-323 — content-time kernel on RAW queries/keys
    time_query_key = np.tanh(
        (queries @ p["time_input_w"]) @ np.transpose(keys, (0, 2, 1)))
    # :330-336 — tf.stack([t_querys]*Tk, axis=2), tf.stack([t_keys]*Tq, 1)
    tq = np.stack([t_q] * Tk, axis=2)
    tk = np.stack([t_k] * Tq, axis=1)
    # :340-343 — decay = tanh(log(|tq-tk|+1) * w1 + b1)
    decay = np.log(np.abs(tq - tk) + 1.0)
    decay = np.tanh(decay * p["time_input_w1"] + p["time_input_b1"])
    # :350 — decay_gate = w_o1*decay + w_o2*time_query_key + b_o
    decay_gate = (p["time_output_w1"] * decay
                  + p["time_output_w2"] * time_query_key
                  + p["time_output_b"])
    # :365-371 — tf.concat(tf.split(X, h, axis=2), axis=0)
    Q_ = np.concatenate(np.split(Q, num_heads, axis=2), axis=0)
    K_ = np.concatenate(np.split(K, num_heads, axis=2), axis=0)
    V_ = np.concatenate(np.split(V, num_heads, axis=2), axis=0)
    gate_ = np.concatenate([decay_gate] * num_heads, axis=0)
    # :380-384 — scores, multiplicative sigmoid gate, scale
    outputs = Q_ @ np.transpose(K_, (0, 2, 1))
    outputs = outputs * (1.0 / (1.0 + np.exp(-gate_)))
    outputs = outputs / (K_.shape[-1] ** 0.5)
    # :391-397 — key mask, −2³²+1 fill
    key_masks = np.tile(_np_sequence_mask(key_len, Tk), (num_heads, 1))
    key_masks = np.tile(key_masks[:, None, :], (1, Tq, 1))
    outputs = np.where(key_masks, outputs, -(2.0 ** 32) + 1.0)
    # :402 — softmax
    e = np.exp(outputs - outputs.max(axis=-1, keepdims=True))
    outputs = e / e.sum(axis=-1, keepdims=True)
    # :429-433 — query-mask multiply
    query_masks = np.tile(
        _np_sequence_mask(query_len, Tq).astype(np.float64), (num_heads, 1))
    outputs = outputs * query_masks[:, :, None]
    # :442-446 — weighted sum, restore heads
    outputs = outputs @ V_
    outputs = np.concatenate(np.split(outputs, num_heads, axis=0), axis=2)
    # :451 — residual
    outputs = outputs + queries
    # :456/:7-45 — self.normalize, eps 1e-8
    ln = params["ln"]
    mean = outputs.mean(axis=-1, keepdims=True)
    var = ((outputs - mean) ** 2).mean(axis=-1, keepdims=True)
    normed = (outputs - mean) / np.sqrt(var + 1e-8)
    return np.asarray(ln["gamma"]) * normed + np.asarray(ln["beta"]), \
        decay_gate


@pytest.mark.parametrize("num_heads,seed", [(1, 0), (2, 1), (1, 2)])
def test_decay_gate_matches_reference_transcription(num_heads, seed):
    B, Tq, Tk, C = 4, 6, 9, 16
    rng = jax.random.PRNGKey(seed)
    params = att.init_time_mha_block(rng, C, Tq, Tk)
    nrng = np.random.RandomState(seed)
    queries = nrng.randn(B, Tq, C).astype(np.float32)
    keys = nrng.randn(B, Tk, C).astype(np.float32)
    # hour-scale Δt, like the builder emits (minutes to weeks)
    t_q = (nrng.rand(B, Tq) * 400).astype(np.float32)
    t_k = (nrng.rand(B, Tk) * 400).astype(np.float32)
    key_len = nrng.randint(1, Tk + 1, B).astype(np.int32)
    query_len = nrng.randint(1, Tq + 1, B).astype(np.int32)

    want, want_gate = _reference_time_attention_np(
        params, queries.astype(np.float64), keys.astype(np.float64),
        key_len, query_len, t_q.astype(np.float64), t_k.astype(np.float64),
        num_heads)

    got, _ = att.time_aware_multihead_attention(
        params, jnp.asarray(queries), jnp.asarray(keys),
        jnp.asarray(key_len), jnp.asarray(query_len), jnp.asarray(t_q),
        jnp.asarray(t_k), num_heads=num_heads, dropout_rate=0.0, train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)

    # and the raw gate tensor itself (pre-sigmoid), recomputed through the
    # repo's formula path
    got_gate = (np.asarray(params["time_output_w1"])
                * np.tanh(np.log1p(np.abs(t_q[:, :, None] - t_k[:, None, :]))
                          * np.asarray(params["time_input_w1"])
                          + np.asarray(params["time_input_b1"]))
                + np.asarray(params["time_output_w2"])
                * np.tanh((queries @ np.asarray(params["time_input_w"]))
                          @ np.transpose(keys, (0, 2, 1)))
                + np.asarray(params["time_output_b"]))
    np.testing.assert_allclose(got_gate, want_gate, atol=1e-5, rtol=1e-5)


def test_decay_gate_audit_through_mtam_memory_reader():
    """The same audit through the MTAM call shape: a 1-query decoder hop
    over the history (MTAMRec_model.py:80-91 uses vanilla_attention with
    the intent as the single query)."""
    B, Tk, C = 5, 12, 16
    rng = jax.random.PRNGKey(3)
    params = att.init_time_mha_block(rng, C, 1, Tk)
    nrng = np.random.RandomState(3)
    intent = nrng.randn(B, 1, C).astype(np.float32)
    memory = nrng.randn(B, Tk, C).astype(np.float32)
    t_q = (nrng.rand(B, 1) * 300).astype(np.float32)
    t_k = (nrng.rand(B, Tk) * 300).astype(np.float32)
    key_len = nrng.randint(1, Tk + 1, B).astype(np.int32)
    query_len = np.ones(B, np.int32)

    want, _ = _reference_time_attention_np(
        params, intent.astype(np.float64), memory.astype(np.float64),
        key_len, query_len, t_q.astype(np.float64), t_k.astype(np.float64),
        num_heads=1)
    got = att.vanilla_attention_stack(
        [params], jnp.asarray(memory), jnp.asarray(intent),
        jnp.asarray(key_len), jnp.asarray(query_len), kind="time",
        num_heads=1, dropout_rate=0.0, train=False,
        t_queries=jnp.asarray(t_q), t_keys=jnp.asarray(t_k))
    np.testing.assert_allclose(np.asarray(got), want.reshape(-1, C),
                               atol=2e-5, rtol=2e-5)

"""GRU drivers and time-aware GRU cells (jnp reference path).

TPU-first re-design of `/root/reference/Model/Modules/gru.py` +
`time_aware_rnn.py`.  Instead of translating tf.nn.dynamic_rnn's
per-step cell (tiny [B,d]x[d,3d] matmuls that starve the MXU), every
input-dependent projection is hoisted out of the recurrence into one
large [B*L, d_in] x [d_in, *] matmul; the `lax.scan` body keeps only the
state-dependent matmuls.  Sequence-length masking reproduces
dynamic_rnn semantics exactly: outputs are zero past ``lengths`` and the
carried state freezes there.

Cell math:
  * plain GRU        — tf GRUCell (gate bias init 1.0)
  * T-SeqRec cell    — TimeAwareGRUCell_sigmoid (time_aware_rnn.py:19-131):
      new_h = u*h*sigmoid(time_now_state) + (1-u)*c*sigmoid(time_last_state)
  * T-GRU decay cell — TimeAwareGRUCell_decay_new (time_aware_rnn.py:135-269):
      new_h = u*h + (1-u)*c*time_last_state
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mtamrecommender_tpu.ops import initializers as init

Params = Dict[str, jax.Array]


def _pallas_gru_enabled() -> bool:
    from mtamrecommender_tpu.ops.pallas import flags
    return flags.enabled("gru")


def _pallas_gru_ok(gate_x: jax.Array) -> bool:
    """Scope enabled AND the whole-sequence forward fits the kernel's
    VMEM budget (gru_kernel.seq_supported) — at L=2048 the [L,TB,*]
    blocks exceed v5e VMEM and Mosaic fails the compile, so oversize
    sequences fall back to the jnp scan."""
    if not _pallas_gru_enabled():
        return False
    from mtamrecommender_tpu.ops.pallas import gru_kernel as gk
    return gk.seq_supported(gate_x.shape[1], gate_x.shape[2] // 2,
                            gate_x.dtype.itemsize)


def _pallas_scan(mode: str, params: Params, gate_x, cand_x, e1, e2,
                 lengths, h0):
    from mtamrecommender_tpu.ops.pallas import gru_kernel as gk
    # the kernel is dtype-polymorphic: bf16 operands feed the MXU
    # natively, the carried state accumulates in f32 inside
    units = params["b_cand"].shape[0]
    if mode == "tgru":
        vecs = jnp.stack([params["time_history_w1"], params["time_kernel_w2"],
                          params["time_w12"], params["time_b12"]])
    else:
        vecs = jnp.zeros((4, units), gate_x.dtype)
    return gk.gru_scan_vjp(mode, gate_x, cand_x, e1, e2, lengths, h0,
                           params["w_gate_h"], params["w_cand_h"],
                           params["b_gate"], params["b_cand"],
                           vecs).astype(gate_x.dtype)


# ---------------------------------------------------------------- plain GRU

def init_gru(rng: jax.Array, input_dim: int, units: int,
             dtype=jnp.float32) -> Params:
    kg, kc = jax.random.split(rng)
    return {
        # split the TF [in+u, 2u] gate kernel into x- and h- halves so the
        # x-half can be applied outside the scan
        "w_gate_x": init.glorot_uniform(kg, (input_dim + units, 2 * units),
                                        dtype)[:input_dim],
        "w_gate_h": init.glorot_uniform(jax.random.fold_in(kg, 1),
                                        (input_dim + units, 2 * units),
                                        dtype)[input_dim:],
        "b_gate": jnp.ones((2 * units,), dtype),   # TF GRUCell gate bias init 1.0
        "w_cand_x": init.glorot_uniform(kc, (input_dim + units, units),
                                        dtype)[:input_dim],
        "w_cand_h": init.glorot_uniform(jax.random.fold_in(kc, 1),
                                        (input_dim + units, units),
                                        dtype)[input_dim:],
        "b_cand": jnp.zeros((units,), dtype),
    }


def _gru_core(params: Params, gate_x: jax.Array, cand_x: jax.Array,
              h: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Shared GRU gate/candidate computation given precomputed x-projections."""
    gates = jax.nn.sigmoid(
        gate_x + jnp.matmul(h, params["w_gate_h"],
                            preferred_element_type=h.dtype) + params["b_gate"])
    r, u = jnp.split(gates, 2, axis=-1)
    cand = jnp.tanh(
        cand_x + jnp.matmul(r * h, params["w_cand_h"],
                            preferred_element_type=h.dtype) + params["b_cand"])
    return r, u, cand


_SCAN_UNROLL = 1


def set_scan_unroll(n: int) -> None:
    """Unroll factor for the recurrence scans (ModelConfig.scan_unroll).

    Captured at TRACE time (models/base.compute_loss sets it from the
    config before apply); unrolling shrinks the XLA while-loop trip count
    so the sequential per-iteration launch overhead amortizes.  The math
    is unchanged but XLA fusion boundaries move, so results can differ in
    low-order bits (like any XLA scheduling choice); keep the default 1
    when bitwise trajectory reproducibility matters."""
    global _SCAN_UNROLL
    _SCAN_UNROLL = max(int(n), 1)


def _masked_scan(step_fn, h0: jax.Array, xs, lengths: jax.Array,
                 max_len: int) -> jax.Array:
    """dynamic_rnn length semantics: for t >= lengths, output 0, state frozen."""

    def body(h, inp):
        t, x = inp
        new_h = step_fn(h, x)
        alive = (t < lengths)[:, None]
        h_next = jnp.where(alive, new_h, h)
        out = jnp.where(alive, new_h, jnp.zeros_like(new_h))
        return h_next, out

    ts = jnp.arange(max_len)
    _, outputs = jax.lax.scan(body, h0, (ts, xs), unroll=_SCAN_UNROLL)
    return jnp.transpose(outputs, (1, 0, 2))  # [L,B,u] -> [B,L,u]


def gru_net(params: Params, inputs: jax.Array, lengths: jax.Array,
            initial_state: Optional[jax.Array] = None,
            use_pallas: bool = False) -> jax.Array:
    """GRU.gru_net / gru_net_initial (gru.py:60-67,109-115).

    inputs: [B, L, d_in]; lengths: [B]; returns [B, L, units].
    """
    batch, max_len, _ = inputs.shape
    units = params["b_cand"].shape[0]
    gate_x = jnp.einsum("bld,df->blf", inputs, params["w_gate_x"])
    cand_x = jnp.einsum("bld,df->blf", inputs, params["w_cand_x"])
    h0 = (initial_state if initial_state is not None
          else jnp.zeros((batch, units), inputs.dtype))
    if use_pallas and _pallas_gru_ok(gate_x):
        z = jnp.zeros_like(cand_x)
        return _pallas_scan("plain", params, gate_x, cand_x, z, z, lengths, h0)
    xs = (jnp.transpose(gate_x, (1, 0, 2)), jnp.transpose(cand_x, (1, 0, 2)))

    def step(h, x):
        gx, cx = x
        _, u, cand = _gru_core(params, gx, cx, h)
        return u * h + (1.0 - u) * cand

    return _masked_scan(step, h0, xs, lengths, max_len)


def init_bidirectional_gru(rng: jax.Array, input_dim: int, units: int,
                           dtype=jnp.float32) -> Params:
    kf, kb = jax.random.split(rng)
    return {"fw": init_gru(kf, input_dim, units, dtype),
            "bw": init_gru(kb, input_dim, units, dtype)}


def bidirectional_gru_net(params: Params, inputs: jax.Array,
                          lengths: jax.Array,
                          use_pallas: bool = False) -> jax.Array:
    """GRU.bidirectional_gru_net (gru.py:41-59): concat(fw, bw) states.

    The backward pass reverses each row's VALID prefix (dynamic_rnn's
    sequence-length-aware reversal), scans forward, and un-reverses.
    """
    fw = gru_net(params["fw"], inputs, lengths, use_pallas=use_pallas)

    def reverse_valid(x):
        # index i <- (lengths-1-i) for i < length, identity elsewhere
        max_len = x.shape[1]
        idx = jnp.arange(max_len)[None, :]
        rev = jnp.where(idx < lengths[:, None],
                        lengths[:, None] - 1 - idx, idx)
        return jnp.take_along_axis(x, rev[:, :, None], axis=1)

    bw_in = reverse_valid(inputs)
    bw = gru_net(params["bw"], bw_in, lengths, use_pallas=use_pallas)
    bw = reverse_valid(bw)
    return jnp.concatenate([fw, bw], axis=-1)


# ------------------------------------------------------------- T-SeqRec cell

def init_tseqrec(rng: jax.Array, input_dim: int, units: int,
                 dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 8)
    params = init_gru(ks[0], input_dim, units, dtype)
    params.update({
        # per-unit time-gate vectors (time_aware_rnn.py:81-100)
        "time_input_w1": init.glorot_uniform(ks[1], (units,), dtype),
        "time_input_b1": init.glorot_uniform(ks[2], (units,), dtype),
        "time_input_w2": init.glorot_uniform(ks[3], (units,), dtype),
        "time_input_b2": init.glorot_uniform(jax.random.fold_in(ks[3], 1),
                                             (units,), dtype),
        "time_kernel_w1": init.glorot_uniform(ks[4], (input_dim, units), dtype),
        "time_kernel_t1": init.glorot_uniform(ks[5], (units, units), dtype),
        "time_bias1": jnp.zeros((units,), dtype),
        "time_kernel_w2": init.glorot_uniform(ks[6], (input_dim, units), dtype),
        "time_kernel_t2": init.glorot_uniform(ks[7], (units, units), dtype),
        "time_bias2": jnp.zeros((units,), dtype),
    })
    return params


def _tseqrec_time_states(params: Params, inputs: jax.Array,
                         time_last: jax.Array, time_now: jax.Array
                         ) -> Tuple[jax.Array, jax.Array]:
    """sigmoid(time_now_state), sigmoid(time_last_state) for ALL steps.

    time_aware_rnn.py:105-113 — both depend only on inputs and the raw
    time features, never on the state, so they hoist fully out of the scan.
    """
    time_now_input = jnp.tanh(time_now[..., None] * params["time_input_w1"]
                              + params["time_input_b1"])
    time_last_input = jnp.tanh(time_last[..., None] * params["time_input_w2"]
                               + params["time_input_b2"])
    now_state = (jnp.einsum("bld,du->blu", inputs, params["time_kernel_w1"])
                 + jnp.einsum("blu,uv->blv", time_now_input, params["time_kernel_t1"])
                 + params["time_bias1"])
    last_state = (jnp.einsum("bld,du->blu", inputs, params["time_kernel_w2"])
                  + jnp.einsum("blu,uv->blv", time_last_input, params["time_kernel_t2"])
                  + params["time_bias2"])
    return jax.nn.sigmoid(now_state), jax.nn.sigmoid(last_state)


def tseqrec_net(params: Params, inputs: jax.Array, time_last: jax.Array,
                time_now: jax.Array, lengths: jax.Array,
                initial_state: Optional[jax.Array] = None,
                use_pallas: bool = False) -> jax.Array:
    """T-SeqRec (SLi-Rec style) time-aware GRU over a packed sequence.

    inputs: [B, L, d] behavior embeddings (WITHOUT the two appended time
    features — the reference concatenates then strips them inside the
    cell, time_aware_rnn.py:73-75; we pass them separately).
    """
    batch, max_len, _ = inputs.shape
    units = params["b_cand"].shape[0]
    sig_now, sig_last = _tseqrec_time_states(params, inputs, time_last, time_now)
    gate_x = jnp.einsum("bld,df->blf", inputs, params["w_gate_x"])
    cand_x = jnp.einsum("bld,df->blf", inputs, params["w_cand_x"])
    h0 = (initial_state if initial_state is not None
          else jnp.zeros((batch, units), inputs.dtype))
    if use_pallas and _pallas_gru_ok(gate_x):
        return _pallas_scan("tseqrec", params, gate_x, cand_x, sig_now,
                            sig_last, lengths, h0)
    xs = tuple(jnp.transpose(a, (1, 0, 2))
               for a in (gate_x, cand_x, sig_now, sig_last))

    def step(h, x):
        gx, cx, s_now, s_last = x
        _, u, cand = _gru_core(params, gx, cx, h)
        return u * h * s_now + (1.0 - u) * cand * s_last  # (:130)

    return _masked_scan(step, h0, xs, lengths, max_len)


# ------------------------------------------------------- T-GRU (decay) cell

def init_tgru(rng: jax.Array, input_dim: int, units: int,
              dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 7)
    params = init_gru(ks[0], input_dim, units, dtype)
    params.update({
        # all per-unit vectors (time_aware_rnn.py:196-225); only the ones
        # the live math uses are materialized
        "time_kernel_w1": init.glorot_uniform(ks[1], (units,), dtype),
        "time_kernel_b1": init.glorot_uniform(ks[2], (units,), dtype),
        "time_history_w1": init.glorot_uniform(ks[3], (units,), dtype),
        "time_w1": init.glorot_uniform(ks[4], (units,), dtype),
        "time_w12": init.glorot_uniform(ks[5], (units,), dtype),
        "time_b1": init.glorot_uniform(ks[6], (units,), dtype),
        "time_b12": init.glorot_uniform(jax.random.fold_in(ks[6], 1),
                                        (units,), dtype),
        "time_kernel_w2": init.glorot_uniform(jax.random.fold_in(ks[1], 1),
                                              (units,), dtype),
    })
    return params


def tgru_net(params: Params, inputs: jax.Array, time_last: jax.Array,
             time_now: jax.Array, lengths: jax.Array,
             initial_state: Optional[jax.Array] = None,
             use_pallas: bool = False) -> jax.Array:
    """MTAM's T-GRU decay cell over a packed sequence
    (TimeAwareGRUCell_decay_new.call, time_aware_rnn.py:186-269).

    time_last_weight = relu(x*w_k1 + b_k1 + h*w_h1)         (:228)
    time_last_score  = relu(w1*t_last + b1)                 (:236)
    time_last_state  = sigmoid(w_k2*weight + w12*score + b12) (:237)
    new_h            = u*h + (1-u)*c*time_last_state        (:268)

    ``time_now`` participates only through the input concat in the
    reference (stripped inside the cell), so it does not enter the math.
    """
    del time_now
    batch, max_len, _ = inputs.shape
    units = params["b_cand"].shape[0]
    gate_x = jnp.einsum("bld,df->blf", inputs, params["w_gate_x"])
    cand_x = jnp.einsum("bld,df->blf", inputs, params["w_cand_x"])
    # x*w_k1 + b_k1 and relu(w1*t_last + b1) precompute per step
    xw = inputs * params["time_kernel_w1"] + params["time_kernel_b1"]
    score = jax.nn.relu(params["time_w1"] * time_last[..., None]
                        + params["time_b1"])
    h0 = (initial_state if initial_state is not None
          else jnp.zeros((batch, units), inputs.dtype))
    if use_pallas and _pallas_gru_ok(gate_x):
        return _pallas_scan("tgru", params, gate_x, cand_x, xw, score,
                            lengths, h0)
    xs = tuple(jnp.transpose(a, (1, 0, 2)) for a in (gate_x, cand_x, xw, score))

    def step(h, x):
        gx, cx, xw_t, score_t = x
        weight = jax.nn.relu(xw_t + h * params["time_history_w1"])
        t_state = jax.nn.sigmoid(params["time_kernel_w2"] * weight
                                 + params["time_w12"] * score_t
                                 + params["time_b12"])
        _, u, cand = _gru_core(params, gx, cx, h)
        return u * h + (1.0 - u) * cand * t_state

    return _masked_scan(step, h0, xs, lengths, max_len)


def time_aware_gru_net(params: Params, cell_type: str, inputs: jax.Array,
                       time_last: jax.Array, time_now: jax.Array,
                       lengths: jax.Array,
                       initial_state: Optional[jax.Array] = None,
                       use_pallas: bool = False) -> jax.Array:
    """GRU.time_aware_gru_net dispatch (gru.py:69-77):
    'T-SeqRec' -> sigmoid cell, 'new' -> decay cell."""
    if cell_type == "T-SeqRec":
        return tseqrec_net(params, inputs, time_last, time_now, lengths,
                           initial_state, use_pallas=use_pallas)
    if cell_type == "new":
        return tgru_net(params, inputs, time_last, time_now, lengths,
                        initial_state, use_pallas=use_pallas)
    raise ValueError(f"unknown time-aware cell type {cell_type!r}")


def init_time_aware_gru(rng: jax.Array, cell_type: str, input_dim: int,
                        units: int, dtype=jnp.float32) -> Params:
    if cell_type == "T-SeqRec":
        return init_tseqrec(rng, input_dim, units, dtype)
    if cell_type == "new":
        return init_tgru(rng, input_dim, units, dtype)
    raise ValueError(f"unknown time-aware cell type {cell_type!r}")

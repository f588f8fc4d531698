"""Attention modules (jnp reference path).

Ports of `/root/reference/Model/Modules/multihead_attention.py` (plain
MHA) and `time_aware_attention.py` (MTAM's multiplicative time-decay gate
+ the TiSAS additive log-interval bias).  Heads live on their own einsum
axis instead of the reference's split/concat-into-batch trick — the two
are numerically identical, and the einsum form feeds the MXU one big
batched matmul.

Faithfulness notes:
  * the decay gate keeps the reference's position-indexed [T_q, T_k]
    parameters (time_aware_attention.py:295-312).  Shapes are static per
    config in this framework, so this stays compilable; the Pallas kernel
    (ops/pallas/attention_kernel.py) computes the same gate blockwise,
    and ops/pallas/readout_kernel.py fuses whole multi-hop Tq=1
    readouts.  Kernel routing is BY MEASUREMENT (see the *_MIN_KEYS
    thresholds below and docs/PERFORMANCE.md round-4).
  * the content-time kernel tanh(Q W_t K^T) uses the RAW queries/keys
    (:320-323), not the projected Q/K.
  * plain MHA applies dropout to the (query-masked) attention weights
    (multihead_attention.py:179); the time-aware variant does not (:440
    is commented out in the reference); TiSAS does (:198).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from mtamrecommender_tpu.ops import initializers as init
from mtamrecommender_tpu.ops import layers

Params = Dict[str, jax.Array]

NEG_FILL = -(2.0 ** 32) + 1.0  # the reference's key-mask padding value


# ------------------------------------------------------------ param init


def _pallas_attention_enabled() -> bool:
    from mtamrecommender_tpu.ops.pallas import flags
    return flags.enabled("attention")

def init_mha_block(rng: jax.Array, num_units: int, dtype=jnp.float32) -> Params:
    kq, kk, kv = jax.random.split(rng, 3)
    return {
        "q": layers.init_dense(kq, num_units, num_units, dtype=dtype),
        "k": layers.init_dense(kk, num_units, num_units, dtype=dtype),
        "v": layers.init_dense(kv, num_units, num_units, dtype=dtype),
        "ln": layers.init_layer_norm(num_units, dtype),
    }


def init_time_mha_block(rng: jax.Array, num_units: int, t_q_len: int,
                        t_k_len: int, dtype=jnp.float32,
                        gate_mode: str = "positional") -> Params:
    """Decay-gate parameters.  'positional' keeps the reference's [Tq,Tk]
    position-indexed shape (time_aware_attention.py:295-312, faithful);
    'scalar' reparameterizes each gate weight as a scalar on scalar Δt
    (SURVEY.md §5.7) so the block generalizes to any sequence length and
    tiles blockwise (Pallas / key-axis CP).  The forward math is
    identical — jnp broadcasting covers both shapes."""
    base = init_mha_block(rng, num_units, dtype)
    ks = jax.random.split(jax.random.fold_in(rng, 7), 6)
    if gate_mode == "positional":
        shape = (t_q_len, t_k_len)
        ginit = lambda k: init.glorot_uniform(k, shape, dtype)  # noqa: E731
    elif gate_mode == "scalar":
        # the positional glorot bound at the reference's Tq=1,Tk=50 is
        # sqrt(6/51)≈0.34; scalars keep that magnitude so the gate starts
        # in the same (near-linear) sigmoid regime
        ginit = lambda k: jax.random.uniform(  # noqa: E731
            k, (), dtype, minval=-0.34, maxval=0.34)
    else:
        raise ValueError(f"unknown time_gate_mode {gate_mode!r}; "
                         "known: ('positional', 'scalar')")
    base.update({
        "time_input_w": init.glorot_uniform(ks[0], (num_units, num_units), dtype),
        "time_input_w1": ginit(ks[1]),
        "time_input_b1": ginit(ks[2]),
        "time_output_w1": ginit(ks[3]),
        "time_output_w2": ginit(ks[4]),
        "time_output_b": ginit(ks[5]),
    })
    return base


def init_tisas_block(rng: jax.Array, num_units: int, dtype=jnp.float32) -> Params:
    return init_mha_block(rng, num_units, dtype)


# ------------------------------------------------------------ core pieces

def _project_qkv(params: Params, queries: jax.Array, keys: jax.Array,
                 num_heads: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """relu-activated Q/K/V projections, reshaped to [B, h, T, d/h]."""
    d = params["q"]["w"].shape[1]
    dh = d // num_heads

    def heads(x):
        b, t, _ = x.shape
        return jnp.transpose(x.reshape(b, t, num_heads, dh), (0, 2, 1, 3))

    q = heads(layers.dense(params["q"], queries, jax.nn.relu))
    k = heads(layers.dense(params["k"], keys, jax.nn.relu))
    v = heads(layers.dense(params["v"], keys, jax.nn.relu))
    return q, k, v


def _finish(params: Params, scores: jax.Array, v: jax.Array,
            queries: jax.Array, key_len: jax.Array, query_len: jax.Array,
            dropout_rate: float, train: bool,
            rng: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
    """Mask -> softmax -> query-mask -> (dropout) -> weighted sum ->
    residual -> normalize.  Shared tail of all three attention variants.

    scores: [B, h, Tq, Tk]; v: [B, h, Tk, dh]; queries: [B, Tq, d]."""
    b, h, tq, tk = scores.shape
    key_mask = layers.sequence_mask(key_len, tk)[:, None, None, :]
    scores = jnp.where(key_mask, scores, NEG_FILL)
    weights = jax.nn.softmax(scores, axis=-1)
    query_mask = layers.sequence_mask(query_len, tq).astype(weights.dtype)
    weights = weights * query_mask[:, None, :, None]
    att_vec = weights
    if dropout_rate > 0.0:
        weights = layers.dropout(rng, weights, dropout_rate, train)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, tq, -1)
    out = out + queries                      # residual
    out = layers.normalize(params["ln"], out)  # Attention.normalize (eps 1e-8)
    return out, att_vec


# ------------------------------------------------------------ variants

def multihead_attention(params: Params, queries: jax.Array, keys: jax.Array,
                        key_len: jax.Array, query_len: jax.Array, *,
                        num_heads: int, dropout_rate: float = 0.0,
                        train: bool = True,
                        rng: Optional[jax.Array] = None,
                        use_pallas: bool = False
                        ) -> Tuple[jax.Array, jax.Array]:
    """Plain MHA (multihead_attention.py:71-193)."""
    if use_pallas and _pallas_attention_enabled():
        from mtamrecommender_tpu.ops.pallas import attention_kernel as pk
        if pk.supported(keys.shape[1], num_heads) \
                and _kernel_takes_dropout_shape(keys.shape[1], dropout_rate,
                                                train):
            dm = _draw_drop_mask(rng, queries, keys, dropout_rate, train)
            return _plain_attention_pallas(params, queries, keys,
                                           key_len, query_len, dm)
    q, k, v = _project_qkv(params, queries, keys, num_heads)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    scores = scores / (k.shape[-1] ** 0.5)
    return _finish(params, scores, v, queries, key_len, query_len,
                   dropout_rate, train, rng)


def time_aware_multihead_attention(params: Params, queries: jax.Array,
                                   keys: jax.Array, key_len: jax.Array,
                                   query_len: jax.Array, t_queries: jax.Array,
                                   t_keys: jax.Array, *, num_heads: int,
                                   dropout_rate: float = 0.0,
                                   train: bool = True,
                                   rng: Optional[jax.Array] = None,
                                   use_pallas: bool = False
                                   ) -> Tuple[jax.Array, jax.Array]:
    """MTAM's memory reader: scores *= sigmoid(decay_gate)
    (time_aware_attention.py:215-456).

    t_queries: [B, Tq] hours; t_keys: [B, Tk] hours.
    """
    from mtamrecommender_tpu.parallel import context_parallel as cp_lib
    if cp_lib.active_cp() is not None:
        # key-axis context parallelism (trace-time scope entered by
        # dist_trainer when MeshConfig.context_parallel): blockwise
        # online-softmax over key shards; requires the scalar gate
        out = cp_lib.cp_time_attention(params, queries, keys, key_len,
                                       t_queries, t_keys,
                                       num_heads=num_heads)
        return _pallas_tail(params, out, queries, query_len), None
    if use_pallas and _pallas_attention_enabled() \
            and getattr(params["time_input_w1"], "ndim", 2) == 2 \
            and (queries.shape[1] > 1 or not train):
        # the fused kernel tiles the positional [Tq,Tk] gate params;
        # scalar-gate mode stays on the jnp path (broadcasting covers it).
        # Training-time SINGLE-QUERY hops (MTAM's decoder readout) also
        # stay jnp: at Tq=1 the per-hop work is below kernel-call
        # granularity and XLA's in-scan fusion wins — measured 241.8 ms
        # vs 111.1 ms per 100-step superstep call with the kernel forced
        # (benchmarks/results/steps_r3.json; docs/PERFORMANCE.md).  The
        # kernel still serves Tq>1 training and all inference.
        from mtamrecommender_tpu.ops.pallas import attention_kernel as pk
        if pk.supported(keys.shape[1], num_heads):
            return _time_attention_pallas(params, queries, keys, key_len,
                                          query_len, t_queries, t_keys)
    q, k, v = _project_qkv(params, queries, keys, num_heads)
    # content-time kernel on RAW embeddings (:320-323)
    time_qk = jnp.tanh(jnp.einsum(
        "bqd,de,bke->bqk", queries, params["time_input_w"], keys))
    # interval decay (:330-343)
    delta = jnp.abs(t_queries[:, :, None] - t_keys[:, None, :])
    decay = jnp.tanh(jnp.log1p(delta) * params["time_input_w1"]
                     + params["time_input_b1"])
    gate = (params["time_output_w1"] * decay
            + params["time_output_w2"] * time_qk
            + params["time_output_b"])                     # (:350)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    scores = scores * jax.nn.sigmoid(gate)[:, None, :, :]  # (:381)
    scores = scores / (k.shape[-1] ** 0.5)
    # reference leaves dropout disabled here (:440)
    return _finish(params, scores, v, queries, key_len, query_len,
                   0.0, train, rng)


def tisas_multihead_attention(params: Params, queries: jax.Array,
                              keys: jax.Array, key_len: jax.Array,
                              query_len: jax.Array, t_queries: jax.Array,
                              t_keys: jax.Array, *, num_heads: int,
                              dropout_rate: float = 0.0, train: bool = True,
                              rng: Optional[jax.Array] = None,
                              use_pallas: bool = False
                              ) -> Tuple[jax.Array, jax.Array]:
    """TiSAS additive variant: scores += log(|Δt|+1)
    (TiSAS_multihead_attention, time_aware_attention.py:73-214)."""
    if use_pallas and _pallas_attention_enabled():
        from mtamrecommender_tpu.ops.pallas import attention_kernel as pk
        if pk.supported(keys.shape[1], num_heads) \
                and _kernel_takes_dropout_shape(keys.shape[1], dropout_rate,
                                                train):
            dm = _draw_drop_mask(rng, queries, keys, dropout_rate, train)
            return _tisas_attention_pallas(params, queries, keys,
                                           key_len, query_len,
                                           t_queries, t_keys, dm)
    q, k, v = _project_qkv(params, queries, keys, num_heads)
    delta = jnp.abs(t_queries[:, :, None] - t_keys[:, None, :])
    interval = jnp.log1p(delta)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) + interval[:, None, :, :]
    scores = scores / (k.shape[-1] ** 0.5)
    return _finish(params, scores, v, queries, key_len, query_len,
                   dropout_rate, train, rng)


# ------------------------------------------------- pallas fused middles

# Training WITH attention-weight dropout routes to the fused kernel only
# at long key lengths: at the reference's L=50 the per-block pallas_call
# pair (fwd+bwd) costs more than XLA's in-scan fused softmax chain
# (measured: SASrec scope=all 262.6 ms vs 177.2 per 100-step call,
# benchmarks/results/steps_r4.json — the same kernel-call-granularity
# economics as MTAM's Tq=1 hops in r3).  Past this threshold the [Tq,Tk]
# intermediates grow quadratically and the VMEM-resident kernel wins.
# Inference (no dropout) routes at any supported length as before.
DROPOUT_KERNEL_MIN_KEYS = 256

# Round-5 fourth (and final) readout-kernel attempt: the sequential-chain
# kernel (ops/pallas/readout_chain_kernel.py) keeps the hop-batched
# projections on XLA's MXU path and fuses ONLY the ~15-op/hop query chain
# + hand-written backward into one pallas call per direction.  MEASURED
# LOSS at the reference shapes: MTAM 123.2 vs 92.9 ms per 100-step
# superstep call (steps_r5chain.json) — the two calls' operand staging
# (~29 MB of k/v/tprec in, ~29 MB of their cotangents out per step)
# exceeds the dispatch overhead they remove, the same economics that
# sank the three previous structures (per-hop call r3; whole-readout
# with in-kernel projections and its tile-vectorized rework r4).  Four
# structurally distinct kernels have now lost to XLA's in-scan fusion at
# L=50; the hop-batched jnp readout IS the shipping fast path, and the
# chain kernel stays opt-in (hardware grad parity <=8e-4, the tightest
# of the readout kernels) for shapes someone wants to re-measure.
READOUT_CHAIN_OPT_IN = False

# Same economics for the fused multi-hop readout kernel
# (ops/pallas/readout_kernel.py): at L=50 the hop-batched jnp readout wins
# (106.7 vs 192.1 ms per 100-step MTAM superstep call, steps_r4 series);
# the kernel takes the Tq=1 readout only for long memories.
READOUT_KERNEL_MIN_KEYS = 256


def _kernel_takes_dropout_shape(tk_len: int, rate: float, train: bool) -> bool:
    """Whether the fused kernel should take a train-time call that needs
    weight dropout; no-dropout calls always qualify."""
    if not train or rate <= 0.0:
        return True
    from mtamrecommender_tpu.ops.pallas import attention_kernel as pk
    return tk_len >= DROPOUT_KERNEL_MIN_KEYS and pk.dropout_supported(tk_len)


def _draw_drop_mask(rng: Optional[jax.Array], queries: jax.Array,
                    keys: jax.Array, rate: float, train: bool
                    ) -> Optional[jax.Array]:
    """Pre-scaled attention-weight dropout mask ([B,Tq,Tk], values 0 or
    1/keep) for the fused kernel's '*_drop' modes, or None when dropout
    is off.  Drawn with the SAME bernoulli shape/rng the jnp path uses
    ([B,h=1,Tq,Tk], layers.dropout), so kernel and jnp training see
    identical mask bits."""
    if not train or rate <= 0.0 or rng is None:
        return None
    keep = 1.0 - rate
    mask = jax.random.bernoulli(
        rng, keep, (queries.shape[0], 1, queries.shape[1], keys.shape[1]))
    return mask[:, 0].astype(jnp.float32) / keep


def _pallas_tail(params: Params, out: jax.Array, queries: jax.Array,
                 query_len: jax.Array) -> jax.Array:
    """Query-mask -> residual -> normalize (same tail as _finish)."""
    qmask = layers.sequence_mask(query_len, queries.shape[1]
                                 ).astype(out.dtype)[:, :, None]
    out = out * qmask + queries
    return layers.normalize(params["ln"], out)


def _time_attention_pallas(params, queries, keys, key_len, query_len,
                           t_queries, t_keys):
    from mtamrecommender_tpu.ops.pallas import attention_kernel as pk
    # the kernel is dtype-polymorphic: bf16 operands feed the MXU
    # natively, softmax/gate accumulate in f32 inside
    q = layers.dense(params["q"], queries, jax.nn.relu)
    k = layers.dense(params["k"], keys, jax.nn.relu)
    v = layers.dense(params["v"], keys, jax.nn.relu)
    tqw = jnp.matmul(queries, params["time_input_w"],
                     preferred_element_type=queries.dtype)
    out = pk.fused_attention(
        "time", q, k, v, t_queries, t_keys, tqw, keys,
        params["time_input_w1"], params["time_input_b1"],
        params["time_output_w1"], params["time_output_w2"],
        params["time_output_b"], key_len,
        pk.dm_dummy(q.dtype)).astype(queries.dtype)
    return _pallas_tail(params, out, queries, query_len), None


def _plain_attention_pallas(params, queries, keys, key_len, query_len,
                            drop_mask=None):
    from mtamrecommender_tpu.ops.pallas import attention_kernel as pk
    q = layers.dense(params["q"], queries, jax.nn.relu)
    k = layers.dense(params["k"], keys, jax.nn.relu)
    v = layers.dense(params["v"], keys, jax.nn.relu)
    # plain mode needs no time vectors or gate params; pass zeros
    zt_q = jnp.zeros(queries.shape[:2], q.dtype)
    zt_k = jnp.zeros(keys.shape[:2], q.dtype)
    zg = jnp.zeros((queries.shape[1], keys.shape[1]), q.dtype)
    mode = "plain" if drop_mask is None else "plain_drop"
    dm = pk.dm_dummy(q.dtype) if drop_mask is None else drop_mask
    out = pk.fused_attention(
        mode, q, k, v, zt_q, zt_k, jnp.zeros_like(q), jnp.zeros_like(k),
        zg, zg, zg, zg, zg, key_len, dm).astype(queries.dtype)
    return _pallas_tail(params, out, queries, query_len), None


def _tisas_attention_pallas(params, queries, keys, key_len, query_len,
                            t_queries, t_keys, drop_mask=None):
    from mtamrecommender_tpu.ops.pallas import attention_kernel as pk
    q = layers.dense(params["q"], queries, jax.nn.relu)
    k = layers.dense(params["k"], keys, jax.nn.relu)
    v = layers.dense(params["v"], keys, jax.nn.relu)
    # tisas needs no content-time kernel or gate params; pass zeros
    zg = jnp.zeros((queries.shape[1], keys.shape[1]), q.dtype)
    mode = "tisas" if drop_mask is None else "tisas_drop"
    dm = pk.dm_dummy(q.dtype) if drop_mask is None else drop_mask
    out = pk.fused_attention(
        mode, q, k, v, t_queries, t_keys, jnp.zeros_like(q),
        jnp.zeros_like(k), zg, zg, zg, zg, zg,
        key_len, dm).astype(queries.dtype)
    return _pallas_tail(params, out, queries, query_len), None


# ------------------------------------------------------------ stacks

def init_attention_stack(rng: jax.Array, num_blocks: int, num_units: int,
                         *, kind: str = "plain", t_q_len: int = 0,
                         t_k_len: int = 0, dtype=jnp.float32,
                         gate_mode: str = "positional") -> List[Params]:
    blocks = []
    for i in range(num_blocks):
        kb = jax.random.fold_in(rng, i)
        if kind == "plain" or kind == "tisas":
            blocks.append(init_mha_block(kb, num_units, dtype))
        elif kind == "time":
            blocks.append(init_time_mha_block(kb, num_units, t_q_len, t_k_len,
                                              dtype, gate_mode))
        else:
            raise ValueError(f"unknown attention kind {kind!r}")
    return blocks


def self_attention_stack(blocks: List[Params], enc: jax.Array,
                         key_len: jax.Array, query_len: jax.Array, *,
                         kind: str, num_heads: int, dropout_rate: float,
                         train: bool, rng: Optional[jax.Array] = None,
                         t_queries: Optional[jax.Array] = None,
                         t_keys: Optional[jax.Array] = None,
                         use_pallas: bool = False
                         ) -> Tuple[jax.Array, jax.Array]:
    """Attention.self_attention / Time_Aware_Attention.{self,Tiself}_attention:
    num_blocks stacked self-attention hops (no FFN — the reference's
    feed-forward blocks are commented out)."""
    att_vec = None
    for i, params in enumerate(blocks):
        block_rng = None if rng is None else jax.random.fold_in(rng, i)
        if kind == "plain":
            enc, att_vec = multihead_attention(
                params, enc, enc, key_len, query_len, num_heads=num_heads,
                dropout_rate=dropout_rate, train=train, rng=block_rng,
                use_pallas=use_pallas)
        elif kind == "time":
            enc, att_vec = time_aware_multihead_attention(
                params, enc, enc, key_len, query_len, t_queries, t_keys,
                num_heads=num_heads, dropout_rate=dropout_rate, train=train,
                rng=block_rng, use_pallas=use_pallas)
        elif kind == "tisas":
            enc, att_vec = tisas_multihead_attention(
                params, enc, enc, key_len, query_len, t_queries, t_keys,
                num_heads=num_heads, dropout_rate=dropout_rate, train=train,
                rng=block_rng, use_pallas=use_pallas)
        else:
            raise ValueError(f"unknown attention kind {kind!r}")
    return enc, att_vec


def _fused_single_query_readout(blocks: List[Params], enc: jax.Array,
                                dec: jax.Array, key_len: jax.Array,
                                query_len: jax.Array, *,
                                kind: str, num_heads: int,
                                dropout_rate: float, train: bool,
                                rng: Optional[jax.Array],
                                t_queries: Optional[jax.Array],
                                t_keys: Optional[jax.Array],
                                use_pallas: bool = False) -> jax.Array:
    """The num_blocks Tq=1 decoder hops (MTAM's NextItemDecoder readout,
    MTAMRec_model.py:84-91) with the memory-side work batched ACROSS hops.

    Math-identical to running `multihead_attention` /
    `time_aware_multihead_attention` per block (pinned by
    tests/test_ops.py): the hops stay sequential only in the query chain
    dec_0 -> dec_1 -> ..., so everything keyed off the (hop-invariant)
    memory — the K/V projections, the content-time precursor mem @ W_t^T,
    and the interval-decay part of the gate — is computed for ALL hops in
    three stacked einsums up front.  What remains per hop is ~15 small
    ops ([B,d] matvecs + softmax) instead of the ~40-op per-hop chain,
    which matters because at these shapes the train step is
    per-op-overhead bound, not FLOP bound (docs/PERFORMANCE.md).  The
    dropout rng stream (plain kind; the reference trains NARM's readout
    with weight dropout) folds per hop exactly like the unfused path, so
    trajectories are preserved bit-for-bit modulo matmul grouping.
    """
    n = len(blocks)
    b_sz, _, d = dec.shape
    tk = enc.shape[1]
    dh = d // num_heads
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    use_chain_kernel = False
    if (READOUT_CHAIN_OPT_IN and kind == "time" and num_heads == 1
            and use_pallas and _pallas_attention_enabled()):
        from mtamrecommender_tpu.ops.pallas import readout_chain_kernel as rc
        use_chain_kernel = rc.supported(tk, num_heads)

    # ---- hop-batched memory-side precompute (the FLOPs live here) ----
    k_all = jax.nn.relu(jnp.einsum("bld,nde->nble", enc, stacked["k"]["w"])
                        + stacked["k"]["b"][:, None, None, :])
    v_all = jax.nn.relu(jnp.einsum("bld,nde->nble", enc, stacked["v"]["w"])
                        + stacked["v"]["b"][:, None, None, :])
    k_all = k_all.reshape(n, b_sz, tk, num_heads, dh)
    v_all = v_all.reshape(n, b_sz, tk, num_heads, dh)
    if kind == "time":
        # time_qk = tanh(dec @ W_t @ mem^T) on RAW dec/mem (:320-323);
        # the mem-side contraction is hop-batched, dec-side stays per hop
        tprec = jnp.einsum("ble,nde->nbld", enc, stacked["time_input_w"])
        delta = jnp.abs(t_queries[:, :, None] - t_keys[:, None, :])  # [B,1,Tk]

        def _bc(x):
            # gate param stacked over hops -> broadcastable vs [n,B,1,Tk]:
            # positional [n,1,Tk] -> [n,1,1,Tk]; scalar [n] -> [n,1,1,1]
            return (x.reshape((n, 1) + x.shape[1:]) if x.ndim > 1
                    else x.reshape(n, 1, 1, 1))

        decay = jnp.tanh(jnp.log1p(delta)[None] * _bc(stacked["time_input_w1"])
                         + _bc(stacked["time_input_b1"]))            # [n,B,1,Tk]
        gate_part = (_bc(stacked["time_output_w1"]) * decay
                     + _bc(stacked["time_output_b"]))                # [n,B,1,Tk]
        if use_chain_kernel:
            # round-5 chain kernel: the sequential query chain (and its
            # hand-written backward) fuse into one pallas call per
            # direction while the hop-batched projections above stay on
            # XLA's MXU path — cotangents for k/v/tprec/gate_part leave
            # the kernel as plain outputs (readout_chain_kernel.py)
            from mtamrecommender_tpu.ops.pallas import \
                readout_chain_kernel as rc
            wo2 = stacked["time_output_w2"]
            wo2_rows = (wo2.reshape(n, tk) if wo2.ndim > 1
                        else jnp.broadcast_to(wo2[:, None], (n, tk)))
            return rc.readout_chain(
                dec, key_len, (query_len > 0).astype(jnp.float32),
                k_all.reshape(n, b_sz, tk, d),
                v_all.reshape(n, b_sz, tk, d),
                tprec, gate_part[:, :, 0, :], wo2_rows,
                stacked["q"]["w"], stacked["q"]["b"],
                stacked["ln"]["gamma"], stacked["ln"]["beta"]
            ).astype(dec.dtype)
    kmask = layers.sequence_mask(key_len, tk)[:, None, :]
    # per-hop query mask (the _finish qmask at Tq=1): a row with
    # query_len == 0 keeps only its residual+normalize each hop
    qz = (query_len > 0).astype(dec.dtype)[:, None]                  # [B, 1]

    # ---- short sequential query chain ----
    cur = dec[:, 0, :]                                               # [B, d]
    for i in range(n):
        q = layers.dense({"w": stacked["q"]["w"][i],
                          "b": stacked["q"]["b"][i]}, cur, jax.nn.relu)
        q = q.reshape(b_sz, num_heads, dh)
        scores = jnp.einsum("bhe,blhe->bhl", q, k_all[i])            # [B,h,Tk]
        if kind == "time":
            tqk = jnp.tanh(jnp.einsum("bd,bld->bl", cur, tprec[i]))
            gate = gate_part[i][:, 0, :] \
                + stacked["time_output_w2"][i] * tqk                 # [B,Tk]
            scores = scores * jax.nn.sigmoid(gate)[:, None, :]
        scores = scores / (dh ** 0.5)
        scores = jnp.where(kmask, scores, NEG_FILL)
        weights = jax.nn.softmax(scores, axis=-1)
        if kind == "plain" and dropout_rate > 0.0:
            block_rng = None if rng is None else jax.random.fold_in(rng, i)
            # same draw shape/fold as the unfused path ([B,h,1,Tk]) so the
            # mask bits — hence the training trajectory — are identical
            weights = layers.dropout(block_rng, weights[:, :, None, :],
                                     dropout_rate, train)[:, :, 0, :]
        out = jnp.einsum("bhl,blhe->bhe", weights, v_all[i]).reshape(b_sz, d)
        cur = layers.normalize({"gamma": stacked["ln"]["gamma"][i],
                                "beta": stacked["ln"]["beta"][i]},
                               out * qz + cur)
    return cur


def _fused_readout_pallas(blocks: List[Params], enc: jax.Array,
                          dec: jax.Array, key_len: jax.Array,
                          t_queries: jax.Array, t_keys: jax.Array,
                          query_len: Optional[jax.Array] = None
                          ) -> jax.Array:
    """All hops + projections in ONE pallas call per direction
    (ops/pallas/readout_kernel.py).  Gate params are normalized to [n, L]
    rows OUTSIDE the custom_vjp: positional [1,L] params reshape, scalar
    params broadcast (jax AD reduces their cotangents back)."""
    from mtamrecommender_tpu.ops.pallas import readout_kernel as rk
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    n, tk = len(blocks), enc.shape[1]

    def gate_row(x):
        x = x.astype(jnp.float32)
        if x.ndim == 1:                       # scalar gate, stacked -> [n]
            return jnp.broadcast_to(x[:, None], (n, tk))
        return x.reshape(n, tk)               # positional [n, 1, L]

    logdt = jnp.log1p(jnp.abs(t_queries[:, 0:1] - t_keys)
                      ).astype(jnp.float32)
    qmask = (jnp.ones((enc.shape[0],), jnp.float32) if query_len is None
             else (query_len > 0).astype(jnp.float32))
    out = rk.fused_readout(
        enc, dec[:, 0, :], logdt, key_len, qmask,
        stacked["q"]["w"], stacked["q"]["b"],
        stacked["k"]["w"], stacked["k"]["b"],
        stacked["v"]["w"], stacked["v"]["b"],
        stacked["time_input_w"],
        gate_row(stacked["time_input_w1"]),
        gate_row(stacked["time_input_b1"]),
        gate_row(stacked["time_output_w1"]),
        gate_row(stacked["time_output_w2"]),
        gate_row(stacked["time_output_b"]),
        stacked["ln"]["gamma"], stacked["ln"]["beta"])
    return out.astype(dec.dtype)


def vanilla_attention_stack(blocks: List[Params], enc: jax.Array,
                            dec: jax.Array, key_len: jax.Array,
                            query_len: jax.Array, *, kind: str,
                            num_heads: int, dropout_rate: float, train: bool,
                            rng: Optional[jax.Array] = None,
                            t_queries: Optional[jax.Array] = None,
                            t_keys: Optional[jax.Array] = None,
                            use_pallas: bool = False,
                            fused: bool = True) -> jax.Array:
    """Decoder cross-attention hops; returns [B*Tq, d] like the
    reference's final reshape (multihead_attention.py:250,
    time_aware_attention.py:555).

    Tq=1 stacks (the whole MTAM/NARM family) ride the fused readout
    KERNEL (time kind, one pallas call for all hops incl. projections)
    when pallas attention is enabled, else the hop-batched jnp readout;
    key-axis context parallelism and the per-hop eval kernels stay on the
    per-hop loop, where their routing lives.  ``fused=False`` forces the
    reference-shaped per-hop loop (the parity oracle for tests)."""
    from mtamrecommender_tpu.parallel import context_parallel as cp_lib
    if (fused and dec.shape[1] == 1 and kind in ("plain", "time")
            and len(blocks) > 0 and cp_lib.active_cp() is None):
        if (kind == "time" and use_pallas and _pallas_attention_enabled()
                and num_heads == 1
                and enc.shape[1] >= READOUT_KERNEL_MIN_KEYS):
            # at the reference's L=50 the jnp fused readout measurably
            # wins (106.7 vs 192.1 ms/100 steps, steps_r4.json /
            # docs/PERFORMANCE.md); the one-call kernel pays off only
            # once the per-hop [B,L,d] projections are big enough that
            # keeping them out of HBM matters
            from mtamrecommender_tpu.ops.pallas import readout_kernel as rk
            if rk.supported(enc.shape[1], num_heads):
                return _fused_readout_pallas(blocks, enc, dec, key_len,
                                             t_queries, t_keys, query_len)
        if not (use_pallas and _pallas_attention_enabled() and not train):
            return _fused_single_query_readout(
                blocks, enc, dec, key_len, query_len, kind=kind,
                num_heads=num_heads, dropout_rate=dropout_rate, train=train,
                rng=rng, t_queries=t_queries, t_keys=t_keys,
                use_pallas=use_pallas)
    for i, params in enumerate(blocks):
        block_rng = None if rng is None else jax.random.fold_in(rng, i)
        if kind == "plain":
            dec, _ = multihead_attention(
                params, dec, enc, key_len, query_len, num_heads=num_heads,
                dropout_rate=dropout_rate, train=train, rng=block_rng,
                use_pallas=use_pallas)
        elif kind == "time":
            dec, _ = time_aware_multihead_attention(
                params, dec, enc, key_len, query_len, t_queries, t_keys,
                num_heads=num_heads, dropout_rate=dropout_rate, train=train,
                rng=block_rng, use_pallas=use_pallas)
        else:
            raise ValueError(f"unknown attention kind {kind!r}")
    d = dec.shape[-1]
    return dec.reshape(-1, d)

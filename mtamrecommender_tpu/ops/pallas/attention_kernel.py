"""Fused time-interval-biased attention kernel (Pallas TPU).

Replaces the middle of `ops.attention.time_aware_multihead_attention` /
`tisas_multihead_attention` (the jnp reference ports of
`/root/reference/Model/Modules/time_aware_attention.py:215-456,73-214`):

    scores   = Q K^T
    time_qk  = tanh((Q_raw W_t) K_raw^T)            [time mode]
    decay    = tanh(log1p|t_q - t_k| * w1 + b1)     [time mode]
    gate     = wo1*decay + wo2*time_qk + bo         [time mode]
    scores   = scores * sigmoid(gate) / sqrt(dh)    [time mode]
    scores   = (scores + log1p|t_q - t_k|)/sqrt(dh) [tisas mode]
    scores   = key-masked -> softmax -> out = W V

Everything between the Q/K/V projections and the residual+layernorm tail
runs in ONE kernel: the [Tq,Tk] score/gate intermediates never touch HBM,
and the log-interval bias is computed per tile from the raw t_q/t_k hour
vectors (the blockwise form SURVEY.md section 5.7 asks for — the
position-indexed gate parameters are just another [Tq,Tk] tile input).

Grid: one program per batch row; a whole (padded) [Tq,Tk] tile per
program.  The reference workload is L<=150 (max_len cap,
config/model_parameter.py:38) so a padded single tile always fits VMEM;
rows longer than MAX_KEYS fall back to the jnp path.

Backward: the single-tile path has a fused bwd kernel
(`_attn_bwd_kernel`) that recomputes scores/softmax in VMEM from the
inputs (flash-style, no [Tq,Tk] residual in HBM) and backpropagates
through the weighted sum, softmax, decay gate and score matmul in one
program; gate-parameter cotangents accumulate across the batch grid.
The long-history blockwise path falls back to a jnp recompute vjp.
Parity: tests/test_pallas.py (interpret) + hardware grad checks ≤5e-4.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_FILL = -(2.0 ** 32) + 1.0   # reference mask fill (multihead_attention.py:131)

SINGLE_TILE_KEYS = 1024         # <= this: one [Tq,Tk] tile per row
KEY_BLOCK = 512                 # > that: flash-style online-softmax blocks
MAX_KEYS = 32768                # hard cap; longer -> jnp path
_TILE_ROWS_FWD = 16             # batch rows per program (VMEM-capped)
_TILE_ROWS_BWD = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------- kernels

def _attn_kernel(mode: str, scale: float, rows: int,
                 q_ref, k_ref, v_ref, tq_ref, tk_ref, tqw_ref, rawk_ref,
                 w1_ref, b1_ref, wo1_ref, wo2_ref, bo_ref, klen_ref,
                 *rest_refs):
    """One batch TILE (`rows` rows per program): fused gate + masked
    softmax + weighted sum per row.  Multiple rows per program amortize
    the grid-step/DMA overhead that dominated the one-row-per-program
    form at these shapes (docs/PERFORMANCE.md: the model is
    per-op-overhead bound, not FLOP bound).

    '*_drop' modes take one extra operand before out_ref: a pre-scaled
    dropout mask tile (values 0 or 1/keep) applied to the softmax weights
    — the reference trains plain MHA and TiSAS WITH attention-weight
    dropout (multihead_attention.py:179, time_aware_attention.py:198), so
    this is what lets their training steps ride the fused kernel."""
    if mode.endswith("_drop"):
        dm_ref, out_ref = rest_refs
    else:
        dm_ref, (out_ref,) = None, rest_refs
    base_mode = mode[:-5] if mode.endswith("_drop") else mode
    w1 = w1_ref[:].astype(jnp.float32)
    b1 = b1_ref[:].astype(jnp.float32)
    wo1 = wo1_ref[:].astype(jnp.float32)
    wo2 = wo2_ref[:].astype(jnp.float32)
    bo = bo_ref[:].astype(jnp.float32)
    base = pl.program_id(0) * rows   # hoisted: program_id is not
                                     # lowerable inside the fori_loop body

    def row(r, _):
        q = q_ref[r]            # [TQ, d]  (f32 or bf16)
        k = k_ref[r]            # [TK, d]
        v = v_ref[r]            # [TK, d]
        tk_len = klen_ref[base + r]

        # MXU consumes the input dtype (bf16-native under mixed
        # precision); scores/softmax accumulate in f32
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        if base_mode in ("time", "tisas"):
            # log-interval computed per tile from the hour vectors —
            # never a [Tq,Tk] parameter in HBM
            logdt = jnp.log1p(jnp.abs(tq_ref[r] - tk_ref[r].T))  # [TQ,TK]
        if base_mode == "time":
            time_qk = jnp.tanh(jax.lax.dot_general(
                tqw_ref[r], rawk_ref[r], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
            decay = jnp.tanh(logdt * w1 + b1)
            gate = wo1 * decay + wo2 * time_qk + bo
            scores = scores * jax.nn.sigmoid(gate) * scale
        elif base_mode == "tisas":
            scores = (scores + logdt) * scale
        else:  # plain
            scores = scores * scale

        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < tk_len, scores, NEG_FILL)

        # row softmax (stable; padded key cols carry NEG_FILL)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        weights = e / denom
        if dm_ref is not None:
            weights = weights * dm_ref[r].astype(jnp.float32)

        out_ref[r] = jnp.dot(weights.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, rows, row, 0)


def _attn_kernel_blockwise(mode: str, scale: float, kb: int,
                           q_ref, k_ref, v_ref, tq_ref, tk_ref, tqw_ref,
                           rawk_ref, w1_ref, b1_ref, wo1_ref, wo2_ref,
                           bo_ref, klen_ref, out_ref,
                           m_ref, l_ref, acc_ref):
    """Flash-style online softmax over key blocks: grid = (B, n_kb).

    Scratch (m, l, acc) persists across the inner key-block walk; the
    log-interval gate for each tile is computed from the t_q/t_k hour
    vectors, so nothing [Tq, Tk]-sized ever materializes (SURVEY.md
    section 5.7's blockwise requirement)."""
    j = pl.program_id(1)
    n_kb = pl.num_programs(1)
    tk_len = klen_ref[pl.program_id(0)]

    q = q_ref[0]              # [TQ, d]
    k = k_ref[0]              # [KB, d]
    v = v_ref[0]              # [KB, d]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    if mode in ("time", "tisas"):
        t_q = tq_ref[0]       # [TQ, 1]
        t_k = tk_ref[0]       # [KB, 1]
        logdt = jnp.log1p(jnp.abs(t_q - t_k.T))
    if mode == "time":
        time_qk = jnp.tanh(jax.lax.dot_general(
            tqw_ref[0], rawk_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
        decay = jnp.tanh(logdt * w1_ref[:].astype(jnp.float32)
                         + b1_ref[:].astype(jnp.float32))
        gate = (wo1_ref[:].astype(jnp.float32) * decay
                + wo2_ref[:].astype(jnp.float32) * time_qk
                + bo_ref[:].astype(jnp.float32))
        scores = scores * jax.nn.sigmoid(gate) * scale
    elif mode == "tisas":
        scores = (scores + logdt) * scale
    else:
        scores = scores * scale

    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + j * kb
    scores = jnp.where(col < tk_len, scores, NEG_FILL)

    m_prev = m_ref[:, :1]                               # [TQ, 1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)
    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_kb - 1)
    def _finalize():
        out_ref[0] = acc_ref[...] / l_ref[:, :1]


def _pad_seq(x: jax.Array, length: int, axis: int) -> jax.Array:
    pad = length - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("mode",))
def _fused_attention_fwd(mode: str, q, k, v, t_q, t_k, tqw, rawk,
                         w1, b1, wo1, wo2, bo, key_len, dm):
    """q: [B,Tq,d]; k,v: [B,Tk,d]; t_q: [B,Tq]; t_k: [B,Tk];
    tqw: [B,Tq,d]; rawk: [B,Tk,d]; gate params: [Tq,Tk]; key_len: [B];
    dm: [B,Tq,Tk] pre-scaled dropout mask for '*_drop' modes (values 0 or
    1/keep; a [1,1,1] dummy otherwise)."""
    b_sz, tq, d = q.shape
    tk = k.shape[1]
    dropout = mode.endswith("_drop")
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    tqp = _round_up(tq, sublane)
    tkp = _round_up(tk, 128)
    scale = 1.0 / (d ** 0.5)
    t_q = t_q.astype(jnp.float32)
    t_k = t_k.astype(jnp.float32)

    qp = _pad_seq(q, tqp, 1)
    kp = _pad_seq(k, tkp, 1)
    vp = _pad_seq(v, tkp, 1)
    tqv = _pad_seq(t_q, tqp, 1)[..., None]         # [B,Tqp,1]
    tkv = _pad_seq(t_k, tkp, 1)[..., None]         # [B,Tkp,1]
    tqwp = _pad_seq(tqw, tqp, 1)
    rawkp = _pad_seq(rawk, tkp, 1)
    gate = [_pad_seq(_pad_seq(g, tqp, 0), tkp, 1) for g in (w1, b1, wo1, wo2, bo)]

    interpret = jax.default_backend() != "tpu"
    cost = pl.CostEstimate(
        flops=2 * b_sz * tqp * tkp * (2 * d + 8),
        bytes_accessed=4 * b_sz * (2 * tqp * d + 3 * tkp * d),
        transcendentals=b_sz * tqp * tkp * 4,
    )
    args = [qp, kp, vp, tqv, tkv, tqwp, rawkp, *gate,
            key_len.astype(jnp.int32)]
    if dropout:
        args.append(_pad_seq(_pad_seq(dm, tqp, 1), tkp, 2))

    if tkp <= SINGLE_TILE_KEYS:
        # batch-tile the grid: TB rows per program (VMEM-bounded by the
        # three [TB,Tk,d] key-side blocks + the mask tile when present)
        per_row_f32 = 3 * tkp * d + (tqp * tkp if dropout else 0)
        tile_b = max(1, min(_TILE_ROWS_FWD, b_sz,
                            (4 << 20) // (4 * per_row_f32)))
        bp = _round_up(b_sz, tile_b)
        if bp != b_sz:
            # pad the per-batch operands only (NOT the [Tq,Tk] gate
            # params at positions 7-11); padded rows carry key_len=0
            args = [a if 7 <= idx <= 11 else _pad_seq(a, bp, 0)
                    for idx, a in enumerate(args)]
        row3 = lambda t, dd: pl.BlockSpec((tile_b, t, dd),  # noqa: E731
                                          lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM)
        full2 = pl.BlockSpec((tqp, tkp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        in_specs = [
            row3(tqp, d), row3(tkp, d), row3(tkp, d),
            row3(tqp, 1), row3(tkp, 1), row3(tqp, d), row3(tkp, d),
            full2, full2, full2, full2, full2,
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole [Bp] key_len
        ]
        if dropout:
            in_specs.append(row3(tqp, tkp))
        out = pl.pallas_call(
            functools.partial(_attn_kernel, mode, scale, tile_b),
            grid=(bp // tile_b,),
            in_specs=in_specs,
            out_specs=row3(tqp, d),
            out_shape=jax.ShapeDtypeStruct((bp, tqp, d), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(*args)
        return out[:b_sz, :tq, :]

    if dropout:
        raise NotImplementedError(
            "attention-weight dropout is routed only through the "
            "single-tile kernel (training shapes have Tk <= "
            f"{SINGLE_TILE_KEYS}); long-history training stays on the "
            "jnp path")
    # long histories: flash-style online softmax over KEY_BLOCK tiles
    kb = KEY_BLOCK
    tkp = _round_up(tkp, kb)
    args = (qp, _pad_seq(kp, tkp, 1), _pad_seq(vp, tkp, 1), tqv,
            _pad_seq(tkv, tkp, 1), tqwp, _pad_seq(rawkp, tkp, 1),
            *[_pad_seq(g, tkp, 1) for g in gate],
            key_len.astype(jnp.int32))
    n_kb = tkp // kb
    qrow = lambda t, dd: pl.BlockSpec((1, t, dd),  # noqa: E731
                                      lambda i, j: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    krow = lambda dd: pl.BlockSpec((1, kb, dd),  # noqa: E731
                                   lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM)
    gblk = pl.BlockSpec((tqp, kb), lambda i, j: (0, j),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel_blockwise, mode, scale, kb),
        grid=(b_sz, n_kb),
        in_specs=[
            qrow(tqp, d), krow(d), krow(d),
            qrow(tqp, 1), krow(1), qrow(tqp, d), krow(d),
            gblk, gblk, gblk, gblk, gblk,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=qrow(tqp, d),
        out_shape=jax.ShapeDtypeStruct((b_sz, tqp, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tqp, 128), jnp.float32),   # running max
            pltpu.VMEM((tqp, 128), jnp.float32),   # running denominator
            pltpu.VMEM((tqp, d), jnp.float32),     # output accumulator
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    return out[:, :tq, :]


def _attn_bwd_kernel(mode: str, scale: float, rows: int,
                     g_ref, q_ref, k_ref, v_ref, tq_ref, tk_ref, tqw_ref,
                     rawk_ref, w1_ref, b1_ref, wo1_ref, wo2_ref, bo_ref,
                     klen_ref, *rest_refs):
    """Fused backward for the single-tile attention middle, `rows` batch
    rows per program (same dispatch amortization as the forward).

    Recomputes scores/softmax in VMEM from the saved inputs (flash-style
    — no [Tq,Tk] residual in HBM), then backpropagates through the
    weighted sum, softmax, decay gate and score matmul in one kernel.
    Gate-parameter cotangents ([Tq,Tk] matrices) accumulate across the
    batch grid in their VMEM-resident output blocks; padded rows carry a
    zero cotangent, so they contribute nothing.

    '*_drop' modes take the forward's pre-scaled dropout mask as one
    extra operand after klen_ref: forward out = (w . dm) @ v, so dv uses
    the DROPPED weights and the weight cotangent re-masks before the
    softmax transpose."""
    if mode.endswith("_drop"):
        dm_ref = rest_refs[0]
        out_refs = rest_refs[1:]
    else:
        dm_ref = None
        out_refs = rest_refs
    (dq_ref, dk_ref, dv_ref, dtqw_ref, drawk_ref,
     dw1_ref, db1_ref, dwo1_ref, dwo2_ref, dbo_ref) = out_refs
    base_mode = mode[:-5] if mode.endswith("_drop") else mode
    in_dtype = q_ref.dtype
    w1 = w1_ref[:].astype(jnp.float32)
    b1 = b1_ref[:].astype(jnp.float32)
    wo1 = wo1_ref[:].astype(jnp.float32)
    wo2 = wo2_ref[:].astype(jnp.float32)
    bo = bo_ref[:].astype(jnp.float32)

    # zero the gate-grad accumulators in EVERY mode: on hardware an
    # unwritten output block is uninitialized memory, not zeros
    # (interpret mode zero-fills and hides this)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dwo1_ref[...] = jnp.zeros_like(dwo1_ref)
        dwo2_ref[...] = jnp.zeros_like(dwo2_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)

    base = pl.program_id(0) * rows   # hoisted (see _attn_kernel)

    def row(r, _):
        g = g_ref[r].astype(jnp.float32)        # [TQ, d] cotangent of out
        q = q_ref[r]
        k = k_ref[r]
        v = v_ref[r]
        tk_len = klen_ref[base + r]

        # ---- forward recompute (same math as _attn_kernel) ----
        s0 = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if base_mode in ("time", "tisas"):
            logdt = jnp.log1p(jnp.abs(tq_ref[r] - tk_ref[r].T))
        if base_mode == "time":
            tqw = tqw_ref[r]
            rawk = rawk_ref[r]
            time_qk = jnp.tanh(jax.lax.dot_general(
                tqw, rawk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
            decay = jnp.tanh(logdt * w1 + b1)
            sig = jax.nn.sigmoid(wo1 * decay + wo2 * time_qk + bo)
            scores = s0 * sig * scale
        elif base_mode == "tisas":
            scores = (s0 + logdt) * scale
        else:
            scores = s0 * scale
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < tk_len, scores, NEG_FILL)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        weights = e / denom                      # [TQ, TK]
        dropped = weights if dm_ref is None \
            else weights * dm_ref[r].astype(jnp.float32)

        # ---- backward ----
        dv_ref[r] = jax.lax.dot_general(
            dropped.astype(in_dtype), g.astype(in_dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dwei = jax.lax.dot_general(
            g.astype(in_dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [TQ, TK]
        if dm_ref is not None:
            # cotangent of the PRE-dropout weights: re-scale by the mask
            dwei = dwei * dm_ref[r].astype(jnp.float32)
        # softmax jvp transpose: ds = w * (dw - sum(dw*w))
        ds = weights * (dwei - jnp.sum(dwei * weights, axis=1,
                                       keepdims=True))
        # masked cols have weights == 0 -> ds == 0 there already
        if base_mode == "time":
            dsig = ds * s0 * scale
            ds0 = ds * sig * scale
            dgate = dsig * sig * (1.0 - sig)
            ddec = dgate * wo1
            dpre_dec = ddec * (1.0 - decay * decay)
            dtqk = dgate * wo2
            dpre_tqk = dtqk * (1.0 - time_qk * time_qk)
            dw1_ref[...] += dpre_dec * logdt
            db1_ref[...] += dpre_dec
            dwo1_ref[...] += dgate * decay
            dwo2_ref[...] += dgate * time_qk
            dbo_ref[...] += dgate
            dtqw_ref[r] = jnp.dot(dpre_tqk.astype(in_dtype), rawk,
                                  preferred_element_type=jnp.float32)
            drawk_ref[r] = jax.lax.dot_general(
                dpre_tqk.astype(in_dtype), tqw, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            ds0 = ds * scale
            dtqw_ref[r] = jnp.zeros_like(dtqw_ref[r])
            drawk_ref[r] = jnp.zeros_like(drawk_ref[r])
        dq_ref[r] = jnp.dot(ds0.astype(in_dtype), k,
                            preferred_element_type=jnp.float32)
        dk_ref[r] = jax.lax.dot_general(
            ds0.astype(in_dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, rows, row, 0)


@functools.partial(jax.jit, static_argnames=("mode",))
def _fused_attention_bwd(mode: str, g, q, k, v, t_q, t_k, tqw, rawk,
                         w1, b1, wo1, wo2, bo, key_len, dm):
    """Pallas backward for the single-tile path; returns f32 cotangents
    (dq, dk, dv, dtqw, drawk, dw1, db1, dwo1, dwo2, dbo)."""
    b_sz, tq, d = q.shape
    tk = k.shape[1]
    dropout = mode.endswith("_drop")
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    tqp = _round_up(tq, sublane)
    tkp = _round_up(tk, 128)
    scale = 1.0 / (d ** 0.5)

    per_row_f32 = 3 * tkp * d + (tqp * tkp if dropout else 0)
    tile_b = max(1, min(_TILE_ROWS_BWD, b_sz,
                        (4 << 20) // (4 * per_row_f32)))
    bp = _round_up(b_sz, tile_b)

    def padb(x):
        return _pad_seq(x, bp, 0)

    gp = padb(_pad_seq(g.astype(jnp.float32), tqp, 1))
    qp = padb(_pad_seq(q, tqp, 1))
    kp = padb(_pad_seq(k, tkp, 1))
    vp = padb(_pad_seq(v, tkp, 1))
    tqv = padb(_pad_seq(t_q.astype(jnp.float32), tqp, 1)[..., None])
    tkv = padb(_pad_seq(t_k.astype(jnp.float32), tkp, 1)[..., None])
    tqwp = padb(_pad_seq(tqw, tqp, 1))
    rawkp = padb(_pad_seq(rawk, tkp, 1))
    gate = [_pad_seq(_pad_seq(x, tqp, 0), tkp, 1)
            for x in (w1, b1, wo1, wo2, bo)]

    row3 = lambda t, dd: pl.BlockSpec((tile_b, t, dd),  # noqa: E731
                                      lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    full2 = pl.BlockSpec((tqp, tkp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((bp, tqp, d), f32),     # dq
        jax.ShapeDtypeStruct((bp, tkp, d), f32),     # dk
        jax.ShapeDtypeStruct((bp, tkp, d), f32),     # dv
        jax.ShapeDtypeStruct((bp, tqp, d), f32),     # dtqw
        jax.ShapeDtypeStruct((bp, tkp, d), f32),     # drawk
        jax.ShapeDtypeStruct((tqp, tkp), f32),       # dw1
        jax.ShapeDtypeStruct((tqp, tkp), f32),       # db1
        jax.ShapeDtypeStruct((tqp, tkp), f32),       # dwo1
        jax.ShapeDtypeStruct((tqp, tkp), f32),       # dwo2
        jax.ShapeDtypeStruct((tqp, tkp), f32),       # dbo
    )
    in_specs = [
        row3(tqp, d), row3(tqp, d), row3(tkp, d), row3(tkp, d),
        row3(tqp, 1), row3(tkp, 1), row3(tqp, d), row3(tkp, d),
        full2, full2, full2, full2, full2,
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args = [gp, qp, kp, vp, tqv, tkv, tqwp, rawkp, *gate,
            _pad_seq(key_len.astype(jnp.int32), bp, 0)]
    if dropout:
        in_specs.append(row3(tqp, tkp))
        args.append(padb(_pad_seq(_pad_seq(dm, tqp, 1), tkp, 2)))
    res = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, mode, scale, tile_b),
        grid=(bp // tile_b,),
        in_specs=in_specs,
        out_specs=(row3(tqp, d), row3(tkp, d), row3(tkp, d),
                   row3(tqp, d), row3(tkp, d),
                   full2, full2, full2, full2, full2),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=6 * b_sz * tqp * tkp * (2 * d + 8),
            bytes_accessed=4 * b_sz * (4 * tqp * d + 6 * tkp * d),
            transcendentals=b_sz * tqp * tkp * 4,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    dq, dk, dv, dtqw, drawk, dw1, db1, dwo1, dwo2, dbo = res
    cut = lambda x, t: x[:b_sz, :t, :]  # noqa: E731
    return (cut(dq, tq), cut(dk, tk), cut(dv, tk), cut(dtqw, tq),
            cut(drawk, tk),
            dw1[: w1.shape[0], : w1.shape[1]],
            db1[: b1.shape[0], : b1.shape[1]],
            dwo1[: wo1.shape[0], : wo1.shape[1]],
            dwo2[: wo2.shape[0], : wo2.shape[1]],
            dbo[: bo.shape[0], : bo.shape[1]])


def _reference_middle(mode: str, q, k, v, t_q, t_k, tqw, rawk,
                      w1, b1, wo1, wo2, bo, key_len, dm=None):
    """jnp twin of the kernel, used for the backward pass (and as the
    oracle in tests/benchmarks — pass ``dm`` to mirror a '*_drop' mode's
    pre-scaled mask)."""
    base_mode = mode[:-5] if mode.endswith("_drop") else mode
    d = q.shape[-1]
    scores = jnp.einsum("bqd,bkd->bqk", q, k)
    if base_mode in ("time", "tisas"):
        logdt = jnp.log1p(jnp.abs(t_q[:, :, None] - t_k[:, None, :]))
    if base_mode == "time":
        time_qk = jnp.tanh(jnp.einsum("bqd,bkd->bqk", tqw, rawk))
        decay = jnp.tanh(logdt * w1 + b1)
        gate = wo1 * decay + wo2 * time_qk + bo
        scores = scores * jax.nn.sigmoid(gate) / (d ** 0.5)
    elif base_mode == "tisas":
        scores = (scores + logdt) / (d ** 0.5)
    else:
        scores = scores / (d ** 0.5)
    col = jnp.arange(scores.shape[2])[None, None, :]
    scores = jnp.where(col < key_len[:, None, None], scores, NEG_FILL)
    weights = jax.nn.softmax(scores, axis=-1)
    if dm is not None:
        weights = weights * dm
    return jnp.einsum("bqk,bkd->bqd", weights, v)


_DM_DUMMY_SHAPE = (1, 1, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_attention(mode: str, q, k, v, t_q, t_k, tqw, rawk,
                    w1, b1, wo1, wo2, bo, key_len,
                    drop_mask):
    """Fused scores->gate->softmax->weighted-sum middle.  Returns [B,Tq,d].

    drop_mask: pre-scaled attention-weight dropout mask [B,Tq,Tk] with
    values 0 or 1/keep for the '*_drop' modes (a [1,1,1] dummy
    otherwise).  The mask is DRAWN OUTSIDE the kernel (one bernoulli op —
    the same draw the jnp path makes), so forward and backward see the
    identical mask with no in-kernel PRNG state to keep in sync."""
    return _fused_attention_fwd(mode, q, k, v, t_q, t_k, tqw, rawk,
                                w1, b1, wo1, wo2, bo, key_len, drop_mask)


def _fa_fwd(mode, q, k, v, t_q, t_k, tqw, rawk, w1, b1, wo1, wo2, bo,
            key_len, drop_mask):
    out = _fused_attention_fwd(mode, q, k, v, t_q, t_k, tqw, rawk,
                               w1, b1, wo1, wo2, bo, key_len, drop_mask)
    return out, (q, k, v, t_q, t_k, tqw, rawk, w1, b1, wo1, wo2, bo,
                 key_len, drop_mask)


def _fa_bwd(mode, residuals, g):
    (q, k, v, t_q, t_k, tqw, rawk, w1, b1, wo1, wo2, bo, key_len,
     drop_mask) = residuals
    tkp = _round_up(k.shape[1], 128)
    if tkp <= SINGLE_TILE_KEYS:
        # fused single-tile backward: recomputes scores/softmax in VMEM
        dq, dk, dv, dtqw, drawk, dw1, db1, dwo1, dwo2, dbo = \
            _fused_attention_bwd(mode, g, q, k, v, t_q, t_k, tqw, rawk,
                                 w1, b1, wo1, wo2, bo, key_len, drop_mask)
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
                jnp.zeros_like(t_q), jnp.zeros_like(t_k),
                dtqw.astype(tqw.dtype), drawk.astype(rawk.dtype),
                dw1.astype(w1.dtype), db1.astype(b1.dtype),
                dwo1.astype(wo1.dtype), dwo2.astype(wo2.dtype),
                dbo.astype(bo.dtype), jnp.zeros_like(key_len),
                jnp.zeros_like(drop_mask))
    # long-history fallback: recompute through the jnp reference middle
    # (never a '_drop' mode — _fused_attention_fwd rejects those)
    g = g.astype(q.dtype)
    _, vjp = jax.vjp(
        lambda q_, k_, v_, tqw_, rawk_, w1_, b1_, wo1_, wo2_, bo_:
        _reference_middle(mode, q_, k_, v_, t_q, t_k, tqw_, rawk_,
                          w1_, b1_, wo1_, wo2_, bo_, key_len),
        q, k, v, tqw, rawk, w1, b1, wo1, wo2, bo)
    dq, dk, dv, dtqw, drawk, dw1, db1, dwo1, dwo2, dbo = vjp(g)
    return (dq, dk, dv, jnp.zeros_like(t_q), jnp.zeros_like(t_k),
            dtqw, drawk, dw1, db1, dwo1, dwo2, dbo,
            jnp.zeros_like(key_len), jnp.zeros_like(drop_mask))


fused_attention.defvjp(_fa_fwd, _fa_bwd)


def dm_dummy(dtype=jnp.float32) -> jax.Array:
    """Placeholder drop_mask operand for the non-dropout modes."""
    return jnp.zeros(_DM_DUMMY_SHAPE, dtype)


def supported(tk_len: int, num_heads: int) -> bool:
    return num_heads == 1 and tk_len <= MAX_KEYS


def dropout_supported(tk_len: int) -> bool:
    """Attention-weight dropout rides the single-tile kernel only."""
    return _round_up(tk_len, 128) <= SINGLE_TILE_KEYS

"""Fused multi-hop single-query decoder readout (Pallas TPU).

The ENTIRE MTAM readout — `num_blocks` hops of time-aware single-query
attention over the behavior memory (NextItemDecoder,
`/root/reference/Model/MTAMRec_model.py:84-91` driving
`Model/Modules/time_aware_attention.py:215-456` at Tq=1) — in ONE kernel
call per direction:

    per hop i (all in VMEM):
        q    = relu(dec @ Wq_i + bq_i)
        K    = relu(mem @ Wk_i + bk_i);  V = relu(mem @ Wv_i + bv_i)
        tqk  = tanh((dec @ Wt_i) . mem^T)           # RAW dec/mem (:320-323)
        gate = wo1_i * tanh(logdt * w1_i + b1_i) + wo2_i * tqk + bo_i
        s    = (q . K^T) * sigmoid(gate) / sqrt(d)  # key-masked
        dec  = LN_i(softmax(s) @ V + dec)           # residual + normalize

Why a kernel: the step is per-op-overhead bound (docs/PERFORMANCE.md).
The jnp fused readout still costs ~23 ms per 100-step superstep call on
MTAM (steps_r4.json MTAM-vs-T_GRU gap); here the ~250-op fwd+bwd chain
becomes two pallas calls whose intermediates never leave VMEM.  Unlike
round 3's per-hop kernel attempt (241.8 ms — one pallas_call per hop per
step forced HBM round-trips), ONE call covers all hops AND the
projections, so the memory streams in once.

The backward recomputes the hop chain in VMEM (flash-style, no residuals
in HBM beyond the [n+1, d] per-row dec chain) and emits cotangents for
the memory, the initial query, and every per-hop parameter; parameter
cotangents accumulate across the batch grid (zero-initialised by program
0 in EVERY branch — hardware gives uninitialised output blocks,
interpret mode hides that by zero-filling).

Gate parameters arrive as [n_hops, L] rows (positional [1,L] params are
stacked; scalar-gate params are broadcast outside the custom_vjp, so
jax's AD of the broadcast reduces their cotangents back to scalars).
num_heads == 1 only (every reference preset); h > 1 falls back to the
jnp path in ops.attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_FILL = -(2.0 ** 32) + 1.0
MAX_KEYS = 1024          # single [L, d] memory tile per row; longer -> jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_axis(x, length, axis):
    pad = length - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _hop_forward(i, dec, mem, mem2d, logdt, mask, qz, scale,
                 wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wt_ref,
                 w1_ref, b1_ref, wo1_ref, wo2_ref, bo_ref,
                 lng_ref, lnb_ref, in_dtype):
    """One hop for a whole batch TILE (no per-row loop: every op is
    batch-parallel, the shape the VPU/MXU want).  dec: [TB, d] f32;
    mem: [TB, L, d] input dtype; mem2d: [TB*L, d] view of mem.
    Returns (dec_next [TB, d] f32, saved intermediates for bwd)."""
    tb, tl, d = mem.shape
    dec_c = dec.astype(in_dtype)
    q = jax.nn.relu(
        jnp.dot(dec_c, wq_ref[i], preferred_element_type=jnp.float32)
        + bq_ref[i].astype(jnp.float32))                       # [TB, d]
    # K/V stay in the input dtype: halves the VMEM live set (so the batch
    # tile can double) at bf16-rounding cost the jnp path pays anyway
    # (layers.dense accumulates in x.dtype)
    k = jax.nn.relu(
        jnp.dot(mem2d, wk_ref[i], preferred_element_type=jnp.float32)
        + bk_ref[i].astype(jnp.float32)).astype(in_dtype
                                                ).reshape(tb, tl, d)
    v = jax.nn.relu(
        jnp.dot(mem2d, wv_ref[i], preferred_element_type=jnp.float32)
        + bv_ref[i].astype(jnp.float32)).astype(in_dtype
                                                ).reshape(tb, tl, d)
    u = jnp.dot(dec_c, wt_ref[i], preferred_element_type=jnp.float32)
    tqk = jnp.tanh(jnp.sum(u[:, None, :] * mem.astype(jnp.float32),
                           axis=2))                            # [TB, L]
    decay = jnp.tanh(logdt * w1_ref[i].astype(jnp.float32)
                     + b1_ref[i].astype(jnp.float32))          # [TB, L]
    gate = (wo1_ref[i].astype(jnp.float32) * decay
            + wo2_ref[i].astype(jnp.float32) * tqk
            + bo_ref[i].astype(jnp.float32))
    sig = jax.nn.sigmoid(gate)
    s0 = jnp.sum(q[:, None, :] * k, axis=2)                    # [TB, L]
    s = jnp.where(mask, s0 * sig * scale, NEG_FILL)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    w = e / jnp.sum(e, axis=1, keepdims=True)                  # [TB, L]
    o = jnp.sum(w[:, :, None] * v, axis=1) * qz                # [TB, d]
    x = o + dec
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
    inv = 1.0 / jnp.sqrt(var + 1e-8)      # normalize() eps (attention LN)
    xh = (x - mu) * inv
    dec_next = xh * lng_ref[i].astype(jnp.float32) \
        + lnb_ref[i].astype(jnp.float32)
    saved = (q, k, v, u, tqk, decay, gate, sig, s0, w, xh, inv)
    return dec_next, saved


def _readout_kernel(n_hops: int, scale: float,
                    mem_ref, dec_ref, logdt_ref, klen_ref, qz_ref,
                    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wt_ref,
                    w1_ref, b1_ref, wo1_ref, wo2_ref, bo_ref,
                    lng_ref, lnb_ref, out_ref):
    in_dtype = mem_ref.dtype
    tb, tl, d = mem_ref.shape
    mem = mem_ref[...]
    mem2d = mem.reshape(tb * tl, d)
    dec = dec_ref[...][:, 0, :].astype(jnp.float32)            # [TB, d]
    logdt = logdt_ref[...][:, 0, :]                            # [TB, L]
    col = jax.lax.broadcasted_iota(jnp.int32, logdt.shape, 1)
    mask = col < klen_ref[...][:, :, 0]                        # [TB, 1] bcast
    qz = qz_ref[...][:, :, 0]                                  # [TB, 1] f32
    for i in range(n_hops):
        dec, _ = _hop_forward(
            i, dec, mem, mem2d, logdt, mask, qz, scale,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wt_ref,
            w1_ref, b1_ref, wo1_ref, wo2_ref, bo_ref,
            lng_ref, lnb_ref, in_dtype)
    out_ref[...] = dec[:, None, :]


def _readout_bwd_kernel(n_hops: int, scale: float,
                        g_ref, mem_ref, dec_ref, logdt_ref, klen_ref,
                        qz_ref,
                        wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                        wt_ref, w1_ref, b1_ref, wo1_ref, wo2_ref, bo_ref,
                        lng_ref, lnb_ref,
                        dmem_ref, ddec_ref,
                        dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref,
                        dbv_ref, dwt_ref, dw1_ref, db1_ref, dwo1_ref,
                        dwo2_ref, dbo_ref, dlng_ref, dlnb_ref):
    in_dtype = mem_ref.dtype

    # param-grad accumulators live in their (replicated) output blocks;
    # zero them in EVERY mode branch on hardware (uninitialised memory
    # otherwise — interpret hides this by zero-filling)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                    dwt_ref, dw1_ref, db1_ref, dwo1_ref, dwo2_ref, dbo_ref,
                    dlng_ref, dlnb_ref):
            ref[...] = jnp.zeros_like(ref)

    tb, tl, d = mem_ref.shape
    mem = mem_ref[...]
    mem2d = mem.reshape(tb * tl, d)
    dec0 = dec_ref[...][:, 0, :].astype(jnp.float32)           # [TB, d]
    logdt = logdt_ref[...][:, 0, :]                            # [TB, L]
    col = jax.lax.broadcasted_iota(jnp.int32, logdt.shape, 1)
    mask = col < klen_ref[...][:, :, 0]
    qz = qz_ref[...][:, :, 0]                                  # [TB, 1] f32

    # ---- forward replay, keeping ONLY the per-hop dec chain ([TB, d]
    # each) — hop intermediates are recomputed in the reverse sweep so a
    # single hop's K/V is live at a time (VMEM) ----
    decs = []
    dec = dec0
    for i in range(n_hops):
        decs.append(dec)
        dec, _ = _hop_forward(
            i, dec, mem, mem2d, logdt, mask, qz, scale,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wt_ref,
            w1_ref, b1_ref, wo1_ref, wo2_ref, bo_ref,
            lng_ref, lnb_ref, in_dtype)

    # ---- reverse sweep (whole tile per op) ----
    g = g_ref[...][:, 0, :].astype(jnp.float32)                # [TB, d]
    dmem = jnp.zeros((tb, tl, d), jnp.float32)
    for i in range(n_hops - 1, -1, -1):
        dec_in = decs[i]
        _, saved = _hop_forward(
            i, dec_in, mem, mem2d, logdt, mask, qz, scale,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wt_ref,
            w1_ref, b1_ref, wo1_ref, wo2_ref, bo_ref,
            lng_ref, lnb_ref, in_dtype)
        (q, k, v, u, tqk, decay, gate, sig, s0, w, xh, inv) = saved
        # layer norm backward (normalize(): (x-mu)*inv*gamma + beta)
        dlng_ref[i] += jnp.sum(g * xh, axis=0)
        dlnb_ref[i] += jnp.sum(g, axis=0)
        dxh = g * lng_ref[i].astype(jnp.float32)
        dx = (dxh - jnp.mean(dxh, axis=1, keepdims=True)
              - xh * jnp.mean(dxh * xh, axis=1, keepdims=True)) * inv
        do = dx * qz             # o was query-masked; residual was not
        ddec_in = dx                              # residual branch
        # weighted sum backward: o = sum_l w * V
        dw = jnp.sum(do[:, None, :] * v, axis=2)               # [TB, L]
        dv = w[:, :, None] * do[:, None, :]                    # [TB, L, d]
        # softmax transpose (masked cols have w == 0 -> ds == 0 there)
        ds = w * (dw - jnp.sum(dw * w, axis=1, keepdims=True))
        dgate = ds * s0 * scale * sig * (1.0 - sig)
        ds0 = ds * sig * scale
        # gate-param rows accumulate over the tile's batch rows
        dpre_dec = dgate * wo1_ref[i].astype(jnp.float32) \
            * (1.0 - decay * decay)
        dw1_ref[i] += jnp.sum(dpre_dec * logdt, axis=0)
        db1_ref[i] += jnp.sum(dpre_dec, axis=0)
        dwo1_ref[i] += jnp.sum(dgate * decay, axis=0)
        dwo2_ref[i] += jnp.sum(dgate * tqk, axis=0)
        dbo_ref[i] += jnp.sum(dgate, axis=0)
        # content-time kernel: tqk = tanh(sum_e u * mem)
        dpre_tqk = dgate * wo2_ref[i].astype(jnp.float32) \
            * (1.0 - tqk * tqk)                                # [TB, L]
        du = jnp.sum(dpre_tqk[:, :, None] * mem.astype(jnp.float32),
                     axis=1)      # [TB, d]
        dmem += dpre_tqk[:, :, None] * u[:, None, :]
        ddec_in += jax.lax.dot_general(
            du.astype(in_dtype), wt_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwt_ref[i] += jax.lax.dot_general(
            dec_in.astype(in_dtype), du.astype(in_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [d, d]
        # scores backward: s0 = sum_e q * K
        dq = jnp.sum(ds0[:, :, None] * k, axis=1)              # [TB, d]
        dk = ds0[:, :, None] * q[:, None, :]                   # [TB, L, d]
        # relu projections (compare in f32 — Mosaic lacks bf16 cmpf)
        dk_pre = jnp.where(k.astype(jnp.float32) > 0.0, dk, 0.0
                           ).reshape(tb * tl, d)
        dv_pre = jnp.where(v.astype(jnp.float32) > 0.0, dv, 0.0
                           ).reshape(tb * tl, d)
        dq_pre = jnp.where(q > 0.0, dq, 0.0)
        dmem += jax.lax.dot_general(
            dk_pre.astype(in_dtype), wk_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(tb, tl, d)
        dmem += jax.lax.dot_general(
            dv_pre.astype(in_dtype), wv_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(tb, tl, d)
        ddec_in += jax.lax.dot_general(
            dq_pre.astype(in_dtype), wq_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwk_ref[i] += jax.lax.dot_general(
            mem2d, dk_pre.astype(in_dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbk_ref[i] += jnp.sum(dk_pre, axis=0)
        dwv_ref[i] += jax.lax.dot_general(
            mem2d, dv_pre.astype(in_dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbv_ref[i] += jnp.sum(dv_pre, axis=0)
        dwq_ref[i] += jax.lax.dot_general(
            dec_in.astype(in_dtype), dq_pre.astype(in_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbq_ref[i] += jnp.sum(dq_pre, axis=0)
        g = ddec_in
    dmem_ref[...] = dmem
    ddec_ref[...] = g[:, None, :]


# ------------------------------------------------------------ dispatch

def _prep(mem, dec, logdt, key_len):
    b_sz, tk, d = mem.shape
    tkp = _round_up(tk, 128)
    return b_sz, tk, d, tkp


@functools.partial(jax.jit, static_argnames=())
def _readout_fwd(mem, dec, logdt, key_len, qmask, wq, bq, wk, bk, wv, bv,
                 wt, w1, b1, wo1, wo2, bo, lng, lnb):
    b_sz, tk, d, tkp = _prep(mem, dec, logdt, key_len)
    n_hops = wq.shape[0]
    scale = 1.0 / (d ** 0.5)
    # biggest batch tile VMEM allows: live set ~ mem + K + V per hop
    # (~3 tiles in the input dtype) + [TB,Lp] f32 soup.  Bigger tiles =
    # fewer, bigger ops — the whole point vs the jnp path.
    itemsize = 2 if mem.dtype == jnp.bfloat16 else 4
    tile_b = max(1, min(b_sz, (6 << 20) // (3 * tkp * d * itemsize)))
    if tile_b >= 8:      # round down for even grids, but NEVER override
        tile_b = (tile_b // 8) * 8   # the VMEM budget with a floor
    bp = _round_up(b_sz, tile_b)

    memp = _pad_axis(_pad_axis(mem, tkp, 1), bp, 0)
    decp = _pad_axis(dec[:, None, :], bp, 0)              # [Bp, 1, d]
    logdtp = _pad_axis(_pad_axis(logdt, tkp, 1)[:, None, :], bp, 0)
    gate = [_pad_axis(x, tkp, 1).astype(jnp.float32)
            for x in (w1, b1, wo1, wo2, bo)]              # [n, Lp]
    klen = _pad_axis(key_len.astype(jnp.int32)[:, None, None], bp, 0)
    qmp = _pad_axis(qmask.astype(jnp.float32)[:, None, None], bp, 0)

    row3 = lambda t, dd: pl.BlockSpec((tile_b, t, dd),  # noqa: E731
                                      lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    full = lambda *sh: pl.BlockSpec(sh, lambda i: (0,) * len(sh),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    col2 = row3(1, 1)
    out = pl.pallas_call(
        functools.partial(_readout_kernel, n_hops, scale),
        grid=(bp // tile_b,),
        in_specs=[
            row3(tkp, d), row3(1, d), row3(1, tkp),
            col2, col2,
            full(n_hops, d, d), full(n_hops, d),     # wq, bq
            full(n_hops, d, d), full(n_hops, d),     # wk, bk
            full(n_hops, d, d), full(n_hops, d),     # wv, bv
            full(n_hops, d, d),                      # wt
            full(n_hops, tkp), full(n_hops, tkp),    # w1, b1
            full(n_hops, tkp), full(n_hops, tkp),    # wo1, wo2
            full(n_hops, tkp),                       # bo
            full(n_hops, d), full(n_hops, d),        # ln gamma/beta
        ],
        out_specs=row3(1, d),
        out_shape=jax.ShapeDtypeStruct((bp, 1, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_sz * n_hops * tkp * d * (3 * d + 8),
            bytes_accessed=2 * b_sz * tkp * d,
            transcendentals=b_sz * n_hops * tkp * 4,
        ),
        interpret=jax.default_backend() != "tpu",
    )(memp, decp, logdtp, klen, qmp, wq, bq, wk, bk, wv, bv, wt, *gate,
      lng, lnb)
    return out[:b_sz, 0, :]


@functools.partial(jax.jit, static_argnames=())
def _readout_bwd(g, mem, dec, logdt, key_len, qmask, wq, bq, wk, bk, wv,
                 bv, wt, w1, b1, wo1, wo2, bo, lng, lnb):
    b_sz, tk, d, tkp = _prep(mem, dec, logdt, key_len)
    n_hops = wq.shape[0]
    scale = 1.0 / (d ** 0.5)
    # worst-case live set keeps every hop's K/V from the replay plus the
    # f32 dmem accumulator: ~(1 + 2*n_hops)*itemsize + 4 bytes per element
    itemsize = 2 if mem.dtype == jnp.bfloat16 else 4
    per_row = tkp * d * (3 * itemsize + 3 * 4) * 2   # mem+K+V, dmem+dK+dV, 2x slack
    tile_b = max(1, min(b_sz, (6 << 20) // per_row))
    if tile_b >= 8:      # see _readout_fwd: budget wins over the floor
        tile_b = (tile_b // 8) * 8
    bp = _round_up(b_sz, tile_b)

    gp = _pad_axis(g.astype(jnp.float32)[:, None, :], bp, 0)
    memp = _pad_axis(_pad_axis(mem, tkp, 1), bp, 0)
    decp = _pad_axis(dec[:, None, :], bp, 0)
    logdtp = _pad_axis(_pad_axis(logdt, tkp, 1)[:, None, :], bp, 0)
    gate = [_pad_axis(x, tkp, 1).astype(jnp.float32)
            for x in (w1, b1, wo1, wo2, bo)]
    klen = _pad_axis(key_len.astype(jnp.int32)[:, None, None], bp, 0)
    qmp = _pad_axis(qmask.astype(jnp.float32)[:, None, None], bp, 0)

    row3 = lambda t, dd: pl.BlockSpec((tile_b, t, dd),  # noqa: E731
                                      lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    full = lambda *sh: pl.BlockSpec(sh, lambda i: (0,) * len(sh),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    col2 = row3(1, 1)
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((bp, tkp, d), f32),      # dmem
        jax.ShapeDtypeStruct((bp, 1, d), f32),        # ddec
        jax.ShapeDtypeStruct((n_hops, d, d), f32),    # dwq
        jax.ShapeDtypeStruct((n_hops, d), f32),       # dbq
        jax.ShapeDtypeStruct((n_hops, d, d), f32),    # dwk
        jax.ShapeDtypeStruct((n_hops, d), f32),       # dbk
        jax.ShapeDtypeStruct((n_hops, d, d), f32),    # dwv
        jax.ShapeDtypeStruct((n_hops, d), f32),       # dbv
        jax.ShapeDtypeStruct((n_hops, d, d), f32),    # dwt
        jax.ShapeDtypeStruct((n_hops, tkp), f32),     # dw1
        jax.ShapeDtypeStruct((n_hops, tkp), f32),     # db1
        jax.ShapeDtypeStruct((n_hops, tkp), f32),     # dwo1
        jax.ShapeDtypeStruct((n_hops, tkp), f32),     # dwo2
        jax.ShapeDtypeStruct((n_hops, tkp), f32),     # dbo
        jax.ShapeDtypeStruct((n_hops, d), f32),       # dlng
        jax.ShapeDtypeStruct((n_hops, d), f32),       # dlnb
    )
    res = pl.pallas_call(
        functools.partial(_readout_bwd_kernel, n_hops, scale),
        grid=(bp // tile_b,),
        in_specs=[
            row3(1, d), row3(tkp, d), row3(1, d), row3(1, tkp),
            col2, col2,
            full(n_hops, d, d), full(n_hops, d),
            full(n_hops, d, d), full(n_hops, d),
            full(n_hops, d, d), full(n_hops, d),
            full(n_hops, d, d),
            full(n_hops, tkp), full(n_hops, tkp),
            full(n_hops, tkp), full(n_hops, tkp), full(n_hops, tkp),
            full(n_hops, d), full(n_hops, d),
        ],
        out_specs=(
            row3(tkp, d), row3(1, d),
            full(n_hops, d, d), full(n_hops, d),
            full(n_hops, d, d), full(n_hops, d),
            full(n_hops, d, d), full(n_hops, d),
            full(n_hops, d, d),
            full(n_hops, tkp), full(n_hops, tkp),
            full(n_hops, tkp), full(n_hops, tkp), full(n_hops, tkp),
            full(n_hops, d), full(n_hops, d),
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=6 * b_sz * n_hops * tkp * d * (3 * d + 8),
            bytes_accessed=6 * b_sz * tkp * d,
            transcendentals=b_sz * n_hops * tkp * 8,
        ),
        interpret=jax.default_backend() != "tpu",
    )(gp, memp, decp, logdtp, klen, qmp, wq, bq, wk, bk, wv, bv, wt,
      *gate, lng, lnb)
    (dmem, ddec, dwq, dbq, dwk, dbk, dwv, dbv, dwt,
     dw1, db1, dwo1, dwo2, dbo, dlng, dlnb) = res
    cutL = lambda x: x[:, :tk]  # noqa: E731
    return (cutL(dmem[:b_sz]), ddec[:b_sz, 0, :],
            dwq, dbq, dwk, dbk, dwv, dbv, dwt,
            cutL(dw1), cutL(db1), cutL(dwo1), cutL(dwo2), cutL(dbo),
            dlng, dlnb)


@jax.custom_vjp
def fused_readout(mem, dec, logdt, key_len, qmask, wq, bq, wk, bk, wv, bv,
                  wt, w1, b1, wo1, wo2, bo, lng, lnb):
    """mem [B,L,d]; dec [B,d]; logdt [B,L] (=log1p|t_q-t_k|);
    key_len [B]; qmask [B] (1.0/0.0 — the Tq=1 query mask: a 0 row keeps
    only residual+normalize per hop); stacked per-hop params: w* [n,d,d],
    b* [n,d], gate rows [n,L], ln [n,d].  Returns the final hop's output
    [B,d] (f32)."""
    return _readout_fwd(mem, dec, logdt, key_len, qmask, wq, bq, wk, bk,
                        wv, bv, wt, w1, b1, wo1, wo2, bo, lng, lnb)


def _fr_fwd(*args):
    return _readout_fwd(*args), args


def _fr_bwd(residuals, g):
    (mem, dec, logdt, key_len, qmask, wq, bq, wk, bk, wv, bv, wt,
     w1, b1, wo1, wo2, bo, lng, lnb) = residuals
    (dmem, ddec, dwq, dbq, dwk, dbk, dwv, dbv, dwt,
     dw1, db1, dwo1, dwo2, dbo, dlng, dlnb) = _readout_bwd(
        g, mem, dec, logdt, key_len, qmask, wq, bq, wk, bk, wv, bv, wt,
        w1, b1, wo1, wo2, bo, lng, lnb)
    return (dmem.astype(mem.dtype), ddec.astype(dec.dtype),
            jnp.zeros_like(logdt), jnp.zeros_like(key_len),
            jnp.zeros_like(qmask),
            dwq.astype(wq.dtype), dbq.astype(bq.dtype),
            dwk.astype(wk.dtype), dbk.astype(bk.dtype),
            dwv.astype(wv.dtype), dbv.astype(bv.dtype),
            dwt.astype(wt.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dwo1.astype(wo1.dtype), dwo2.astype(wo2.dtype),
            dbo.astype(bo.dtype),
            dlng.astype(lng.dtype), dlnb.astype(lnb.dtype))


fused_readout.defvjp(_fr_fwd, _fr_bwd)


def supported(tk_len: int, num_heads: int) -> bool:
    return num_heads == 1 and tk_len <= MAX_KEYS

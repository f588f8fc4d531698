"""Sequential-chain readout kernel (Pallas TPU) — round-5, attempt 4.

The MTAM decoder readout (`/root/reference/Model/MTAMRec_model.py:84-91`
driving `Model/Modules/time_aware_attention.py:215-456` at Tq=1) costs
~23 ms per 100-step superstep call on the jnp path at the reference
shapes — almost entirely per-op dispatch overhead of the ~15-op/hop
sequential query chain and its autodiff backward (docs/PERFORMANCE.md).

Three previous kernels lost at L=50 because they moved the MEMORY-side
projections (K/V/tqk precursors — the actual FLOPs) into the kernel and
then paid to recompute them in the backward (ops/pallas/readout_kernel.py
wins only at L >= 256 where HBM traffic dominates).  This kernel splits
the work the other way:

  * XLA keeps the hop-batched projections `k_all`/`v_all`/`tprec` and
    the interval half of the gate (`gate_part`) — big MXU matmuls,
    computed ONCE, with residuals saved by XLA's own AD;
  * the kernel fuses ONLY the sequential chain: per hop
        q     = relu(cur @ Wq_i + bq_i)
        s0    = q . K_i^T          tqk = tanh(cur . tprec_i^T)
        gate  = gate_part_i + wo2_i * tqk
        s     = key-masked s0 * sigmoid(gate) / sqrt(d)
        cur   = LN_i(softmax(s) @ V_i * qz + cur)
    — tiny VPU/MXU ops whose jnp form costs a fusion boundary each —
    and its hand-written backward (one kernel per direction, recomputing
    the cheap within-hop intermediates from the saved [n, B, d] cur
    chain).

Cotangents for `k_all`/`v_all`/`tprec`/`gate_part` leave the backward
kernel as plain outputs, so XLA's AD carries them through the big
einsums exactly as on the jnp path.  kind='time', num_heads=1 (every
reference preset), no attention dropout (the reference disables it on
the time readout, time_aware_attention.py:440).

Grids: forward (batch_tiles, n_hops) with the hop axis minor, `cur`
carried in VMEM scratch; backward a 1-D (batch_tiles,) grid with the
reversed hop loop INSIDE the kernel, so the hop-indexed param-gradient
blocks are constant-indexed and revisited CONSECUTIVELY across grid
steps — the only output-revisit pattern Pallas TPU supports.  They are
zero-initialised at batch tile 0 IN EVERY BRANCH (hardware gives
uninitialised blocks; interpret mode zero-fills and would hide the
bug).

MEASURED at the reference shapes (steps_r5chain.json): LOSES to the
hop-batched jnp readout (123.2 vs 92.9 ms per 100-step MTAM superstep)
— the ~29 MB/step of operand+cotangent staging exceeds the dispatch
overhead removed.  Kept opt-in (attention.READOUT_CHAIN_OPT_IN) as the
fourth and final structure tried; hardware grad parity <=8.1e-4
(hw_parity 'chain').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_FILL = -(2.0 ** 32) + 1.0
_TILE_B = 128       # forward batch tile
_TILE_B_BWD = 8     # backward holds ALL hops' k/v/tprec blocks AND their
                    # cotangent outputs per tile (1-D grid, hop loop
                    # in-kernel) — sized for the 16 MB scoped-VMEM limit
                    # in f32 at n_hops<=8
MAX_KEYS = 256     # short-memory regime only; past this the fused
                   # whole-readout kernel (readout_kernel.py) takes over


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hop_fwd(cur, k, v, tprec, gate_part, wo2, wq, bq, lng, lnb,
             mask, qz, scale, in_dtype):
    """One hop's forward for a [TB] batch tile; cur: [TB, d] f32.
    Returns (cur_next, saved)."""
    cur_c = cur.astype(in_dtype)
    q = jax.nn.relu(
        jnp.dot(cur_c, wq, preferred_element_type=jnp.float32)
        + bq.astype(jnp.float32))                                # [TB, d]
    s0 = jnp.sum(q[:, None, :] * k.astype(jnp.float32), axis=2)  # [TB, L]
    tqk = jnp.tanh(jnp.sum(cur[:, None, :] * tprec.astype(jnp.float32),
                           axis=2))                              # [TB, L]
    gate = gate_part.astype(jnp.float32) \
        + wo2.astype(jnp.float32) * tqk                          # [TB, L]
    sig = jax.nn.sigmoid(gate)
    s = jnp.where(mask, s0 * sig * scale, NEG_FILL)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    w = e / jnp.sum(e, axis=1, keepdims=True)                    # [TB, L]
    o = jnp.sum(w[:, :, None] * v.astype(jnp.float32), axis=1) * qz
    x = o + cur
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
    inv = 1.0 / jnp.sqrt(var + 1e-8)         # attention normalize() eps
    xh = (x - mu) * inv
    cur_next = xh * lng.astype(jnp.float32) + lnb.astype(jnp.float32)
    return cur_next, (q, s0, tqk, sig, w, xh, inv)


def _chain_fwd_kernel(n_hops: int, scale: float,
                      dec_ref, klen_ref, qz_ref, k_ref, v_ref, t_ref,
                      gp_ref, wo2_ref, wq_ref, bq_ref, lng_ref, lnb_ref,
                      out_ref, curs_ref, cur_scr):
    hop = pl.program_id(1)
    in_dtype = k_ref.dtype

    @pl.when(hop == 0)
    def _init():
        cur_scr[...] = dec_ref[...][:, 0, :].astype(jnp.float32)

    cur = cur_scr[...]
    curs_ref[...] = cur[None]        # the hop-INPUT chain (bwd residual)
    tl = k_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tl), 1)
    mask = col < klen_ref[...]                                  # [TB,1] bc
    qz = qz_ref[...].astype(jnp.float32)                        # [TB, 1]
    cur_next, _ = _hop_fwd(
        cur, k_ref[...][0], v_ref[...][0], t_ref[...][0], gp_ref[...][0],
        wo2_ref[...][0], wq_ref[...][0], bq_ref[...][0, 0],
        lng_ref[...][0, 0], lnb_ref[...][0, 0], mask, qz, scale, in_dtype)
    cur_scr[...] = cur_next

    @pl.when(hop == n_hops - 1)
    def _emit():
        out_ref[...] = cur_next[:, None, :].astype(out_ref.dtype)


def _chain_bwd_kernel(n_hops: int, scale: float,
                      g_ref, klen_ref, qz_ref, k_ref, v_ref, t_ref,
                      gp_ref, wo2_ref, wq_ref, bq_ref, lng_ref, lnb_ref,
                      curs_ref,
                      ddec_ref, dk_ref, dv_ref, dt_ref, dgp_ref,
                      dwo2_ref, dwq_ref, dbq_ref, dlng_ref, dlnb_ref):
    """1-D grid over batch tiles; the reversed hop loop runs INSIDE the
    kernel so the hop-indexed param-gradient blocks are full-array,
    constant-indexed, and revisited CONSECUTIVELY across grid steps —
    the only output-revisit pattern Pallas TPU supports (the first cut
    used a (batch, hop) grid whose hop-indexed param blocks were
    revisited non-consecutively; hardware happened to refetch them, but
    the pattern is unsupported and jax's strict interpret checker
    rejects it)."""
    bt = pl.program_id(0)
    in_dtype = k_ref.dtype

    # param-grad blocks accumulate across batch tiles: zero them on the
    # first tile IN EVERY BRANCH (uninitialised memory on hardware)
    @pl.when(bt == 0)
    def _zero_params():
        for ref in (dwo2_ref, dwq_ref, dbq_ref, dlng_ref, dlnb_ref):
            ref[...] = jnp.zeros_like(ref)

    tl = k_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tl), 1)
    mask = col < klen_ref[...]
    qz = qz_ref[...].astype(jnp.float32)
    dcur = g_ref[...][:, 0, :].astype(jnp.float32)               # [TB, d]

    for i in range(n_hops - 1, -1, -1):
        cur = curs_ref[...][i]                                   # [TB, d]
        k = k_ref[...][i]
        v = v_ref[...][i]
        tprec = t_ref[...][i]
        wq = wq_ref[...][i]
        wo2 = wo2_ref[...][i, 0].astype(jnp.float32)             # [tl]
        lng = lng_ref[...][i, 0].astype(jnp.float32)

        _, saved = _hop_fwd(cur, k, v, tprec, gp_ref[...][i],
                            wo2_ref[...][i], wq, bq_ref[...][i, 0],
                            lng_ref[...][i, 0], lnb_ref[...][i, 0],
                            mask, qz, scale, in_dtype)
        q, s0, tqk, sig, w, xh, inv = saved

        g = dcur
        # layer-norm backward (normalize(): (x-mu)*inv*gamma + beta)
        dlng_ref[i] += jnp.sum(g * xh, axis=0)[None]
        dlnb_ref[i] += jnp.sum(g, axis=0)[None]
        dxh = g * lng
        dx = (dxh - jnp.mean(dxh, axis=1, keepdims=True)
              - xh * jnp.mean(dxh * xh, axis=1, keepdims=True)) * inv
        do = dx * qz
        dcur = dx                                 # residual branch
        # o = sum_l w * V
        dw = jnp.sum(do[:, None, :] * v.astype(jnp.float32), axis=2)
        dv_ref[i] = (w[:, :, None] * do[:, None, :]).astype(dv_ref.dtype)
        # softmax transpose (masked cols have w == 0 -> ds == 0)
        ds = w * (dw - jnp.sum(dw * w, axis=1, keepdims=True))
        dgate = ds * s0 * scale * sig * (1.0 - sig)
        ds0 = ds * sig * scale
        dgp_ref[i] = dgate.astype(dgp_ref.dtype)
        dwo2_ref[i] += jnp.sum(dgate * tqk, axis=0)[None]
        dtqk = dgate * wo2
        dpre = dtqk * (1.0 - tqk * tqk)                          # [TB, L]
        dt_ref[i] = (dpre[:, :, None] * cur[:, None, :]
                     ).astype(dt_ref.dtype)
        dcur = dcur + jnp.sum(dpre[:, :, None] * tprec.astype(jnp.float32),
                              axis=1)
        # s0 = q . K^T
        dq = jnp.sum(ds0[:, :, None] * k.astype(jnp.float32), axis=1)
        dk_ref[i] = (ds0[:, :, None] * q[:, None, :]).astype(dk_ref.dtype)
        dq_pre = jnp.where(q > 0.0, dq, 0.0).astype(in_dtype)
        dcur = dcur + jax.lax.dot_general(
            dq_pre, wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwq_ref[i] += jax.lax.dot_general(
            cur.astype(in_dtype), dq_pre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbq_ref[i] += jnp.sum(dq_pre.astype(jnp.float32), axis=0)[None]

    ddec_ref[...] = dcur[:, None, :].astype(ddec_ref.dtype)


def _pad_b(x, b_pad, axis):
    pad = b_pad - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def readout_chain(dec, klen, qz, k_all, v_all, tprec, gate_part, wo2,
                  wq, bq, lng, lnb):
    """dec: [B, 1, d]; k_all/v_all/tprec: [n, B, L, d];
    gate_part: [n, B, L]; wo2: [n, L]; wq: [n, d, d]; bq/lng/lnb: [n, d].
    Returns [B, d]."""
    out, _ = _chain_fwd(dec, klen, qz, k_all, v_all, tprec, gate_part,
                        wo2, wq, bq, lng, lnb)
    return out


@jax.jit
def _chain_fwd(dec, klen, qz, k_all, v_all, tprec, gate_part, wo2,
               wq, bq, lng, lnb):
    n, b, tl, d = k_all.shape
    b_pad = _round_up(b, _TILE_B)
    dec_p = _pad_b(dec, b_pad, 0)               # dec batch axis is 0
    k_p, v_p, t_p, gp_p = (_pad_b(x, b_pad, 1) for x in
                           (k_all, v_all, tprec, gate_part))
    klen_p = _pad_b(klen.astype(jnp.int32)[:, None], b_pad, 0)
    qz_p = _pad_b(qz.astype(jnp.float32)[:, None], b_pad, 0)
    grid = (b_pad // _TILE_B, n)
    wo2_r, bq_r, lng_r, lnb_r = (x[:, None, :] for x in (wo2, bq, lng, lnb))
    bspec3 = lambda: pl.BlockSpec((1, _TILE_B, tl, d),  # noqa: E731
                                  lambda bt, h: (h, bt, 0, 0))
    out, curs = pl.pallas_call(
        functools.partial(_chain_fwd_kernel, n, 1.0 / (d ** 0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_B, 1, d), lambda bt, h: (bt, 0, 0)),  # dec
            pl.BlockSpec((_TILE_B, 1), lambda bt, h: (bt, 0)),   # klen
            pl.BlockSpec((_TILE_B, 1), lambda bt, h: (bt, 0)),   # qz
            bspec3(), bspec3(), bspec3(),                        # k, v, t
            pl.BlockSpec((1, _TILE_B, tl), lambda bt, h: (h, bt, 0)),
            pl.BlockSpec((1, 1, tl), lambda bt, h: (h, 0, 0)),   # wo2
            pl.BlockSpec((1, d, d), lambda bt, h: (h, 0, 0)),    # wq
            pl.BlockSpec((1, 1, d), lambda bt, h: (h, 0, 0)),    # bq
            pl.BlockSpec((1, 1, d), lambda bt, h: (h, 0, 0)),    # lng
            pl.BlockSpec((1, 1, d), lambda bt, h: (h, 0, 0)),    # lnb
        ],
        out_specs=[
            pl.BlockSpec((_TILE_B, 1, d), lambda bt, h: (bt, 0, 0)),
            pl.BlockSpec((1, _TILE_B, d), lambda bt, h: (h, bt, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 1, d), dec.dtype),
            jax.ShapeDtypeStruct((n, b_pad, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_TILE_B, d), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(dec_p, klen_p, qz_p, k_p, v_p, t_p, gp_p, wo2_r, wq, bq_r,
      lng_r, lnb_r)
    return out[:b, 0, :], curs[:, :b, :]


def _rc_fwd(dec, klen, qz, k_all, v_all, tprec, gate_part, wo2,
            wq, bq, lng, lnb):
    out, curs = _chain_fwd(dec, klen, qz, k_all, v_all, tprec, gate_part,
                           wo2, wq, bq, lng, lnb)
    return out, (dec, klen, qz, k_all, v_all, tprec, gate_part, wo2,
                 wq, bq, lng, lnb, curs)


@jax.jit
def _chain_bwd_impl(g, klen, qz, k_all, v_all, tprec, gate_part, wo2,
                    wq, bq, lng, lnb, curs):
    n, b, tl, d = k_all.shape
    b_pad = _round_up(b, _TILE_B_BWD)
    k_p, v_p, t_p, gp_p = (_pad_b(x, b_pad, 1) for x in
                           (k_all, v_all, tprec, gate_part))
    curs_p = _pad_b(curs, b_pad, 1)
    g_p = _pad_b(g[:, None, :], b_pad, 0)
    klen_p = _pad_b(klen.astype(jnp.int32)[:, None], b_pad, 0)
    qz_p = _pad_b(qz.astype(jnp.float32)[:, None], b_pad, 0)
    grid = (b_pad // _TILE_B_BWD,)
    wo2_r, bq_r, lng_r, lnb_r = (x[:, None, :] for x in (wo2, bq, lng, lnb))
    tile4 = lambda: pl.BlockSpec((n, _TILE_B_BWD, tl, d),  # noqa: E731
                                 lambda bt: (0, bt, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_chain_bwd_kernel, n, 1.0 / (d ** 0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_B_BWD, 1, d), lambda bt: (bt, 0, 0)),  # g
            pl.BlockSpec((_TILE_B_BWD, 1), lambda bt: (bt, 0)),
            pl.BlockSpec((_TILE_B_BWD, 1), lambda bt: (bt, 0)),
            tile4(), tile4(), tile4(),                           # k, v, t
            pl.BlockSpec((n, _TILE_B_BWD, tl), lambda bt: (0, bt, 0)),
            pl.BlockSpec((n, 1, tl), lambda bt: (0, 0, 0)),      # wo2
            pl.BlockSpec((n, d, d), lambda bt: (0, 0, 0)),       # wq
            pl.BlockSpec((n, 1, d), lambda bt: (0, 0, 0)),       # bq
            pl.BlockSpec((n, 1, d), lambda bt: (0, 0, 0)),       # lng
            pl.BlockSpec((n, 1, d), lambda bt: (0, 0, 0)),       # lnb
            pl.BlockSpec((n, _TILE_B_BWD, d), lambda bt: (0, bt, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_B_BWD, 1, d), lambda bt: (bt, 0, 0)),
            tile4(), tile4(), tile4(),                           # dk/dv/dt
            pl.BlockSpec((n, _TILE_B_BWD, tl), lambda bt: (0, bt, 0)),
            pl.BlockSpec((n, 1, tl), lambda bt: (0, 0, 0)),
            pl.BlockSpec((n, d, d), lambda bt: (0, 0, 0)),
            pl.BlockSpec((n, 1, d), lambda bt: (0, 0, 0)),
            pl.BlockSpec((n, 1, d), lambda bt: (0, 0, 0)),
            pl.BlockSpec((n, 1, d), lambda bt: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 1, d), g.dtype),
            jax.ShapeDtypeStruct((n, b_pad, tl, d), k_all.dtype),
            jax.ShapeDtypeStruct((n, b_pad, tl, d), v_all.dtype),
            jax.ShapeDtypeStruct((n, b_pad, tl, d), tprec.dtype),
            jax.ShapeDtypeStruct((n, b_pad, tl), gate_part.dtype),
            jax.ShapeDtypeStruct((n, 1, tl), jnp.float32),
            jax.ShapeDtypeStruct((n, d, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, d), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(g_p, klen_p, qz_p, k_p, v_p, t_p, gp_p, wo2_r, wq, bq_r,
      lng_r, lnb_r, curs_p)
    ddec, dk, dv, dt, dgp, dwo2, dwq, dbq, dlng, dlnb = outs
    return (ddec[:b], dk[:, :b], dv[:, :b], dt[:, :b], dgp[:, :b],
            dwo2[:, 0], dwq, dbq[:, 0], dlng[:, 0], dlnb[:, 0])


def _rc_bwd(res, g):
    (dec, klen, qz, k_all, v_all, tprec, gate_part, wo2,
     wq, bq, lng, lnb, curs) = res
    (ddec, dk, dv, dt, dgp, dwo2, dwq, dbq, dlng, dlnb) = _chain_bwd_impl(
        g, klen, qz, k_all, v_all, tprec, gate_part, wo2, wq, bq, lng,
        lnb, curs)
    return (ddec.astype(dec.dtype), None, None, dk, dv, dt, dgp,
            dwo2.astype(wo2.dtype), dwq.astype(wq.dtype),
            dbq.astype(bq.dtype), dlng.astype(lng.dtype),
            dlnb.astype(lnb.dtype))


readout_chain.defvjp(_rc_fwd, _rc_bwd)


def supported(tk_len: int, num_heads: int) -> bool:
    return num_heads == 1 and tk_len <= MAX_KEYS

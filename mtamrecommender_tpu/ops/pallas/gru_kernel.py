"""Fused (time-aware) GRU sequence-scan kernel (Pallas TPU).

One kernel runs the ENTIRE recurrence for a tile of batch rows: the
hidden state lives in VMEM registers across all L steps instead of
round-tripping through HBM per `lax.scan` iteration, and the per-step
gate math (sigmoid/tanh/relu chains of
`/root/reference/Model/Modules/time_aware_rnn.py`) fuses with the
state matmuls.  All input-dependent projections (gate_x, cand_x and the
per-step time features) are precomputed OUTSIDE as single large MXU
matmuls, exactly as in the jnp reference path (ops/time_gru.py) — the
kernel only keeps the state-dependent part.

Cell modes (same math as ops/time_gru.py, parity-tested):
  plain    new_h = u*h + (1-u)*c
  tseqrec  new_h = u*h*e1[t] + (1-u)*c*e2[t]          (e1=sig_now, e2=sig_last)
  tgru     weight = relu(e1[t] + h*v0); ts = sigmoid(v1*weight + v2*e2[t] + v3)
           new_h = u*h + (1-u)*c*ts                    (e2=relu score)

dynamic_rnn length semantics are preserved: for t >= length the output is
zero and the carried state freezes.

Layout is time-major [L, B, u] so each step reads one contiguous [TB, u]
tile; the grid walks batch tiles and Pallas double-buffers the HBM->VMEM
streams across tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# batch rows per grid program.  [TB, u] x [u, 2u] state matmuls use TB of
# the MXU's 128 rows, so bigger tiles raise MXU row utilization — VMEM
# bounds them.  Since round 5 BOTH directions stream the time axis in
# _TIME_CHUNK-step blocks (2-D grid: batch tiles x time chunks, carried
# state/cotangent in persistent scratch), so the footprint is O(TC*TB)
# instead of O(L*TB) and both run the MXU's full 128 rows at any
# practical L (the round-1 whole-sequence forms were VMEM-capped at
# TB=32 bwd / TB=64 fwd and refused L=2048 outright).
_TILE_B_FWD = 128
_TILE_B_BWD = 128
_TIME_CHUNK = 8


def seq_supported(seq_len: int, units: int, itemsize: int) -> bool:
    """Both directions stream the time axis in _TIME_CHUNK blocks
    (round 5 — the forward previously held whole-sequence [L,TB,*]
    blocks, which capped it at TB=64 and failed to compile at L=2048),
    so VMEM is O(TC*TB) and any practical length fits; the cap below is
    a sanity bound, not a measured limit."""
    del units, itemsize
    return seq_len <= (1 << 15)


def _gru_scan_kernel(mode: str, time_chunk: int, units: int,
                     gx_ref, cx_ref, e1_ref, e2_ref, len_ref, h0_ref,
                     wgh_ref, wch_ref, bg_ref, bc_ref, vec_ref, out_ref,
                     h_scr):
    """Forward scan, time axis STREAMED in chunks (round 5; mirrors the
    backward's layout).  Grid = (batch tiles, time chunks), time minor:
    each tile's chunks run consecutively with the carried state h in
    persistent VMEM scratch, so the VMEM footprint is O(TC*TB) instead
    of O(L*TB) — the batch tile reaches the MXU's full 128 rows (the
    whole-sequence round-1 form was VMEM-capped at TB=64, which wasted
    half the MXU's rows on every state matmul AND refused long
    sequences outright: L=2048 bf16 asked 160 MB of vmem)."""
    in_dtype = gx_ref.dtype   # f32 or bf16 (mixed precision)
    wgh = wgh_ref[:]          # [u, 2u]
    wch = wch_ref[:]          # [u, u]
    bg = bg_ref[:].astype(jnp.float32)    # [1, 2u]
    bc = bc_ref[:].astype(jnp.float32)    # [1, u]
    vec = vec_ref[:].astype(jnp.float32)  # [4, u]
    lengths = len_ref[:]      # [TB, 1] int32
    ct = pl.program_id(1)

    @pl.when(ct == 0)
    def _seed():
        h_scr[...] = h0_ref[:].astype(jnp.float32)

    t_base = ct * time_chunk

    def step(t, h):
        # h carries in f32; MXU operands use the input dtype
        gx = gx_ref[t].astype(jnp.float32)   # [TB, 2u]
        cx = cx_ref[t].astype(jnp.float32)   # [TB, u]
        h_op = h.astype(in_dtype)
        gates = jax.nn.sigmoid(
            gx + jnp.dot(h_op, wgh, preferred_element_type=jnp.float32) + bg)
        r = gates[:, :units]
        u = gates[:, units:]
        cand = jnp.tanh(
            cx + jnp.dot((r * h).astype(in_dtype), wch,
                         preferred_element_type=jnp.float32) + bc)
        if mode == "plain":
            new_h = u * h + (1.0 - u) * cand
        elif mode == "tseqrec":
            new_h = (u * h * e1_ref[t].astype(jnp.float32)
                     + (1.0 - u) * cand * e2_ref[t].astype(jnp.float32))
        else:  # tgru
            weight = jnp.maximum(e1_ref[t].astype(jnp.float32)
                                 + h * vec[0:1, :], 0.0)
            t_state = jax.nn.sigmoid(vec[1:2, :] * weight
                                     + vec[2:3, :] * e2_ref[t].astype(jnp.float32)
                                     + vec[3:4, :])
            new_h = u * h + (1.0 - u) * cand * t_state
        alive = t_base + t < lengths   # [TB,1] bool, GLOBAL time
        out_ref[t] = jnp.where(alive, new_h, 0.0)
        return jnp.where(alive, new_h, h)

    h_scr[...] = jax.lax.fori_loop(0, time_chunk, step, h_scr[...])


@functools.partial(jax.jit, static_argnames=("mode",))
def gru_scan(mode: str, gate_x, cand_x, e1, e2, lengths, h0,
             w_gate_h, w_cand_h, b_gate, b_cand, cell_vecs):
    """gate_x: [B,L,2u]; cand_x,e1,e2: [B,L,u]; lengths: [B]; h0: [B,u];
    cell_vecs: [4,u] (tgru) or zeros.  Returns outputs [B,L,u]."""
    b_sz, seq_len, u2 = gate_x.shape
    units = u2 // 2
    tile_b = min(_round_up(b_sz, 8), _TILE_B_FWD)
    bp = _round_up(b_sz, tile_b)
    n_tiles = bp // tile_b
    tc = min(_TIME_CHUNK, seq_len)
    lp = _round_up(seq_len, tc)

    def prep(x):  # [B,L,f] -> padded time-major [Lp,Bp,f]
        x = jnp.transpose(x, (1, 0, 2))
        return jnp.pad(x, ((0, lp - seq_len), (0, bp - b_sz), (0, 0)))

    gx, cx, e1p, e2p = prep(gate_x), prep(cand_x), prep(e1), prep(e2)
    lens = jnp.pad(lengths.astype(jnp.int32), (0, bp - b_sz))[:, None]
    h0p = jnp.pad(h0, ((0, bp - b_sz), (0, 0)))

    tm = lambda f: pl.BlockSpec((tc, tile_b, f), lambda i, c: (c, i, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    w = lambda r, c_: pl.BlockSpec((r, c_), lambda i, c: (0, 0),  # noqa: E731
                                   memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_gru_scan_kernel, mode, tc, units),
        grid=(n_tiles, lp // tc),
        in_specs=[
            tm(2 * units), tm(units), tm(units), tm(units),
            pl.BlockSpec((tile_b, 1), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, units), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            w(units, 2 * units), w(units, units), w(1, 2 * units),
            w(1, units), w(4, units),
        ],
        out_specs=tm(units),
        out_shape=jax.ShapeDtypeStruct((lp, bp, units), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_b, units), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * seq_len * units * 3 * units,
            bytes_accessed=4 * bp * seq_len * 5 * units,
            transcendentals=bp * seq_len * 3 * units,
        ),
        interpret=jax.default_backend() != "tpu",
    )(gx, cx, e1p, e2p, lens, h0p,
      w_gate_h, w_cand_h, b_gate[None, :], b_cand[None, :], cell_vecs)
    return jnp.transpose(out[:seq_len, :b_sz, :], (1, 0, 2))


def _gru_scan_bwd_kernel(mode: str, n_time_chunks: int, time_chunk: int,
                         units: int,
                         g_ref, out_ref_in, gx_ref, cx_ref, e1_ref, e2_ref,
                         len_ref, hb_ref, wgh_ref, wch_ref, bg_ref, bc_ref,
                         vec_ref,
                         dgx_ref, dcx_ref, de1_ref, de2_ref, dh0_ref,
                         dwgh_ref, dwch_ref, dbg_ref, dbc_ref, dvec_ref,
                         dh_scr):
    """Fused reverse-time backward, time axis STREAMED in chunks.

    Grid = (batch tiles, reversed time chunks): grid step (i, ct)
    processes physical time chunk n_time_chunks-1-ct of batch tile i, so
    each tile's chunks run consecutively and the carried cotangent dh
    lives in a persistent VMEM scratch across them.  Gates/candidates are
    RECOMPUTED from the saved forward outputs (h_{t-1} = out[t-1];
    hb_ref holds each chunk's boundary state — out[chunk_start-1], or h0
    for the first chunk — valid because `alive` is a prefix).  Weight
    cotangents accumulate in VMEM-resident output blocks across the whole
    grid.  This replaces the jnp backward's two extra 50-iteration
    lax.scans (forward replay inside jax.vjp + the reverse scan), which
    profiling showed were pure per-op overhead (~0.5us x ~48 ops x L per
    step); streaming keeps VMEM at O(TC*TB) so TB reaches the MXU's full
    128 rows."""
    in_dtype = gx_ref.dtype
    wgh = wgh_ref[:]
    wch = wch_ref[:]
    bg = bg_ref[:].astype(jnp.float32)
    bc = bc_ref[:].astype(jnp.float32)
    vec = vec_ref[:].astype(jnp.float32)
    lengths = len_ref[:]      # [TB, 1] int32
    ct = pl.program_id(1)
    phys_chunk = n_time_chunks - 1 - ct
    t_base = phys_chunk * time_chunk

    @pl.when((pl.program_id(0) == 0) & (ct == 0))
    def _init_weight_grads():
        dwgh_ref[:] = jnp.zeros_like(dwgh_ref)
        dwch_ref[:] = jnp.zeros_like(dwch_ref)
        dbg_ref[:] = jnp.zeros_like(dbg_ref)
        dbc_ref[:] = jnp.zeros_like(dbc_ref)
        dvec_ref[:] = jnp.zeros_like(dvec_ref)

    @pl.when(ct == 0)
    def _reset_carry():   # new batch tile: cotangent chain restarts
        dh_scr[:] = jnp.zeros_like(dh_scr)

    def step(i, dh):
        t = time_chunk - 1 - i              # local index within the chunk
        h_prev = jnp.where(t == 0, hb_ref[0].astype(jnp.float32),
                           out_ref_in[jnp.maximum(t - 1, 0)]
                           .astype(jnp.float32))
        gx = gx_ref[t].astype(jnp.float32)
        cx = cx_ref[t].astype(jnp.float32)
        # --- recompute the forward step (same math as _gru_scan_kernel) ---
        h_op = h_prev.astype(in_dtype)
        gates = jax.nn.sigmoid(
            gx + jnp.dot(h_op, wgh, preferred_element_type=jnp.float32) + bg)
        r = gates[:, :units]
        u = gates[:, units:]
        rh = r * h_prev
        cand = jnp.tanh(
            cx + jnp.dot(rh.astype(in_dtype), wch,
                         preferred_element_type=jnp.float32) + bc)
        alive = t_base + t < lengths            # [TB,1], GLOBAL time
        d_new = jnp.where(alive, g_ref[t].astype(jnp.float32) + dh, 0.0)
        # --- cell-mode head ---
        if mode == "plain":
            du = d_new * (h_prev - cand)
            dh_next = d_new * u
            dc = d_new * (1.0 - u)
            de1 = jnp.zeros_like(dc)
            de2 = jnp.zeros_like(dc)
        elif mode == "tseqrec":
            e1t = e1_ref[t].astype(jnp.float32)
            e2t = e2_ref[t].astype(jnp.float32)
            du = d_new * (h_prev * e1t - cand * e2t)
            dh_next = d_new * u * e1t
            dc = d_new * (1.0 - u) * e2t
            de1 = d_new * u * h_prev
            de2 = d_new * (1.0 - u) * cand
        else:  # tgru
            e1t = e1_ref[t].astype(jnp.float32)
            e2t = e2_ref[t].astype(jnp.float32)
            pre = e1t + h_prev * vec[0:1, :]
            w = jnp.maximum(pre, 0.0)
            ts = jax.nn.sigmoid(vec[1:2, :] * w + vec[2:3, :] * e2t
                                + vec[3:4, :])
            du = d_new * (h_prev - cand * ts)
            dh_next = d_new * u
            dc = d_new * (1.0 - u) * ts
            dts = d_new * (1.0 - u) * cand
            dz = dts * ts * (1.0 - ts)
            dw = dz * vec[1:2, :]
            m = (pre > 0.0).astype(jnp.float32)
            de1 = dw * m
            de2 = dz * vec[2:3, :]
            dh_next = dh_next + dw * m * vec[0:1, :]
            dvec_ref[0:1, :] += jnp.sum(dw * m * h_prev, axis=0,
                                        keepdims=True)
            dvec_ref[1:2, :] += jnp.sum(dz * w, axis=0, keepdims=True)
            dvec_ref[2:3, :] += jnp.sum(dz * e2t, axis=0, keepdims=True)
            dvec_ref[3:4, :] += jnp.sum(dz, axis=0, keepdims=True)
        # --- candidate path ---
        dac = dc * (1.0 - cand * cand)
        dcx_ref[t] = dac
        dbc_ref[:] += jnp.sum(dac, axis=0, keepdims=True)
        d_rh = jnp.dot(dac.astype(in_dtype), wch.T,
                       preferred_element_type=jnp.float32)
        dwch_ref[:] += jnp.dot(rh.astype(in_dtype).T,
                               dac.astype(in_dtype),
                               preferred_element_type=jnp.float32)
        dr = d_rh * h_prev
        dh_next = dh_next + d_rh * r
        # --- gate path ---
        dgates = (jnp.concatenate([dr, du], axis=1)
                  * gates * (1.0 - gates))
        dgx_ref[t] = dgates
        dbg_ref[:] += jnp.sum(dgates, axis=0, keepdims=True)
        dh_next = dh_next + jnp.dot(dgates.astype(in_dtype), wgh.T,
                                    preferred_element_type=jnp.float32)
        dwgh_ref[:] += jnp.dot(h_prev.astype(in_dtype).T,
                               dgates.astype(in_dtype),
                               preferred_element_type=jnp.float32)
        de1_ref[t] = de1
        de2_ref[t] = de2
        # dead steps: cotangent passes straight through (h_next == h)
        return jnp.where(alive, dh_next, dh)

    dh_scr[:] = jax.lax.fori_loop(0, time_chunk, step, dh_scr[:])

    @pl.when(ct == n_time_chunks - 1)
    def _emit_dh0():   # chunk covering t=0 finished: dh is dL/dh0
        dh0_ref[:] = dh_scr[:]


@functools.partial(jax.jit, static_argnames=("mode",))
def gru_scan_bwd(mode: str, g, outs, gate_x, cand_x, e1, e2, lengths, h0,
                 w_gate_h, w_cand_h, b_gate, b_cand, cell_vecs):
    """Pallas backward: returns cotangents for (gate_x, cand_x, e1, e2,
    h0, w_gate_h, w_cand_h, b_gate, b_cand, cell_vecs), all f32.

    Time is streamed in _TIME_CHUNK-step blocks over a 2-D grid (batch
    tiles x reversed time chunks); padded time steps are dead (alive
    masks on GLOBAL time), padded g rows are zero, so cotangents pass
    through them untouched."""
    b_sz, seq_len, u2 = gate_x.shape
    units = u2 // 2
    tile_b = min(_round_up(b_sz, 8), _TILE_B_BWD)
    bp = _round_up(b_sz, tile_b)
    n_tiles = bp // tile_b
    tc = min(_TIME_CHUNK, seq_len)
    lp = _round_up(seq_len, tc)
    n_tc = lp // tc

    def prep(x):   # [B,L,f] -> time-major [Lp,Bp,f], zero-padded
        x = jnp.transpose(x, (1, 0, 2))
        return jnp.pad(x, ((0, lp - seq_len), (0, bp - b_sz), (0, 0)))

    gp, op = prep(g), prep(outs)
    gx, cx, e1p, e2p = prep(gate_x), prep(cand_x), prep(e1), prep(e2)
    lens = jnp.pad(lengths.astype(jnp.int32), (0, bp - b_sz))[:, None]
    h0p = jnp.pad(h0, ((0, bp - b_sz), (0, 0)))
    # per-chunk boundary state: h before the chunk's first step —
    # out[ct*tc - 1] for ct > 0, h0 for the first chunk
    chunk_ends = op[tc - 1::tc]                    # [n_tc, Bp, u]
    hb = jnp.concatenate([h0p[None].astype(op.dtype), chunk_ends[:-1]],
                         axis=0)                   # [n_tc, Bp, u]

    tm = lambda f: pl.BlockSpec(  # noqa: E731
        (tc, tile_b, f), lambda i, ct: (n_tc - 1 - ct, i, 0),
        memory_space=pltpu.VMEM)
    w = lambda r, c: pl.BlockSpec((r, c), lambda i, ct: (0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs_shape = (
        jax.ShapeDtypeStruct((lp, bp, 2 * units), f32),        # dgx
        jax.ShapeDtypeStruct((lp, bp, units), f32),            # dcx
        jax.ShapeDtypeStruct((lp, bp, units), f32),            # de1
        jax.ShapeDtypeStruct((lp, bp, units), f32),            # de2
        jax.ShapeDtypeStruct((bp, units), f32),                # dh0
        jax.ShapeDtypeStruct((units, 2 * units), f32),         # dwgh
        jax.ShapeDtypeStruct((units, units), f32),             # dwch
        jax.ShapeDtypeStruct((1, 2 * units), f32),             # dbg
        jax.ShapeDtypeStruct((1, units), f32),                 # dbc
        jax.ShapeDtypeStruct((4, units), f32),                 # dvec
    )
    res = pl.pallas_call(
        functools.partial(_gru_scan_bwd_kernel, mode, n_tc, tc, units),
        grid=(n_tiles, n_tc),
        in_specs=[
            tm(units), tm(units), tm(2 * units), tm(units), tm(units),
            tm(units),
            pl.BlockSpec((tile_b, 1), lambda i, ct: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, units),
                         lambda i, ct: (n_tc - 1 - ct, i, 0),
                         memory_space=pltpu.VMEM),
            w(units, 2 * units), w(units, units), w(1, 2 * units),
            w(1, units), w(4, units),
        ],
        out_specs=(
            tm(2 * units), tm(units), tm(units), tm(units),
            pl.BlockSpec((tile_b, units), lambda i, ct: (i, 0),
                         memory_space=pltpu.VMEM),
            w(units, 2 * units), w(units, units), w(1, 2 * units),
            w(1, units), w(4, units),
        ),
        out_shape=outs_shape,
        scratch_shapes=[pltpu.VMEM((tile_b, units), f32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * bp * seq_len * units * 3 * units,
            bytes_accessed=4 * bp * seq_len * 10 * units,
            transcendentals=bp * seq_len * 3 * units,
        ),
        interpret=jax.default_backend() != "tpu",
    )(gp, op, gx, cx, e1p, e2p, lens, hb,
      w_gate_h, w_cand_h, b_gate[None, :], b_cand[None, :], cell_vecs)
    dgx, dcx, de1, de2, dh0, dwgh, dwch, dbg, dbc, dvec = res

    def unprep(x):  # [Lp,Bp,f] -> [B,L,f]
        return jnp.transpose(x[:seq_len, :b_sz, :], (1, 0, 2))

    return (unprep(dgx), unprep(dcx), unprep(de1), unprep(de2),
            dh0[:b_sz], dwgh, dwch, dbg[0], dbc[0], dvec)


def _reference_scan(mode: str, gate_x, cand_x, e1, e2, lengths, h0,
                    w_gate_h, w_cand_h, b_gate, b_cand, cell_vecs):
    """jnp twin of the kernel (lax.scan), used for the backward pass."""
    units = cand_x.shape[-1]
    seq_len = gate_x.shape[1]
    xs = (jnp.arange(seq_len),
          jnp.transpose(gate_x, (1, 0, 2)), jnp.transpose(cand_x, (1, 0, 2)),
          jnp.transpose(e1, (1, 0, 2)), jnp.transpose(e2, (1, 0, 2)))

    def body(h, inp):
        t, gx, cx, e1t, e2t = inp
        gates = jax.nn.sigmoid(gx + jnp.matmul(h, w_gate_h) + b_gate)
        r, u = gates[:, :units], gates[:, units:]
        cand = jnp.tanh(cx + jnp.matmul(r * h, w_cand_h) + b_cand)
        if mode == "plain":
            new_h = u * h + (1.0 - u) * cand
        elif mode == "tseqrec":
            new_h = u * h * e1t + (1.0 - u) * cand * e2t
        else:
            weight = jnp.maximum(e1t + h * cell_vecs[0], 0.0)
            t_state = jax.nn.sigmoid(cell_vecs[1] * weight
                                     + cell_vecs[2] * e2t + cell_vecs[3])
            new_h = u * h + (1.0 - u) * cand * t_state
        alive = (t < lengths)[:, None]
        return jnp.where(alive, new_h, h), jnp.where(alive, new_h, 0.0)

    _, outs = jax.lax.scan(body, h0, xs)
    return jnp.transpose(outs, (1, 0, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gru_scan_vjp(mode: str, gate_x, cand_x, e1, e2, lengths, h0,
                 w_gate_h, w_cand_h, b_gate, b_cand, cell_vecs):
    """Differentiable wrapper: Pallas forward, jnp-reference backward."""
    return gru_scan(mode, gate_x, cand_x, e1, e2, lengths, h0,
                    w_gate_h, w_cand_h, b_gate, b_cand, cell_vecs)


def _gs_fwd(mode, *args):
    out = gru_scan(mode, *args)
    return out, (args, out)


def _gs_bwd(mode, residuals, g):
    """Fused Pallas reverse-time backward (gru_scan_bwd): recomputes the
    gates from the saved forward outputs instead of replaying the whole
    scan through jax.vjp — one kernel instead of two 50-iteration jnp
    scans."""
    args, outs = residuals
    (gate_x, cand_x, e1, e2, lengths, h0,
     w_gate_h, w_cand_h, b_gate, b_cand, cell_vecs) = args
    dgx, dcx, de1, de2, dh0, dwgh, dwch, dbg, dbc, dcv = gru_scan_bwd(
        mode, g, outs, gate_x, cand_x, e1, e2, lengths, h0,
        w_gate_h, w_cand_h, b_gate, b_cand, cell_vecs)
    return (dgx.astype(gate_x.dtype), dcx.astype(cand_x.dtype),
            de1.astype(e1.dtype), de2.astype(e2.dtype),
            jnp.zeros_like(lengths), dh0.astype(h0.dtype),
            dwgh.astype(w_gate_h.dtype), dwch.astype(w_cand_h.dtype),
            dbg.astype(b_gate.dtype), dbc.astype(b_cand.dtype),
            dcv.astype(cell_vecs.dtype))


gru_scan_vjp.defvjp(_gs_fwd, _gs_bwd)

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


def _gru_scan_kernel(mode: str, seq_len: int, units: int,
                     gx_ref, cx_ref, e1_ref, e2_ref, len_ref, h0_ref,
                     wgh_ref, wch_ref, bg_ref, bc_ref, vec_ref, out_ref):
    in_dtype = gx_ref.dtype   # f32 or bf16 (mixed precision)
    wgh = wgh_ref[:]          # [u, 2u]
    wch = wch_ref[:]          # [u, u]
    bg = bg_ref[:].astype(jnp.float32)    # [1, 2u]
    bc = bc_ref[:].astype(jnp.float32)    # [1, u]
    vec = vec_ref[:].astype(jnp.float32)  # [4, u]
    lengths = len_ref[:]      # [TB, 1] int32

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
        alive = t < lengths   # [TB, 1] bool, broadcasts over units
        out_ref[t] = jnp.where(alive, new_h, 0.0)
        return jnp.where(alive, new_h, h)

    jax.lax.fori_loop(0, seq_len, step, h0_ref[:].astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("mode",))
def gru_scan(mode: str, gate_x, cand_x, e1, e2, lengths, h0,
             w_gate_h, w_cand_h, b_gate, b_cand, cell_vecs):
    """gate_x: [B,L,2u]; cand_x,e1,e2: [B,L,u]; lengths: [B]; h0: [B,u];
    cell_vecs: [4,u] (tgru) or zeros.  Returns outputs [B,L,u]."""
    b_sz, seq_len, u2 = gate_x.shape
    units = u2 // 2
    tile_b = min(_round_up(b_sz, 8), 32)
    bp = _round_up(b_sz, tile_b)
    n_tiles = bp // tile_b

    def prep(x):  # [B,L,f] -> padded time-major [L,Bp,f]
        x = jnp.transpose(x, (1, 0, 2))
        return jnp.pad(x, ((0, 0), (0, bp - b_sz), (0, 0)))

    gx, cx, e1p, e2p = prep(gate_x), prep(cand_x), prep(e1), prep(e2)
    lens = jnp.pad(lengths.astype(jnp.int32), (0, bp - b_sz))[:, None]
    h0p = jnp.pad(h0, ((0, bp - b_sz), (0, 0)))

    tm = lambda f: pl.BlockSpec((seq_len, tile_b, f), lambda i: (0, i, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    w = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_gru_scan_kernel, mode, seq_len, units),
        grid=(n_tiles,),
        in_specs=[
            tm(2 * units), tm(units), tm(units), tm(units),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, units), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            w(units, 2 * units), w(units, units), w(1, 2 * units),
            w(1, units), w(4, units),
        ],
        out_specs=tm(units),
        out_shape=jax.ShapeDtypeStruct((seq_len, bp, units), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * seq_len * units * 3 * units,
            bytes_accessed=4 * bp * seq_len * 5 * units,
            transcendentals=bp * seq_len * 3 * units,
        ),
        interpret=jax.default_backend() != "tpu",
    )(gx, cx, e1p, e2p, lens, h0p,
      w_gate_h, w_cand_h, b_gate[None, :], b_cand[None, :], cell_vecs)
    return jnp.transpose(out[:, :b_sz, :], (1, 0, 2))


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
    return gru_scan(mode, *args), args


def _gs_bwd(mode, residuals, g):
    (gate_x, cand_x, e1, e2, lengths, h0,
     w_gate_h, w_cand_h, b_gate, b_cand, cell_vecs) = residuals
    # kernel emits f32; the reference scan under bf16 inputs emits bf16
    g = g.astype(gate_x.dtype)
    _, vjp = jax.vjp(
        lambda gx, cx, e1_, e2_, h0_, wgh, wch, bg, bc, cv:
        _reference_scan(mode, gx, cx, e1_, e2_, lengths, h0_,
                        wgh, wch, bg, bc, cv),
        gate_x, cand_x, e1, e2, h0, w_gate_h, w_cand_h, b_gate, b_cand,
        cell_vecs)
    dgx, dcx, de1, de2, dh0, dwgh, dwch, dbg, dbc, dcv = vjp(g)
    return (dgx, dcx, de1, de2, jnp.zeros_like(lengths), dh0,
            dwgh, dwch, dbg, dbc, dcv)


gru_scan_vjp.defvjp(_gs_fwd, _gs_bwd)

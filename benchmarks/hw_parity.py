"""Hardware (Mosaic) parity checks for the Pallas kernels.

The pytest suite runs the kernels in interpret mode on CPU, which is
laxer than Mosaic in two ways that have bitten this repo:

  * unwritten output blocks read as zeros in interpret mode but are
    UNINITIALIZED memory on hardware (the tisas/plain gate-grad bug);
  * Mosaic's transcendental approximations (exp/tanh/sigmoid) differ
    from XLA's, so saturated-gate shapes can show ~1e-3 relative
    forward drift that interpret mode cannot reproduce.

Run this ON THE TPU after touching any kernel:

    python benchmarks/hw_parity.py

Timing rule (see docs/PERFORMANCE.md): never trust block_until_ready on
this backend; every check here compares VALUES, not wall time.

Tolerances: GRU forward is bit-exact vs the jnp reference; GRU backward
<= 2e-3 relative (single-tile batches match to ~2e-7, multi-tile batches
drift ~6e-4 from f32 MXU matmul association-order differences between
Mosaic and XLA — interpret mode, which computes exactly, matches to
1e-6, so the kernel MATH is right; forcing Precision.HIGHEST on either
side makes the cross-implementation gap larger, not smaller, because
the other side still decomposes).  Attention fwd/grad <= 2e-2 relative
(transcendental-heavy; observed worst ~1e-2 at single-query shapes).
All far below bf16 training noise.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def check_gru(jnp, jax):
    from mtamrecommender_tpu.ops.pallas import gru_kernel as gk
    # B spans the fwd TB=64 AND bwd TB=128 batch-tile boundaries; L=10
    # with _TIME_CHUNK=8 spans the streamed backward's time-chunk
    # boundary (2 chunks, padded to 16)
    B, L, U = 160, 10, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    a = lambda i, sh: (jax.random.normal(ks[i], sh) * 0.3).astype(jnp.float32)
    args = dict(gate_x=a(0, (B, L, 2 * U)), cand_x=a(1, (B, L, U)),
                e1=a(2, (B, L, U)), e2=jnp.abs(a(3, (B, L, U))),
                lengths=jnp.asarray(
                    np.random.RandomState(0).randint(2, L + 1, B), jnp.int32),
                h0=a(4, (B, U)), w_gate_h=a(5, (U, 2 * U)),
                w_cand_h=a(6, (U, U)), b_gate=a(7, (2 * U,)),
                b_cand=a(8, (U,)), cell_vecs=a(9, (4, U)))
    keys = [k for k in args if k != "lengths"]
    worst_all = 0.0
    for mode in ("plain", "tseqrec", "tgru"):
        def loss(fn, vals):
            d = dict(zip(keys, vals))
            d["lengths"] = args["lengths"]
            return jnp.sum(jnp.sin(fn(
                mode, d["gate_x"], d["cand_x"], d["e1"], d["e2"],
                d["lengths"], d["h0"], d["w_gate_h"], d["w_cand_h"],
                d["b_gate"], d["b_cand"], d["cell_vecs"])))
        vals = [args[k] for k in keys]
        gp = jax.jit(jax.grad(lambda v: loss(gk.gru_scan_vjp, v)))(vals)
        gr = jax.jit(jax.grad(lambda v: loss(gk._reference_scan, v)))(vals)
        worst = max(float(jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(y)) + 1e-8))
                    for x, y in zip(gp, gr))
        worst_all = max(worst_all, worst)
        print(f"gru {mode}: worst rel grad diff {worst:.2e}")
        assert worst < 2e-3, (mode, worst)
    return worst_all


def check_attention(jnp, jax):
    from mtamrecommender_tpu.ops.pallas import attention_kernel as ak
    worst_all = 0.0
    for mode, tq in (("time", 5), ("time", 1), ("time", 50),
                     ("tisas", 5), ("plain", 5),
                     ("plain_drop", 50), ("tisas_drop", 50)):
        # B=24 spans the _TILE_ROWS_FWD=16 / _TILE_ROWS_BWD=8 row tiles
        B, TK, D = 24, 50, 128
        ks = jax.random.split(jax.random.PRNGKey(0), 13)
        a = lambda i, sh: (jax.random.normal(ks[i], sh) * 0.5).astype(jnp.float32)  # noqa: E731
        q, k, v = a(0, (B, tq, D)), a(1, (B, TK, D)), a(2, (B, TK, D))
        t_q = jnp.abs(a(3, (B, tq))) * 100
        t_k = jnp.abs(a(4, (B, TK))) * 100
        tqw, rawk = a(5, (B, tq, D)), a(6, (B, TK, D))
        gate = [a(i, (tq, TK)) for i in range(7, 12)]
        klen = jnp.asarray(np.random.RandomState(0).randint(2, TK + 1, B),
                           jnp.int32)
        if mode.endswith("_drop"):   # pre-scaled mask: 0 or 1/keep (=2.0)
            dm = jax.random.bernoulli(ks[12], 0.5, (B, tq, TK)
                                      ).astype(jnp.float32) * 2.0
        else:
            dm = None
        diff = (q, k, v, tqw, rawk, *gate)

        def loss(fn, args_):
            return jnp.sum(jnp.sin(fn(
                mode, args_[0], args_[1], args_[2], t_q, t_k, args_[3],
                args_[4], args_[5], args_[6], args_[7], args_[8], args_[9],
                klen,
                (ak.dm_dummy() if dm is None else dm)
                if fn is ak.fused_attention else dm)))
        gp = jax.jit(jax.grad(lambda x: loss(ak.fused_attention, x)))(diff)
        gr = jax.jit(jax.grad(lambda x: loss(ak._reference_middle, x)))(diff)
        worst = max(float(jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(y)) + 1e-8))
                    for x, y in zip(gp, gr))
        worst_all = max(worst_all, worst)
        print(f"attention {mode} tq={tq}: worst rel grad diff {worst:.2e}")
        assert worst < 2e-2, (mode, tq, worst)
    return worst_all


def check_readout(jnp, jax):
    """Fused multi-hop readout kernel vs the jnp fused readout: values and
    grads wrt memory/query/every per-hop param, at headline shapes."""
    from mtamrecommender_tpu.ops import attention as att
    worst_all = 0.0
    # L=512 is IN the kernel's routed regime (READOUT_KERNEL_MIN_KEYS=256
    # <= L <= 1024) — the L=50 case must be forced and exists to compare
    # against the same jnp math at the reference shape
    for gate_mode, n_hops, L in (("positional", 3, 50),
                                 ("scalar", 2, 50),
                                 ("positional", 3, 512)):
        B, d = 12 if L > 128 else 24, 128
        r = np.random.RandomState(1)
        x = jnp.asarray(r.randn(B, L, d).astype(np.float32) * 0.5)
        t = jnp.asarray(np.sort(r.rand(B, L) * 500, 1).astype(np.float32))
        lengths = jnp.asarray(r.randint(2, L + 1, B).astype(np.int32))
        blocks = att.init_attention_stack(
            jax.random.PRNGKey(8), n_hops, d, kind="time", t_q_len=1,
            t_k_len=L, gate_mode=gate_mode)
        dec = x[:, :1, :] * 0.3
        tq = t[:, -1:]
        ones = jnp.ones((B,), jnp.int32)
        probe = jnp.sin(jnp.arange(d, dtype=jnp.float32))

        def loss(bl, mem, dq, use_kernel):
            if use_kernel:
                out = att._fused_readout_pallas(bl, mem, dq, lengths, tq, t)
            else:
                out = att.vanilla_attention_stack(
                    bl, mem, dq, lengths, ones, kind="time", num_heads=1,
                    dropout_rate=0.0, train=True, t_queries=tq, t_keys=t,
                    fused=True)
            return jnp.sum(out * probe)

        g_ref = jax.jit(jax.grad(lambda a, b, c: loss(a, b, c, False),
                                 argnums=(0, 1, 2)))(blocks, x, dec)
        g_out = jax.jit(jax.grad(lambda a, b, c: loss(a, b, c, True),
                                 argnums=(0, 1, 2)))(blocks, x, dec)
        flat_o, _ = jax.tree_util.tree_flatten_with_path(g_out)
        flat_r = jax.tree_util.tree_leaves(g_ref)
        worst, worst_path = 0.0, None
        for (path, a), b in zip(flat_o, flat_r):
            rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-8))
            if rel > worst:
                worst, worst_path = rel, jax.tree_util.keystr(path)
        worst_all = max(worst_all, worst)
        print(f"readout {gate_mode} n={n_hops} L={L}: worst rel grad "
              f"diff {worst:.2e} at {worst_path}")
        # 5e-2 bound: the worst leaf is time_input_w (3.25e-2, hop 1),
        # whose cotangent flows EXCLUSIVELY through tanh'(tqk) = 1-tqk^2.
        # At d=128 the content-time logits saturate (|tqk| -> 1), where
        # Mosaic's tanh tail differs from XLA's and the 1-t^2 cancellation
        # amplifies that into a large RELATIVE error on near-zero grads
        # (deterministic: identical value across two kernel rewrites).
        # The same mechanism bounds the attention kernel's tq=1 check at
        # 1.6e-2.  Non-tanh'-dominated leaves sit at <=1e-3.
        assert worst < 5e-2, (gate_mode, worst, worst_path)
    return worst_all


def check_dtable(jnp, jax):
    """Tiled-one-hot dtable backward kernel vs XLA scatter-add, at the
    headline shapes (V=3840 item table, 12.8k ids) in f32 and bf16."""
    from mtamrecommender_tpu.ops.pallas import embedding_kernel as ek
    worst_all = 0.0
    for dtype, V, n in ((jnp.float32, 3840, 12800),
                        (jnp.bfloat16, 3840, 12800),
                        (jnp.float32, 130, 3000)):     # ragged vocab tail
        d = 128
        r = np.random.RandomState(3)
        table = jnp.asarray(r.randn(V, d).astype(np.float32)).astype(dtype)
        ids = jnp.asarray(r.randint(0, V, (n,)).astype(np.int32))
        w = jnp.asarray(r.randn(n, d).astype(np.float32)).astype(dtype)

        def loss(gather_fn, t):
            return jnp.sum((gather_fn(t, ids) * w).astype(jnp.float32))

        g_k = jax.jit(jax.grad(lambda t: loss(ek.take_dtable, t)))(table)
        g_ref = jax.jit(jax.grad(
            lambda t: loss(lambda tb, i: jnp.take(tb, i, axis=0), t)))(table)
        g_k32, g_r32 = g_k.astype(jnp.float32), g_ref.astype(jnp.float32)
        worst = float(jnp.max(jnp.abs(g_k32 - g_r32))
                      / (jnp.max(jnp.abs(g_r32)) + 1e-8))
        worst_all = max(worst_all, worst)
        print(f"dtable {jnp.dtype(dtype).name} V={V} n={n}: worst rel "
              f"grad diff {worst:.2e}")
        # bf16: the kernel accumulates in f32 and rounds once where the
        # scatter reference rounds per duplicate-id add — the kernel is
        # the MORE accurate side, so allow bf16-epsilon-scale disagreement
        assert worst < (2e-2 if dtype == jnp.bfloat16 else 1e-5), \
            (str(dtype), worst)
    return worst_all


def check_chain(jnp, jax):
    """Round-5 chain readout kernel (readout_chain_kernel.py) vs the jnp
    hop-batched readout at headline shapes, values + grads, both gate
    modes, batch sizes spanning the _TILE_B=128 pad/tile boundary."""
    from mtamrecommender_tpu.ops import attention as att
    from mtamrecommender_tpu.ops.pallas import flags as pallas_flags
    att.READOUT_CHAIN_OPT_IN = True      # opt-in kernel: forced for parity
    worst_all = 0.0
    for gate_mode, n_hops, B in (("positional", 3, 256),
                                 ("positional", 3, 100),
                                 ("scalar", 2, 256)):
        L, d = 50, 128
        r = np.random.RandomState(5)
        mem = jnp.asarray(r.randn(B, L, d).astype(np.float32) * 0.5)
        t = jnp.asarray(np.sort(r.rand(B, L) * 500, 1).astype(np.float32))
        lengths = jnp.asarray(r.randint(2, L + 1, B).astype(np.int32))
        blocks = att.init_attention_stack(
            jax.random.PRNGKey(9), n_hops, d, kind="time", t_q_len=1,
            t_k_len=L, gate_mode=gate_mode)
        dec = mem[:, :1, :] * 0.3
        tq = t[:, -1:]
        ones = jnp.ones((B,), jnp.int32)
        probe = jnp.cos(jnp.arange(d, dtype=jnp.float32))

        def loss(bl, m, dq, use_kernel):
            pallas_flags.set_scope("attention" if use_kernel else "gru")
            try:
                out = att.vanilla_attention_stack(
                    bl, m, dq, lengths, ones, kind="time", num_heads=1,
                    dropout_rate=0.0, train=True, t_queries=tq, t_keys=t,
                    use_pallas=use_kernel, fused=True)
            finally:
                pallas_flags.set_scope("all")
            return jnp.sum(out * probe)

        g_ref = jax.jit(jax.grad(lambda a, b, c: loss(a, b, c, False),
                                 argnums=(0, 1, 2)))(blocks, mem, dec)
        g_k = jax.jit(jax.grad(lambda a, b, c: loss(a, b, c, True),
                               argnums=(0, 1, 2)))(blocks, mem, dec)
        flat_k, _ = jax.tree_util.tree_flatten_with_path(g_k)
        flat_r = jax.tree_util.tree_leaves(g_ref)
        worst, worst_path = 0.0, None
        for (path, a), b in zip(flat_k, flat_r):
            rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-8))
            if rel > worst:
                worst, worst_path = rel, jax.tree_util.keystr(path)
        worst_all = max(worst_all, worst)
        print(f"chain {gate_mode} n={n_hops} B={B}: worst rel grad diff "
              f"{worst:.2e} at {worst_path}")
        # same tanh'-saturation mechanism as the fused readout kernel
        # bounds the time_input_w leaf; non-tanh' leaves sit <= 1e-3
        assert worst < 5e-2, (gate_mode, worst, worst_path)
    return worst_all


def main() -> int:
    import jax
    import jax.numpy as jnp
    if jax.default_backend() != "tpu":
        print("WARNING: not on TPU — this runs interpret mode and cannot "
              "catch Mosaic-only bugs")
    checks = {"gru": check_gru, "attention": check_attention,
              "readout": check_readout, "dtable": check_dtable,
              "chain": check_chain}
    names = sys.argv[1:] or list(checks)
    for name in names:
        checks[name](jnp, jax)
    print("hw_parity OK:", " ".join(names))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Three-way gradient adjudication: kernel vs jnp vs float64 oracle
(VERDICT r4 item 3).

The hardware parity figures for the attention/readout kernels (worst rel
grad diff 1.6e-2 / 3.3e-2, README) are 10-30x looser than the GRU
kernel's and were attributed to a saturated-tanh-derivative mechanism —
but "kernel vs jnp" alone cannot say WHICH side is further from the true
gradient.  This script settles it:

  phase 1 (oracle):  python benchmarks/grad_adjudicate.py oracle
      runs the jnp reference paths in float64 on CPU and writes the
      golden gradients to benchmarks/results/grad_oracle.npz
  phase 2 (tpu):     python benchmarks/grad_adjudicate.py tpu
      runs BOTH the pallas kernel and the jnp path in float32 on the
      TPU, compares each against the oracle, and writes the three-way
      table to benchmarks/results/grad_adjudication_r5.json

Cases: the two worst offenders — the fused attention kernel at tq=1
(worst 1.6e-2) and the fused multi-hop readout kernel at L=512 (its
routed regime; worst leaf time_input_w, 3.3e-2) — plus the GRU kernel
as a control.  Identical inputs in every phase (seeded host RNG, cast
from the same f64 draws).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ORACLE_PATH = os.path.join("benchmarks", "results", "grad_oracle.npz")
OUT_PATH = os.path.join("benchmarks", "results", "grad_adjudication_r5.json")


def _attention_case():
    """tq=1 'time' attention middle — the 1.6e-2 offender."""
    B, TK, D, tq = 24, 50, 128, 1
    r = np.random.RandomState(0)
    a = lambda sh: (r.randn(*sh) * 0.5)  # noqa: E731
    inputs = dict(q=a((B, tq, D)), k=a((B, TK, D)), v=a((B, TK, D)),
                  tqw=a((B, tq, D)), rawk=a((B, TK, D)),
                  g0=a((tq, TK)), g1=a((tq, TK)), g2=a((tq, TK)),
                  g3=a((tq, TK)), g4=a((tq, TK)))
    aux = dict(t_q=np.abs(a((B, tq))) * 100, t_k=np.abs(a((B, TK))) * 100,
               klen=r.randint(2, TK + 1, B).astype(np.int64))
    return inputs, aux


def _attention_loss(jnp, jax, dtype):
    from mtamrecommender_tpu.ops.pallas import attention_kernel as ak
    inputs, aux = _attention_case()
    cast = lambda d: {k: jnp.asarray(v, dtype) for k, v in d.items()}  # noqa: E731
    ci = cast(inputs)
    t_q = jnp.asarray(aux["t_q"], dtype)
    t_k = jnp.asarray(aux["t_k"], dtype)
    klen = jnp.asarray(aux["klen"], jnp.int32)
    keys = list(ci)

    def loss(fn, vals, with_dm):
        d = dict(zip(keys, vals))
        extra = (ak.dm_dummy(),) if with_dm else (None,)
        return jnp.sum(jnp.sin(fn(
            "time", d["q"], d["k"], d["v"], t_q, t_k, d["tqw"], d["rawk"],
            d["g0"], d["g1"], d["g2"], d["g3"], d["g4"], klen, *extra)))

    vals = [ci[k] for k in keys]
    g_jnp = jax.jit(jax.grad(
        lambda v: loss(ak._reference_middle, v, False)))(vals)
    g_kernel = None
    if dtype == jnp.float32:
        g_kernel = jax.jit(jax.grad(
            lambda v: loss(ak.fused_attention, v, True)))(vals)
    return keys, g_jnp, g_kernel


def _readout_case():
    B, L, d, n_hops = 12, 512, 128, 3
    r = np.random.RandomState(1)
    mem = r.randn(B, L, d) * 0.5
    t = np.sort(r.rand(B, L) * 500, 1)
    lengths = r.randint(2, L + 1, B).astype(np.int64)
    return mem, t, lengths, n_hops


def _readout_loss(jnp, jax, dtype):
    from mtamrecommender_tpu.ops import attention as att
    mem_np, t_np, len_np, n_hops = _readout_case()
    d = mem_np.shape[-1]
    blocks64 = att.init_attention_stack(
        jax.random.PRNGKey(8), n_hops, d, kind="time", t_q_len=1,
        t_k_len=mem_np.shape[1], gate_mode="positional")
    blocks = jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float64),
                                                dtype), blocks64)
    mem = jnp.asarray(mem_np, dtype)
    t = jnp.asarray(t_np, dtype)
    lengths = jnp.asarray(len_np, jnp.int32)
    dec = mem[:, :1, :] * 0.3
    tq = t[:, -1:]
    ones = jnp.ones((mem.shape[0],), jnp.int32)
    probe = jnp.sin(jnp.arange(d, dtype=dtype))

    def loss(bl, m, dq, use_kernel):
        if use_kernel:
            out = att._fused_readout_pallas(bl, m, dq, lengths, tq, t)
        else:
            out = att.vanilla_attention_stack(
                bl, m, dq, lengths, ones, kind="time", num_heads=1,
                dropout_rate=0.0, train=True, t_queries=tq, t_keys=t,
                fused=True)
        return jnp.sum(out * probe)

    g_jnp = jax.jit(jax.grad(lambda a, b, c: loss(a, b, c, False),
                             argnums=(0, 1, 2)))(blocks, mem, dec)
    g_kernel = None
    if dtype == jnp.float32:
        g_kernel = jax.jit(jax.grad(lambda a, b, c: loss(a, b, c, True),
                                    argnums=(0, 1, 2)))(blocks, mem, dec)
    return g_jnp, g_kernel


def _gru_case(jnp, jax, dtype):
    from mtamrecommender_tpu.ops.pallas import gru_kernel as gk
    B, L, U = 160, 10, 128
    r = np.random.RandomState(2)
    a = lambda sh: r.randn(*sh) * 0.3  # noqa: E731
    raw = dict(gate_x=a((B, L, 2 * U)), cand_x=a((B, L, U)),
               e1=a((B, L, U)), e2=np.abs(a((B, L, U))),
               h0=a((B, U)), w_gate_h=a((U, 2 * U)), w_cand_h=a((U, U)),
               b_gate=a((2 * U,)), b_cand=a((U,)), cell_vecs=a((4, U)))
    lengths = jnp.asarray(np.random.RandomState(3).randint(2, L + 1, B),
                          jnp.int32)
    ci = {k: jnp.asarray(v, dtype) for k, v in raw.items()}
    keys = list(ci)

    def loss(fn, vals):
        d = dict(zip(keys, vals))
        return jnp.sum(jnp.sin(fn(
            "tgru", d["gate_x"], d["cand_x"], d["e1"], d["e2"], lengths,
            d["h0"], d["w_gate_h"], d["w_cand_h"], d["b_gate"],
            d["b_cand"], d["cell_vecs"])))

    vals = [ci[k] for k in keys]
    g_jnp = jax.jit(jax.grad(lambda v: loss(gk._reference_scan, v)))(vals)
    g_kernel = None
    if dtype == jnp.float32:
        g_kernel = jax.jit(jax.grad(lambda v: loss(gk.gru_scan_vjp, v)))(vals)
    return keys, g_jnp, g_kernel


def run_oracle() -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    out = {}
    keys, g_jnp, _ = _attention_loss(jnp, jax, jnp.float64)
    for k, g in zip(keys, g_jnp):
        out[f"att/{k}"] = np.asarray(g, np.float64)
    g_jnp, _ = _readout_loss(jnp, jax, jnp.float64)
    flat, _ = jax.tree_util.tree_flatten_with_path(g_jnp)
    for path, g in flat:
        out[f"ro/{jax.tree_util.keystr(path)}"] = np.asarray(g, np.float64)
    keys, g_jnp, _ = _gru_case(jnp, jax, jnp.float64)
    for k, g in zip(keys, g_jnp):
        out[f"gru/{k}"] = np.asarray(g, np.float64)
    os.makedirs(os.path.dirname(ORACLE_PATH), exist_ok=True)
    np.savez(ORACLE_PATH, **out)
    print(f"oracle written: {len(out)} leaves -> {ORACLE_PATH}")
    return 0


def _table(oracle, prefix, named_grads):
    """rel err vs oracle per leaf: max|x-o| / max|o|."""
    rows = []
    for name, (g_j, g_k) in named_grads.items():
        o = oracle[f"{prefix}/{name}"]
        scale = np.abs(o).max() + 1e-12
        e_jnp = float(np.abs(np.asarray(g_j, np.float64) - o).max() / scale)
        e_k = float(np.abs(np.asarray(g_k, np.float64) - o).max() / scale)
        e_kj = float(np.abs(np.asarray(g_k, np.float64)
                            - np.asarray(g_j, np.float64)).max() / scale)
        rows.append({"leaf": name, "jnp_vs_f64": round(e_jnp, 8),
                     "kernel_vs_f64": round(e_k, 8),
                     "kernel_vs_jnp": round(e_kj, 8)})
    return rows


def run_tpu() -> int:
    import jax
    import jax.numpy as jnp
    oracle = dict(np.load(ORACLE_PATH))
    report = {"backend": jax.default_backend(), "cases": {}}

    keys, g_jnp, g_k = _attention_loss(jnp, jax, jnp.float32)
    report["cases"]["attention_tq1"] = _table(
        oracle, "att", {k: (a, b) for k, a, b in zip(keys, g_jnp, g_k)})

    g_jnp, g_k = _readout_loss(jnp, jax, jnp.float32)
    flat_j, _ = jax.tree_util.tree_flatten_with_path(g_jnp)
    flat_k = jax.tree_util.tree_leaves(g_k)
    report["cases"]["readout_L512"] = _table(
        oracle, "ro", {jax.tree_util.keystr(p): (a, b)
                       for (p, a), b in zip(flat_j, flat_k)})

    keys, g_jnp, g_k = _gru_case(jnp, jax, jnp.float32)
    report["cases"]["gru_tgru"] = _table(
        oracle, "gru", {k: (a, b) for k, a, b in zip(keys, g_jnp, g_k)})

    for case, rows in report["cases"].items():
        wk = max(rows, key=lambda r: r["kernel_vs_f64"])
        wj = max(rows, key=lambda r: r["jnp_vs_f64"])
        print(f"{case}: worst kernel_vs_f64 {wk['kernel_vs_f64']:.2e} "
              f"({wk['leaf']}); worst jnp_vs_f64 {wj['jnp_vs_f64']:.2e} "
              f"({wj['leaf']})")
    with open(OUT_PATH, "w") as f:
        json.dump(report, f, indent=1)
    print("written", OUT_PATH)
    return 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    sys.exit(run_oracle() if mode == "oracle" else run_tpu())

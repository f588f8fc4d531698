"""Kernel microbenchmarks: Pallas vs. jnp reference paths on the real TPU.

Times the three hot ops at headline shapes (B=256, L=50, d=128 —
SURVEY.md section 6) plus the full MTAM train step under each compute
configuration.  Writes benchmarks/results/kernels_{tag}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, warmup=3, iters=20):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seq", type=int, default=50)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--tag", default="r1")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from mtamrecommender_tpu.ops import attention as att
    from mtamrecommender_tpu.ops import time_gru as tg

    B, L, d = args.batch, args.seq, args.dim
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, d).astype(np.float32))
    t = jnp.asarray(np.sort(rng.rand(B, L).astype(np.float32) * 500, axis=1))
    tl = jnp.asarray(np.abs(rng.randn(B, L)).astype(np.float32))
    tn = jnp.asarray(np.abs(rng.randn(B, L)).astype(np.float32))
    lengths = jnp.asarray(rng.randint(2, L + 1, B).astype(np.int32))
    results = {"shapes": {"B": B, "L": L, "d": d},
               "device": str(jax.devices()[0]), "ops": {}}

    # --- time-aware self-attention (full [L,L]) ---
    p_att = att.init_time_mha_block(jax.random.PRNGKey(1), d, L, L)

    @jax.jit
    def att_ref(p, x, t, ln):
        return att.time_aware_multihead_attention(
            p, x, x, ln, ln, t, t, num_heads=1, train=False)[0]

    @jax.jit
    def att_pk(p, x, t, ln):
        return att.time_aware_multihead_attention(
            p, x, x, ln, ln, t, t, num_heads=1, train=False,
            use_pallas=True)[0]

    print("timing time_attention_self jnp...", flush=True)
    jnp_ms = round(timeit(att_ref, p_att, x, t, lengths) * 1e3, 3)
    print("  jnp", jnp_ms, "ms; compiling pallas...", flush=True)
    pk_ms = round(timeit(att_pk, p_att, x, t, lengths) * 1e3, 3)
    print("  pallas", pk_ms, "ms", flush=True)
    results["ops"]["time_attention_self"] = {"jnp_ms": jnp_ms,
                                             "pallas_ms": pk_ms}

    # --- single-query readout (MTAM decoder hop) ---
    p_att1 = att.init_time_mha_block(jax.random.PRNGKey(2), d, 1, L)
    q1, tq1 = x[:, :1], t[:, :1]
    ones = jnp.ones((B,), jnp.int32)

    @jax.jit
    def att1_ref(p, q, x, t):
        return att.time_aware_multihead_attention(
            p, q, x, lengths, ones, tq1, t, num_heads=1, train=False)[0]

    @jax.jit
    def att1_pk(p, q, x, t):
        return att.time_aware_multihead_attention(
            p, q, x, lengths, ones, tq1, t, num_heads=1, train=False,
            use_pallas=True)[0]

    print("timing time_attention_1q...", flush=True)
    jnp_ms = round(timeit(att1_ref, p_att1, q1, x, t) * 1e3, 3)
    print("  jnp", jnp_ms, flush=True)
    pk_ms = round(timeit(att1_pk, p_att1, q1, x, t) * 1e3, 3)
    print("  pallas", pk_ms, flush=True)
    results["ops"]["time_attention_1q"] = {"jnp_ms": jnp_ms,
                                           "pallas_ms": pk_ms}

    # --- T-GRU scan ---
    p_gru = tg.init_tgru(jax.random.PRNGKey(3), d, d)

    @jax.jit
    def gru_ref(p, x, tl, tn, ln):
        return tg.tgru_net(p, x, tl, tn, ln)

    @jax.jit
    def gru_pk(p, x, tl, tn, ln):
        return tg.tgru_net(p, x, tl, tn, ln, use_pallas=True)

    print("timing tgru_scan...", flush=True)
    jnp_ms = round(timeit(gru_ref, p_gru, x, tl, tn, lengths) * 1e3, 3)
    print("  jnp", jnp_ms, flush=True)
    pk_ms = round(timeit(gru_pk, p_gru, x, tl, tn, lengths) * 1e3, 3)
    print("  pallas", pk_ms, flush=True)
    results["ops"]["tgru_scan"] = {"jnp_ms": jnp_ms, "pallas_ms": pk_ms}

    # --- full MTAM train step variants ---
    from __graft_entry__ import _make_batch
    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.train.trainer import make_optimizer, make_train_step
    from mtamrecommender_tpu.types import DatasetMeta

    meta = DatasetMeta(user_count=4832, item_count=3706, category_count=18,
                       max_seq_len=L)
    batch = _make_batch(meta, B)
    variants = {
        "f32": {},
        "bf16": {"model.compute_dtype": "bfloat16"},
        "f32_pallas": {"model.use_pallas": True},
        "bf16_pallas": {"model.compute_dtype": "bfloat16",
                        "model.use_pallas": True},
    }
    step_ms = {}
    for vname, over in variants.items():
        print("compiling mtam_step", vname, flush=True)
        cfg = ExperimentConfig().with_overrides(**{
            "model.experiment_type": "MTAM", "model.num_units": d,
            "model.num_blocks": 3, "model.vocab_pad_multiple": 128, **over})
        model = get_model("MTAM")
        params = model.init(jax.random.PRNGKey(0), cfg.model, meta)
        opt = make_optimizer(cfg.train)
        opt_state = opt.init(params)
        step = make_train_step(model, cfg, opt, meta.item_vocab)
        r = jax.random.PRNGKey(1)

        def run(p, o):
            return step(p, o, batch, r)

        ms = timeit(run, params, opt_state, warmup=3, iters=20) * 1e3
        step_ms[vname] = round(ms, 3)
        print(f"mtam_step {vname}: {ms:.2f} ms "
              f"({B / ms * 1e3:.0f} ex/s)", flush=True)
    results["ops"]["mtam_train_step_ms"] = step_ms

    out = os.path.join("benchmarks", "results", f"kernels_{args.tag}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["ops"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
